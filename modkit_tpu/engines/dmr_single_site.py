"""Single-site DMR (`dmr pair` without --regions).

Reference equivalent: ``src/dmr/single_site.rs``. Walks every comparison
base position genome-wide in interval batches; for positions covered in
both samples computes the llk-ratio score, a MAP-based p-value from the
Beta-difference density (``ops/beta_diff.py``), and an effect size;
optionally feeds consecutive per-site scores into a 2-state Viterbi HMM
segmenter (``hmm.py``) that emits "same"/"different" BED segments.

All per-site numeric work (llk scores, pmap p-values) runs as vectorized
batch kernels per interval; only row formatting is per-site Python.
"""

from __future__ import annotations

import sys

import numpy as np

from ..bedmethyl import AggregatedCounts, aggregate_counts
from ..genome_positions import GenomePositions
from ..hmm import STATE_NAMES, HmmModel, path_to_region_labels
from ..ops.beta_diff import PMapEstimator
from ..thresholds import percentile_linear_interp
from ..writers import format_float
from .dmr import SampleIndex, score_counts_pairs


def _iter_position_batches(
    genome_positions: GenomePositions,
    contigs: list[str],
    interval_size: int,
):
    """Yield (chrom, window_start, window_end, positions) batches with at
    least interval_size positions each (single_site.rs:291-415 batching,
    flattened: one batch per yield, contigs in sorted name order)."""
    for chrom in contigs:
        size = genome_positions.contig_sizes()[chrom]
        batch_positions: list[tuple[int, str, str]] = []
        batch_lo = 0
        pos = 0
        while pos < size:
            end = min(pos + interval_size, size)
            got = genome_positions.get_positions_arrays(chrom, pos, end, ".")
            if got is not None:
                positions, is_neg, bases = got
                for p, n, b in zip(positions, is_neg, bases):
                    batch_positions.append(
                        (int(p), "-" if n else "+", chr(b))
                    )
            if len(batch_positions) >= interval_size:
                yield chrom, batch_lo, end, batch_positions
                batch_positions = []
                batch_lo = end
            pos = end
        if batch_positions:
            yield chrom, batch_lo, size, batch_positions


def _collect_counts(
    sample_index: SampleIndex,
    idxs: list[int],
    chrom: str,
    lo: int,
    hi: int,
    position_set: set,
) -> dict[tuple, list[AggregatedCounts]]:
    """position -> [AggregatedCounts per sample] for positions in the set
    (dmr/tabix.rs:204-339 organize_bedmethy_lines)."""
    out: dict[tuple, list[AggregatedCounts]] = {}
    for i in idxs:
        by_pos: dict[tuple, list] = {}
        for l in sample_index.read_lines(i, chrom, lo, hi):
            key = l.get_stranded_position(sample_index.code_lookup)
            if key in position_set:
                by_pos.setdefault(key, []).append(l)
        for key, lines in by_pos.items():
            try:
                counts = aggregate_counts(lines, sample_index.code_lookup)
            except ValueError:
                continue
            out.setdefault(key, []).append(counts)
    return out


def _collapse_counts(
    counts: list[AggregatedCounts], balance: bool
) -> AggregatedCounts:
    """single_site.rs:662-686."""
    if len(counts) == 1:
        return counts[0]
    if balance:
        total_cov = sum(c.total for c in counts)
        target_cov = np.float32(total_cov) / np.float32(len(counts))
        agg = AggregatedCounts()
        for c in counts:
            mod_counts = {}
            for code, n in c.mod_code_counts.items():
                frac = np.float32(n) / np.float32(c.total)
                mod_counts[code] = int(np.floor(frac * target_cov))
            agg = agg.combine(
                AggregatedCounts(mod_counts, int(target_cov))
            )
        return agg
    agg = AggregatedCounts()
    for c in counts:
        agg = agg.combine(c)
    return agg


def estimate_max_coverages(
    sample_index: SampleIndex,
    a_idxs: list[int],
    b_idxs: list[int],
    genome_positions: GenomePositions,
    contigs: list[str],
    interval_size: int,
    sample_n: int,
) -> tuple[int, int]:
    """95th-percentile valid coverage from the first ~sample_n records
    (single_site.rs:752-831)."""
    a_agg: list[int] = []
    b_agg: list[int] = []
    for chrom, lo, hi, positions in _iter_position_batches(
        genome_positions, contigs, interval_size
    ):
        pos_set = set(positions)
        for idxs, agg in ((a_idxs, a_agg), (b_idxs, b_agg)):
            for i in idxs:
                for l in sample_index.read_lines(i, chrom, lo, hi):
                    if (
                        l.get_stranded_position(sample_index.code_lookup)
                        in pos_set
                    ):
                        agg.append(l.valid_coverage)
        if min(len(a_agg), len(b_agg)) >= sample_n:
            break
    a_sorted = np.sort(np.array(a_agg, dtype=np.float32))
    b_sorted = np.sort(np.array(b_agg, dtype=np.float32))
    a_max = int(np.floor(percentile_linear_interp(a_sorted, 0.95)))
    b_max = int(np.floor(percentile_linear_interp(b_sorted, 0.95)))
    return a_max, b_max


class HmmSegmenter:
    """single_site.rs:860-1139 HmmDmrSegmenter."""

    def __init__(self, out_fp: str, hmm: HmmModel, max_gap_size: int):
        self.out = open(out_fp, "w")
        self.hmm = hmm
        self.max_gap_size = max_gap_size
        self.scores: list[float] = []
        self.positions: list[int] = []
        self.counts_a: dict[int, AggregatedCounts] = {}
        self.counts_b: dict[int, AggregatedCounts] = {}
        self.chrom: str | None = None
        self.end: int | None = None

    def add_sites(self, chrom: str, sites: list):
        """sites: (position, score, counts_a, counts_b), position-sorted."""
        if not sites:
            return
        if self.chrom is not None and chrom != self.chrom:
            self.run_current_chunk()
            self.chrom = chrom
        elif self.chrom is None:
            self.chrom = chrom
        elif self.end is not None:
            min_pos = sites[0][0]
            if not (0 <= min_pos - self.end < self.max_gap_size):
                self.run_current_chunk()
                self.chrom = chrom
        for pos, score, ca, cb in sites:
            self.scores.append(score)
            self.positions.append(pos)
            self.counts_a[pos] = ca
            self.counts_b[pos] = cb
        self.end = max(self.end or 0, max(s[0] for s in sites))

    def _counts_range(self, counts, start, end) -> AggregatedCounts:
        agg = AggregatedCounts()
        for pos in sorted(counts):
            if start <= pos < end:
                agg = agg.combine(counts[pos])
        return agg

    def run_current_chunk(self):
        if not self.scores:
            return
        path = self.hmm.viterbi_path(self.scores, self.positions)
        segments = path_to_region_labels(path, self.positions)
        pairs = []
        rows_meta = []
        for start, end, state in segments:
            ca = self._counts_range(self.counts_a, start, end)
            cb = self._counts_range(self.counts_b, start, end)
            pairs.append((ca, cb))
            rows_meta.append((start, end, state, ca, cb))
        scores = score_counts_pairs(pairs)
        for (start, end, state, ca, cb), score in zip(rows_meta, scores):
            if score is None:
                continue
            frac_a = ca.pct_modified()
            frac_b = cb.pct_modified()
            effect = np.float32(frac_a) - np.float32(frac_b)
            num_sites = sum(
                1 for p in self.counts_a if start <= p < end
            )
            self.out.write(
                f"{self.chrom}\t{start}\t{end}\t{STATE_NAMES[state]}\t"
                f"{format_float(score, f64=True)}\t{num_sites}\t"
                f"{ca.string_counts()}\t{cb.string_counts()}\t"
                f"{ca.string_percentages()}\t{cb.string_percentages()}\t"
                f"{format_float(frac_a)}\t{format_float(frac_b)}\t"
                f"{format_float(effect)}\n"
            )
        self.scores = []
        self.positions = []
        self.counts_a = {}
        self.counts_b = {}
        self.end = None

    def finish(self):
        self.run_current_chunk()
        self.out.close()


def _header(multiple_samples: bool, matched_samples: bool) -> str:
    fields = [
        "chrom", "start", "end", "name", "score", "strand",
        "a_counts", "a_total", "b_counts", "b_total",
        "a_mod_percentages", "b_mod_percentages",
        "a_pct_modified", "b_pct_modified", "map_pvalue", "effect_size",
    ]
    if multiple_samples:
        fields += [
            "balanced_map_pvalue", "balanced_effect_size",
            "pct_a_samples", "pct_b_samples",
        ]
    if matched_samples:
        fields += ["replicate_map_pvalues", "replicate_effect_sizes"]
    return "\t".join(fields) + "\n"


def run_single_site_analysis(
    sample_index: SampleIndex,
    a_idxs: list[int],
    b_idxs: list[int],
    genome_positions: GenomePositions,
    out,
    estimator: PMapEstimator,
    interval_size: int = 100_000,
    header: bool = False,
    segmenter: HmmSegmenter | None = None,
    shard: tuple[int, int] = (0, 1),
) -> tuple[int, int]:
    # multi-host: position batches owned round-robin, sentinel-framed
    # shard output merged by rank 0 (the pileup shard machinery)
    pidx, pcount = shard
    num_a, num_b = len(a_idxs), len(b_idxs)
    matched = num_a == num_b and num_a > 1
    multiple = num_a > 1 or num_b > 1
    if header and pidx == 0:
        out.write(_header(multiple, matched))

    contigs = sorted(
        c
        for c in genome_positions.contig_names()
        if any(sample_index.has_contig(i, c) for i in a_idxs)
        and any(sample_index.has_contig(i, c) for i in b_idxs)
    )
    successes = failures = 0
    for batch_idx, (chrom, lo, hi, positions) in enumerate(
        _iter_position_batches(genome_positions, contigs, interval_size)
    ):
        if pcount > 1 and batch_idx % pcount != pidx:
            continue
        pos_set = set(positions)
        counts_a = _collect_counts(
            sample_index, a_idxs, chrom, lo, hi, pos_set
        )
        counts_b = _collect_counts(
            sample_index, b_idxs, chrom, lo, hi, pos_set
        )
        # positions present in both, sorted (BTreeMap order: position,
        # then +strand before -strand)
        common = sorted(
            (k for k in counts_a if k in counts_b),
            key=lambda k: (k[0], 0 if k[1] == "+" else 1),
        )
        if not common:
            if pcount > 1:
                out.write("\x00TILE\x00")
            continue
        site_rows = []
        collapsed_pairs = []
        balanced_pairs = []
        for key in common:
            ca_list = counts_a[key]
            cb_list = counts_b[key]
            collapsed_pairs.append(
                (
                    _collapse_counts(ca_list, False),
                    _collapse_counts(cb_list, False),
                )
            )
            if multiple:
                balanced_pairs.append(
                    (
                        _collapse_counts(ca_list, True),
                        _collapse_counts(cb_list, True),
                    )
                )
            site_rows.append((key, ca_list, cb_list))
        llr_scores = score_counts_pairs([p for p in collapsed_pairs])
        pmap, effect = estimator.predict_batch(
            np.array([p[0].modified_counts() for p in collapsed_pairs]),
            np.array([p[0].total for p in collapsed_pairs]),
            np.array([p[1].modified_counts() for p in collapsed_pairs]),
            np.array([p[1].total for p in collapsed_pairs]),
        )
        if multiple:
            bal_pmap, bal_effect = estimator.predict_batch(
                np.array([p[0].modified_counts() for p in balanced_pairs]),
                np.array([p[0].total for p in balanced_pairs]),
                np.array([p[1].modified_counts() for p in balanced_pairs]),
                np.array([p[1].total for p in balanced_pairs]),
            )
        seg_sites = []
        for i, (key, ca_list, cb_list) in enumerate(site_rows):
            score = llr_scores[i]
            if score is None or not np.isfinite(pmap[i]):
                failures += 1
                continue
            pos, strand, _base = key
            ca, cb = collapsed_pairs[i]
            row = (
                f"{chrom}\t{pos}\t{pos + 1}\t.\t"
                f"{format_float(score, f64=True)}\t{strand}\t"
                f"{ca.string_counts()}\t{ca.total}\t"
                f"{cb.string_counts()}\t{cb.total}\t"
                f"{ca.string_percentages()}\t{cb.string_percentages()}\t"
                f"{format_float(ca.pct_modified())}\t"
                f"{format_float(cb.pct_modified())}\t"
                f"{format_float(pmap[i], f64=True)}\t"
                f"{format_float(effect[i], f64=True)}"
            )
            if multiple:
                pct_a = int(np.floor(
                    np.float32(len(ca_list))
                    / np.float32(num_a)
                    * np.float32(100.0)
                ))
                pct_b = int(np.floor(
                    np.float32(len(cb_list))
                    / np.float32(num_b)
                    * np.float32(100.0)
                ))
                row += (
                    f"\t{format_float(bal_pmap[i], f64=True)}\t"
                    f"{format_float(bal_effect[i], f64=True)}\t"
                    f"{pct_a}\t{pct_b}"
                )
            if matched:
                if len(ca_list) == len(cb_list):
                    rep_pmap, rep_eff = estimator.predict_batch(
                        np.array([c.modified_counts() for c in ca_list]),
                        np.array([c.total for c in ca_list]),
                        np.array([c.modified_counts() for c in cb_list]),
                        np.array([c.total for c in cb_list]),
                    )
                    rp = ",".join(
                        format_float(v, f64=True) for v in rep_pmap
                    )
                    re_ = ",".join(
                        format_float(v, f64=True) for v in rep_eff
                    )
                else:
                    rp = re_ = "-"
                row += f"\t{rp}\t{re_}"
            out.write(row + "\n")
            successes += 1
            seg_sites.append((pos, score, ca, cb))
        if segmenter is not None:
            segmenter.add_sites(chrom, seg_sites)
        if pcount > 1:
            out.write("\x00TILE\x00")
    if segmenter is not None:
        segmenter.finish()
    return successes, failures


def run_single_site(args, code_lookup) -> int:
    """CLI glue for `dmr pair` single-site mode
    (dmr/subcommands.rs:457-491)."""
    import os

    from .dmr import explicit_index_paths

    sample_index = SampleIndex(
        list(args.a) + list(args.b), code_lookup, args.min_valid_coverage,
        io_threads=args.io_threads, index_paths=explicit_index_paths(args),
    )
    a_idxs = list(range(len(args.a)))
    b_idxs = [i + len(args.a) for i in range(len(args.b))]
    genome_positions = GenomePositions(
        list(args.base),
        args.ref,
        mask=args.mask,
        contigs=sample_index.all_contigs(),
    )
    contigs = sorted(
        c
        for c in genome_positions.contig_names()
        if any(sample_index.has_contig(i, c) for i in a_idxs)
        and any(sample_index.has_contig(i, c) for i in b_idxs)
    )
    prior = tuple(args.prior) if args.prior else (0.55, 0.55)
    if prior[0] + prior[1] < 1.0:
        raise SystemExit("alpha + beta must be > 1.0 for numerical stability")
    if args.max_coverages:
        max_covs = (args.max_coverages[0], args.max_coverages[1])
    else:
        max_covs = estimate_max_coverages(
            sample_index,
            a_idxs,
            b_idxs,
            genome_positions,
            contigs,
            args.interval_size,
            args.n_sample_records,
        )
        print(
            f"calculated max coverage for a: {max_covs[0]} and "
            f"b: {max_covs[1]}",
            file=sys.stderr,
        )
    estimator = PMapEstimator(
        max_covs,
        len(args.a),
        len(args.b),
        prior=prior,
        rope=args.delta,
        cap_coverages=args.cap_coverages,
    )
    segmenter = None
    if args.segment:
        linear = False if args.fine_grained else not args.log_transition_decay
        if args.fine_grained:
            hmm = HmmModel(
                dmr_prior=0.1,
                diff_stay=0.9,
                significance_factor=0.01,
                decay_distance=args.decay_distance,
                linear_transitions=linear,
            )
        else:
            hmm = HmmModel(
                dmr_prior=args.dmr_prior,
                diff_stay=args.diff_stay,
                significance_factor=args.significance_factor,
                decay_distance=args.decay_distance,
                linear_transitions=linear,
            )
        segmenter = HmmSegmenter(args.segment, hmm, args.max_gap_size)
    from ..parallel.devices import (
        maybe_init_distributed, process_info, shard_path,
    )

    maybe_init_distributed()
    pidx, pcount = process_info()
    if pcount > 1 and (args.out_path is None or segmenter is not None):
        raise SystemExit(
            "multi-host dmr single-site requires -o/--out-path and no "
            "--segment (HMM segmentation is cross-batch stateful)"
        )
    if args.out_path is None:
        out = sys.stdout
        close = False
    else:
        if (
            os.path.exists(args.out_path)
            and not args.force
            and pcount == 1
        ):
            raise SystemExit(
                f"refusing to overwrite existing file {args.out_path}"
            )
        os.makedirs(os.path.dirname(args.out_path) or ".", exist_ok=True)
        path = (
            shard_path(args.out_path, pidx) if pcount > 1 else args.out_path
        )
        out = open(path, "w")
        close = True
    try:
        run_single_site_analysis(
            sample_index,
            a_idxs,
            b_idxs,
            genome_positions,
            out,
            estimator,
            interval_size=args.interval_size,
            header=args.header,
            segmenter=segmenter,
            shard=(pidx, pcount),
        )
    finally:
        if close:
            out.close()
    if pcount > 1:
        from jax.experimental import multihost_utils

        from ..parallel.devices import merge_shards

        multihost_utils.sync_global_devices("modkit_dmr_single_site_shards")
        if pidx == 0:
            merge_shards(args.out_path, pcount)
    return 0
