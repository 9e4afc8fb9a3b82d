"""Per-read event extraction for the pileup engine.

Reproduces the semantics of the reference's ReadCache + htslib column loop
(read_cache.rs:111 add_record, pileup/mod.rs:718 process_region) without a
per-column pileup engine. Each read is decoded once into:

- **sparse mod-call candidates** (reference positions that carry ML
  probabilities) — these need the threshold-call kernel and are shipped to
  the device, and
- **dense coverage features** (nocall columns and deleted reference
  positions) — these are plain histograms with no per-event math and are
  counted host-side (a bincount), so the host->device transfer carries only
  the sparse probability-bearing events (~an order of magnitude fewer).

Per column the reference does, for each primary alignment:
  - deletion -> Feature::Delete on the alignment strand
  - read base at the column (complemented if reverse == instrument-
    orientation base); non-ACGT -> column skipped for this read
  - look up the read's (mod-strand) call tables keyed by that base:
    hits -> mod-call features (neg-strand hits count toward the complement
    base and the opposite tally), no hit on either strand -> NoCall
Codes carried by the read are registered for every column the read covers
(read_cache.rs:298 add_mod_codes_for_record).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..collapse import CollapseMethod, apply_collapse
from ..errors import INVALID_IMPLICIT_MODE, NO_MOD_INFO, ModKitError
from ..modcodes import DNA_BASE_IDX, DNA_IDX_COMPLEMENT
from ..modtags import DEFAULT_IMPLICIT, EXPLICIT, decode_record

# ASCII byte -> base index (A0 C1 G2 T3, else -1)
BASE_LUT = np.full(256, -1, dtype=np.int8)
for _b, _i in DNA_BASE_IDX.items():
    BASE_LUT[ord(_b)] = _i

EV_MODCALL = 0
EV_NOCALL = 1
EV_DELETE = 2

_EMPTY_I64 = np.empty(0, dtype=np.int64)
_EMPTY_I8 = np.empty(0, dtype=np.int8)


@dataclass
class EdgeFilter:
    """Remove mod calls within N bases of read ends (mod_bam.rs:1635)."""

    start_trim: int
    end_trim: int
    inverted: bool = False

    def keep_mask(self, positions: np.ndarray, read_len: int) -> np.ndarray:
        lo = self.start_trim
        hi = read_len - self.end_trim
        inside = (positions >= lo) & (positions < hi)
        return ~inside if self.inverted else inside

    def read_can_be_trimmed(self, read_len: int) -> bool:
        return read_len > self.start_trim + self.end_trim


@dataclass
class ReadEvents:
    """Decoded pileup features for one read, in reference coordinates.

    Mod-call candidates keep per-event tally strands (a negative-mod-strand
    call tallies on the opposite strand, read_cache.rs:80-97); nocall and
    delete features always tally on the alignment strand.
    """

    # sparse mod-call candidates
    mod_rpos: np.ndarray  # int64
    mod_out: np.ndarray  # int8: tally strand (0 +, 1 -)
    mod_base: np.ndarray  # int8: primary base for counting/threshold lookup
    mod_probs: np.ndarray  # float32 [n, m_read] aligned to `codes`
    codes: list  # read-local code vocabulary (column order)
    # dense features, all tallied on the alignment strand
    aln_strand: int  # 0 forward, 1 reverse
    nc_rpos: np.ndarray  # int64: nocall column positions
    nc_base: np.ndarray  # int8: column (read) base
    del_rpos: np.ndarray  # int64: deleted reference positions
    # codes registered per (out_strand_key, base_idx):
    registered: dict = field(default_factory=dict)
    # reference intervals covered by M/D ops (for observed-code painting)
    cover: np.ndarray = None  # int64 [k, 2]


def covered_intervals(rec) -> np.ndarray:
    """Merged reference intervals of M/D/=/X ops (N splits)."""
    cg = rec.cigar
    ops = cg & 0xF
    lens = (cg >> 4).astype(np.int64)
    consumes_ref = np.isin(ops, (0, 2, 3, 7, 8))
    r_len = np.where(consumes_ref, lens, 0)
    r_starts = rec.pos + np.concatenate([[0], np.cumsum(r_len)[:-1]])
    present = np.isin(ops, (0, 2, 7, 8)) & (lens > 0)
    if not present.any():
        return np.empty((0, 2), dtype=np.int64)
    s = r_starts[present]
    e = s + lens[present]
    # merge adjacent intervals
    keep = np.concatenate([[True], s[1:] != e[:-1]])
    starts = s[keep]
    ends = e[np.concatenate([keep[1:], [True]])]
    return np.stack([starts, ends], axis=1)


def skipped_read_events(rec) -> ReadEvents:
    """Events for a read whose mod tags failed to decode.

    Skip-set reads still sit in the pileup: every aligned column yields a
    NoCall feature and deletions yield Delete features (read_cache.rs:243
    returns (None, None) -> pileup/mod.rs:936 NoCall), they just register no
    codes.
    """
    aln_rev = 1 if rec.is_reverse else 0
    qf, rp = rec.aligned_pairs_forward()
    fwd_seq = rec.forward_seq()
    col_base = BASE_LUT[fwd_seq[qf]] if len(qf) else _EMPTY_I8
    nc = col_base >= 0
    return ReadEvents(
        _EMPTY_I64, _EMPTY_I8, _EMPTY_I8,
        np.empty((0, 0), dtype=np.float32), [],
        aln_rev, rp[nc], col_base[nc], rec.deletion_ref_positions(),
        {}, covered_intervals(rec),
    )


def read_to_events(
    rec,
    collapse_methods: list[CollapseMethod] | None = None,
    edge_filter: EdgeFilter | None = None,
    force_allow: bool = False,
) -> ReadEvents:
    """Decode a record and expand it into pileup events.

    Raises ModKitError on records that the reference skips (bad tags,
    un-allowed implicit mode, all positions edge-filtered, ...).
    """
    info = decode_record(rec)
    if info.is_empty():
        raise ModKitError(NO_MOD_INFO, "no modified base information")
    for g in info.groups.values():
        if g.skip_mode == DEFAULT_IMPLICIT and not force_allow:
            raise ModKitError(
                INVALID_IMPLICIT_MODE,
                "record has un-allowed implicit mode; use --force-allow-implicit",
            )

    aln_rev = 1 if rec.is_reverse else 0
    qf, rp = rec.aligned_pairs_forward()
    order = np.argsort(qf, kind="stable")
    qf_sorted = qf[order]
    rp_sorted = rp[order]
    fwd_seq = rec.forward_seq()
    col_base = BASE_LUT[fwd_seq[qf_sorted]]

    ev_rpos, ev_out, ev_base, ev_prob_rows = [], [], [], []
    codes: list = []
    code_cols: dict = {}
    registered: dict = {}
    hit_any = np.zeros(len(qf_sorted), dtype=bool)

    added_any = False
    for base, mod_strand, g in info.iter_groups():
        positions = g.positions
        probs = g.probs
        gcodes = list(g.codes)
        if edge_filter is not None:
            if not edge_filter.read_can_be_trimmed(rec.l_seq):
                continue
            keep = edge_filter.keep_mask(positions, rec.l_seq)
            if not keep.any():
                continue
            positions = positions[keep]
            probs = probs[keep]
        if collapse_methods:
            for mth in collapse_methods:
                gcodes, probs = apply_collapse(gcodes, probs, mth)

        # register read-local code columns
        for c in gcodes:
            if c not in code_cols:
                code_cols[c] = len(codes)
                codes.append(c)

        b_idx = DNA_BASE_IDX[base]
        threshold_b = b_idx if mod_strand == 0 else DNA_IDX_COMPLEMENT[b_idx]
        out_strand_key = aln_rev ^ mod_strand
        # codes present anywhere in the (post-collapse) group register for
        # the read (read_cache.rs:170-195); note only codes with a present
        # class at >= 1 position count
        present_any = (probs >= 0).any(axis=0)
        reg = registered.setdefault((out_strand_key, threshold_b), set())
        for j, c in enumerate(gcodes):
            if present_any[j]:
                reg.add(c)

        # intersect group positions with aligned columns
        idx = np.searchsorted(qf_sorted, positions)
        in_range = idx < len(qf_sorted)
        idx_c = np.clip(idx, 0, max(len(qf_sorted) - 1, 0))
        matched = in_range & (qf_sorted[idx_c] == positions)
        if not matched.any():
            added_any = True  # group decoded fine, just no aligned positions
            continue
        sel = np.flatnonzero(matched)
        cols = idx[sel]
        hit_any[cols] = True

        n = len(sel)
        ev_rpos.append(rp_sorted[cols])
        ev_out.append(np.full(n, out_strand_key, dtype=np.int8))
        ev_base.append(np.full(n, threshold_b, dtype=np.int8))
        row = np.full((n, len(codes)), -1.0, dtype=np.float32)
        for j, c in enumerate(gcodes):
            row[:, code_cols[c]] = probs[sel, j]
        ev_prob_rows.append(row)
        added_any = True

    if not added_any:
        raise ModKitError(NO_MOD_INFO, "all positions removed")

    # nocall: aligned columns with a valid base and no call on either strand
    valid_base = col_base >= 0
    nc = valid_base & ~hit_any

    m = len(codes)
    if ev_rpos:
        rows = [
            np.pad(r, ((0, 0), (0, m - r.shape[1])), constant_values=-1.0)
            if r.shape[1] < m
            else r
            for r in ev_prob_rows
        ]
        mod_rpos = np.concatenate(ev_rpos)
        mod_out = np.concatenate(ev_out)
        mod_base = np.concatenate(ev_base)
        mod_probs = np.concatenate(rows, axis=0)
    else:
        mod_rpos, mod_out, mod_base = _EMPTY_I64, _EMPTY_I8, _EMPTY_I8
        mod_probs = np.empty((0, m), dtype=np.float32)

    return ReadEvents(
        mod_rpos, mod_out, mod_base, mod_probs, codes,
        aln_rev, rp_sorted[nc], col_base[nc], rec.deletion_ref_positions(),
        registered, covered_intervals(rec),
    )
