"""Top-level pileup orchestration (reference pileup/subcommand.rs:382 run).

Feeds genome tiles in (tid, start) order through the TileProcessor and
writes bedMethyl rows in order. Threshold estimation (unless --no-filtering
or a fixed --filter-threshold) samples reads and computes the filter
percentile on device (thresholds.py).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

from ..caller import ThresholdCaller
from ..io.bam import BamReader
from ..writers import BedGraphWriter, BedMethylWriter
from .engine import PileupOptions, TileProcessor


@dataclass
class PileupConfig:
    in_bam: str
    out: str  # path, or "-"/"stdout"
    interval_size: int = 100_000
    no_filtering: bool = False
    filter_threshold: dict | None = None  # {"default": f, "A": f, ...}
    mod_thresholds: dict | None = None  # {code: f}
    filter_percentile: float = 0.1
    sample_frac: float | None = None
    num_reads: int | None = 10042
    seed: int | None = None
    include_unmapped: bool = False
    region: str | None = None
    combine_mods: bool = False
    collapse: list = field(default_factory=list)
    edge_filter: object = None
    force_allow: bool = False
    max_depth: int = 8000
    mixed_delimiters: bool = False
    with_header: bool = False
    bedgraph: bool = False
    prefix: str | None = None
    use_device: bool = True
    sampling_interval_size: int = 1_000_000


def parse_region(region: str, header) -> tuple[int, int, int]:
    """'chrom' or 'chrom:start-end' (1-based inclusive) -> (tid, start0, end)."""
    if ":" in region:
        chrom, rng = region.rsplit(":", 1)
        a, b = rng.replace(",", "").split("-")
        start, end = int(a) - 1, int(b)
    else:
        chrom, start, end = region, 0, None
    tid = header.name_to_tid.get(chrom)
    if tid is None:
        raise ValueError(f"contig {chrom} not found in header")
    if end is None:
        end = header.refs[tid].length
    return tid, start, end


def run_pileup(cfg: PileupConfig) -> dict:
    reader = BamReader(cfg.in_bam)
    header = reader.header

    caller = resolve_caller(cfg, reader)

    opts = PileupOptions(
        combine_mods=cfg.combine_mods,
        collapse=list(cfg.collapse),
        edge_filter=cfg.edge_filter,
        force_allow=cfg.force_allow,
        max_depth=cfg.max_depth,
        use_device=cfg.use_device,
    )
    proc = TileProcessor(caller, opts)

    if cfg.bedgraph:
        writer = BedGraphWriter(cfg.out, cfg.prefix)
    elif cfg.out in ("-", "stdout"):
        writer = BedMethylWriter(sys.stdout, cfg.mixed_delimiters, cfg.with_header)
    else:
        writer = BedMethylWriter(cfg.out, cfg.mixed_delimiters, cfg.with_header)

    targets = list(range(len(header.refs)))
    if cfg.region is not None:
        tid, rstart, rend = parse_region(cfg.region, header)
        spans = [(tid, rstart, rend)]
    else:
        spans = [(tid, 0, header.refs[tid].length) for tid in targets]

    n_rows = 0
    for tid, rstart, rend in spans:
        for start in range(rstart, rend, cfg.interval_size):
            end = min(start + cfg.interval_size, rend)
            for _pos, rows in proc.process_tile(reader, tid, start, end):
                writer.write_rows(header.tid2name(tid), rows)
                n_rows += len(rows)
    writer.close()
    return dict(
        rows=n_rows,
        reads_used=proc.n_used,
        reads_skipped=proc.n_skipped,
        errors=dict(proc.errors),
        thresholds={
            "per_base": dict(caller.per_base),
            "per_mod": dict(caller.per_mod),
            "default": caller.default_threshold,
        },
    )


def resolve_caller(cfg: PileupConfig, reader: BamReader) -> ThresholdCaller:
    if cfg.no_filtering:
        return ThresholdCaller.passthrough()
    per_mod = dict(cfg.mod_thresholds or {})
    if cfg.filter_threshold is not None:
        ft = dict(cfg.filter_threshold)
        default = ft.pop("default", 0.0)
        return ThresholdCaller(ft, per_mod, default)
    # estimate via sampling + percentile (command_utils.rs:74
    # get_threshold_from_options)
    from ..thresholds import estimate_thresholds

    per_base = estimate_thresholds(
        reader,
        num_reads=cfg.num_reads,
        sample_frac=cfg.sample_frac,
        seed=cfg.seed,
        include_unmapped=cfg.include_unmapped,
        filter_percentile=cfg.filter_percentile,
        region=cfg.region,
        collapse=cfg.collapse,
        edge_filter=cfg.edge_filter,
        force_allow=cfg.force_allow,
        interval_size=cfg.sampling_interval_size,
    )
    return ThresholdCaller(per_base, per_mod, 0.0)
