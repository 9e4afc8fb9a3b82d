"""WGS-scale evidence run: 30x coverage over a >=100 Mbp contig
(>=1000 genome tiles) through the DEFAULT estimate+filter pileup.

Records wall time, peak RSS, journal overhead and throughput into
BENCH_SCALE_r04.json (BASELINE.json "30x WGS" north star; VERDICT r3
weak #8: scale evidence stopped at 10 Mbp / 25x). Opt-in — run manually
or via MODKIT_BENCH_SCALE=1; not part of the driver's bench.py loop.
"""

import json
import os
import resource
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    from modkit_tpu.pileup.runner import PileupConfig, run_pileup
    from modkit_tpu.utils.synth import make_synthetic_modbam

    n_reads = int(os.environ.get("SCALE_READS", "600000"))
    read_len = int(os.environ.get("SCALE_READ_LEN", "5000"))
    coverage = float(os.environ.get("SCALE_COVERAGE", "30"))

    tmp = tempfile.mkdtemp(prefix="modkit_scale_")
    bam = os.path.join(tmp, "scale.bam")
    t0 = time.perf_counter()
    stats = make_synthetic_modbam(
        bam, n_reads=n_reads, read_len=read_len, coverage=coverage, seed=2
    )
    gen_s = time.perf_counter() - t0
    contig_len = stats["contig_len"]
    n_tiles = -(-contig_len // 100_000)
    print(
        f"[scale] generated {n_reads} reads, contig {contig_len} bp, "
        f"{n_tiles} tiles in {gen_s:.0f}s",
        file=sys.stderr,
    )

    def run(tag, **kw):
        t0 = time.perf_counter()
        res = run_pileup(
            PileupConfig(
                in_bam=bam, out=os.path.join(tmp, f"{tag}.bed"),
                use_device=True, suppress_progress=True, **kw,
            )
        )
        dt = time.perf_counter() - t0
        assert res["rows"] > 0
        print(f"[scale] {tag}: {dt:.1f}s ({res['rows']} rows)", file=sys.stderr)
        return dt

    wall_default = run("default")
    wall_journal = run(
        "journal", journal=os.path.join(tmp, "journal.jsonl")
    )
    peak_rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024

    out = {
        "config": {
            "n_reads": n_reads,
            "read_len": read_len,
            "coverage": coverage,
            "contig_len": contig_len,
            "n_tiles": int(n_tiles),
        },
        "default_estimate_filter_wall_s": round(wall_default, 1),
        "reads_per_s": round(n_reads / wall_default, 1),
        "positions_per_s": round(contig_len / wall_default, 1),
        "journal_wall_s": round(wall_journal, 1),
        "journal_overhead_pct": round(
            100.0 * (wall_journal - wall_default) / wall_default, 1
        ),
        "peak_rss_mb": round(peak_rss_mb, 1),
        "synth_gen_s": round(gen_s, 1),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SCALE_r05.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
