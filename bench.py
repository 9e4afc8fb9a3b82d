"""Benchmark: end-to-end pileup throughput (modBAM -> bedMethyl).

Measures the flagship workload from BASELINE.json — pileup reads/s at
30x-coverage synthetic WGS-style data — through the full pipeline: BAM
decode -> event extraction -> fused threshold-call + scatter-add count
kernel on the device -> bedMethyl row emission. The reference publishes no
benchmark numbers (BASELINE.md); ``vs_baseline`` compares against the
pure-host (numpy) fallback path executing identical semantics on this
machine, i.e. the speedup the device kernel path delivers end-to-end.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import tempfile
import time


def time_pileup(bam: str, out: str, use_device: bool) -> float:
    from modkit_tpu.pileup.runner import PileupConfig, run_pileup

    t0 = time.perf_counter()
    res = run_pileup(
        PileupConfig(
            in_bam=bam, out=out, no_filtering=True, use_device=use_device
        )
    )
    dt = time.perf_counter() - t0
    assert res["rows"] > 0
    return dt, res


def main():
    from modkit_tpu.utils.synth import make_synthetic_modbam

    tmp = tempfile.mkdtemp(prefix="modkit_bench_")
    bam = os.path.join(tmp, "synth30x.bam")
    stats = make_synthetic_modbam(
        bam, n_reads=2000, read_len=5000, coverage=30.0, seed=1
    )
    n_reads = stats["n_reads"]

    # warm-up (jit compile) then timed device run
    time_pileup(bam, os.path.join(tmp, "w.bed"), use_device=True)
    best_dev = min(
        time_pileup(bam, os.path.join(tmp, f"d{i}.bed"), True)[0]
        for i in range(3)
    )
    # host fallback (identical semantics, numpy single-thread)
    host_dt, _ = time_pileup(bam, os.path.join(tmp, "h.bed"), False)

    reads_per_s = n_reads / best_dev
    print(
        json.dumps(
            {
                "metric": "pileup_reads_per_s",
                "value": round(reads_per_s, 1),
                "unit": "reads/s (5kb reads, 30x, 2 mod codes)",
                "vs_baseline": round(host_dt / best_dev, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
