"""Benchmark: end-to-end pileup throughput (modBAM -> bedMethyl).

Measures the flagship workload from BASELINE.json — pileup reads/s at
30x-coverage synthetic WGS-style data — through the full production
pipeline: BAM decode -> native tile event extraction -> fused
threshold-call kernel on the device(s) -> native bedMethyl row emission.

``vs_baseline`` compares against the **reference-architecture CPU
baseline** (modkit_tpu.cpu_baseline): a multithreaded all-C++ pileup
mirroring the reference's rayon-over-intervals design, using every host
core. The actual reference binary cannot be built or fetched in this
environment (no Rust toolchain, zero network egress) — BASELINE.md records
the evidence and this proxy's construction. Outputs of the two engines are
asserted byte-identical before timing is reported.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import os
import tempfile
import time


def main():
    from modkit_tpu.cpu_baseline import run_pileup_cpu
    from modkit_tpu.pileup.runner import PileupConfig, run_pileup
    from modkit_tpu.utils.synth import make_synthetic_modbam

    n_reads = int(os.environ.get("MODKIT_BENCH_READS", "2000"))
    read_len = int(os.environ.get("MODKIT_BENCH_READ_LEN", "5000"))
    reps = int(os.environ.get("MODKIT_BENCH_REPS", "3"))

    tmp = tempfile.mkdtemp(prefix="modkit_bench_")
    bam = os.path.join(tmp, "synth30x.bam")
    stats = make_synthetic_modbam(
        bam, n_reads=n_reads, read_len=read_len, coverage=30.0, seed=1
    )

    def time_device(i):
        t0 = time.perf_counter()
        res = run_pileup(
            PileupConfig(
                in_bam=bam, out=os.path.join(tmp, f"d{i}.bed"),
                no_filtering=True, use_device=True, suppress_progress=True,
            )
        )
        dt = time.perf_counter() - t0
        assert res["rows"] > 0
        return dt

    def time_cpu(i):
        t0 = time.perf_counter()
        res = run_pileup_cpu(bam, os.path.join(tmp, f"c{i}.bed"))
        dt = time.perf_counter() - t0
        assert res["rows"] > 0
        return dt

    time_device("warm")  # jit compile
    best_dev = min(time_device(i) for i in range(reps))
    best_cpu = min(time_cpu(i) for i in range(reps))

    dev_out = open(os.path.join(tmp, "d0.bed")).read()
    cpu_out = open(os.path.join(tmp, "c0.bed")).read()
    assert dev_out == cpu_out, "device engine != CPU baseline output"

    reads_per_s = n_reads / best_dev
    positions_per_s = stats["contig_len"] / best_dev
    print(
        json.dumps(
            {
                "metric": "pileup_reads_per_s",
                "value": round(reads_per_s, 1),
                "unit": "reads/s (5kb reads, 30x, 2 mod codes)",
                "vs_baseline": round(best_cpu / best_dev, 3),
                "extra": {
                    "baseline": "all-C++ multithreaded CPU pileup "
                    "(reference-architecture proxy; see BASELINE.md)",
                    "cpu_baseline_reads_per_s": round(n_reads / best_cpu, 1),
                    "positions_per_s": round(positions_per_s, 1),
                    "device_wall_s": round(best_dev, 4),
                    "cpu_wall_s": round(best_cpu, 4),
                    "n_reads": n_reads,
                    "outputs_identical": True,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
