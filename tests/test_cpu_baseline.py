"""CPU reference-architecture baseline engine (modkit_tpu.cpu_baseline):
byte-identical output to the production device engine and to the reference
golden (the comparability precondition for BASELINE.md's numbers)."""

import os

from modkit_tpu.cpu_baseline import run_pileup_cpu
from modkit_tpu.pileup.runner import PileupConfig, run_pileup


def test_cpu_baseline_matches_golden(resources, tmp_path):
    out = str(tmp_path / "cpu.bed")
    res = run_pileup_cpu(
        os.path.join(resources, "bc_anchored_10_reads.sorted.bam"), out
    )
    assert res["rows"] > 0
    golden = open(
        os.path.join(resources, "modbam.modpileup_nofilt.methyl.bed")
    ).read()
    assert open(out).read() == golden


def test_cpu_baseline_matches_engine_on_synthetic(tmp_path):
    from modkit_tpu.utils.synth import make_synthetic_modbam

    bam = str(tmp_path / "b.bam")
    make_synthetic_modbam(bam, n_reads=300, read_len=2000, coverage=15.0)
    cpu_out = str(tmp_path / "cpu.bed")
    eng_out = str(tmp_path / "eng.bed")
    run_pileup_cpu(bam, cpu_out, threads=4)
    run_pileup(
        PileupConfig(
            in_bam=bam, out=eng_out, no_filtering=True,
            suppress_progress=True,
        )
    )
    assert open(cpu_out).read() == open(eng_out).read()
