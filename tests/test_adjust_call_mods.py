"""Round-trip tests for the modBAM rewriters (adjust-mods, call-mods,
update-tags), mirroring reference tests/test_pileup.rs:91 and
tests/test_call_mods.rs:211."""

import os

from modkit_tpu.caller import ThresholdCaller
from modkit_tpu.collapse import CollapseMethod
from modkit_tpu.engines.adjust import adjust_modbam
from modkit_tpu.io.bam import BamReader, build_bai
from modkit_tpu.modtags import EXPLICIT
from modkit_tpu.pileup.runner import PileupConfig, run_pileup


def test_adjust_ignore_h_then_pileup_equals_pileup_ignore_h(resources, tmp_path):
    bam = os.path.join(resources, "bc_anchored_10_reads.sorted.bam")
    adjusted = str(tmp_path / "adjusted.bam")
    adjust_modbam(bam, adjusted, [CollapseMethod("dist", ("h",))])
    build_bai(adjusted)

    out_a = str(tmp_path / "a.bed")
    run_pileup(PileupConfig(in_bam=adjusted, out=out_a, interval_size=25,
                            no_filtering=True))
    out_b = str(tmp_path / "b.bed")
    run_pileup(PileupConfig(
        in_bam=bam, out=out_b, interval_size=25, no_filtering=True,
        collapse=[CollapseMethod("dist", ("h",))],
    ))
    with open(out_a) as fa, open(out_b) as fb:
        assert fa.read() == fb.read()


def test_update_tags_roundtrip_pileup(resources, tmp_path):
    # update-tags --no-implicit-probs --mode explicit must not change pileup
    # results on explicit-tag inputs
    bam = os.path.join(resources, "bc_anchored_10_reads.sorted.bam")
    updated = str(tmp_path / "updated.bam")
    adjust_modbam(bam, updated, new_mode=EXPLICIT, drop_implicit=True,
                  force_mm_style="MM")
    build_bai(updated)
    out_a = str(tmp_path / "a.bed")
    out_b = str(tmp_path / "b.bed")
    run_pileup(PileupConfig(in_bam=updated, out=out_a, no_filtering=True))
    run_pileup(PileupConfig(in_bam=bam, out=out_b, no_filtering=True))
    with open(out_a) as fa, open(out_b) as fb:
        assert fa.read() == fb.read()


def test_call_mods_same_pileup(resources, tmp_path):
    # reference tests/test_call_mods.rs:211: pileup of a hard-called BAM with
    # --no-filtering equals in-situ thresholded pileup on the count columns
    src = os.path.join(resources, "ecoli_reg.sorted.bam")
    updated = str(tmp_path / "updated.bam")
    adjust_modbam(src, updated, new_mode=EXPLICIT, drop_implicit=True,
                  force_mm_style="MM")
    build_bai(updated)

    called = str(tmp_path / "called.bam")
    caller = ThresholdCaller(
        {"A": 0.65, "C": 0.85}, {"a": 0.95, "m": 0.95}, 0.0
    )
    adjust_modbam(updated, called, (), caller, filter_only=False)
    build_bai(called)

    out_called = str(tmp_path / "called.bed")
    run_pileup(PileupConfig(in_bam=called, out=out_called, no_filtering=True))
    out_insitu = str(tmp_path / "insitu.bed")
    run_pileup(PileupConfig(
        in_bam=updated, out=out_insitu,
        filter_threshold={"A": 0.65, "C": 0.85},
        mod_thresholds={"a": 0.95, "m": 0.95},
    ))

    with open(out_called) as fh:
        called_rows = [l.split("\t") for l in fh.read().splitlines()]
    with open(out_insitu) as fh:
        insitu_rows = [l.split("\t") for l in fh.read().splitlines()]
    assert len(called_rows) == len(insitu_rows)
    assert len(called_rows) > 0
    for x, y in zip(called_rows, insitu_rows):
        # chrom, start, name/code, strand, n_mod, valid, n_canonical, n_other
        for col in (0, 1, 3, 5, 9, 11, 12, 13):
            assert x[col] == y[col], (x, y)
        # fail+diff+nocall mass is conserved (filtered becomes nocall)
        assert int(x[15]) + int(x[16]) + int(x[17]) == (
            int(y[15]) + int(y[16]) + int(y[17])
        ), (x, y)


def test_rewritten_bam_parses(resources, tmp_path):
    bam = os.path.join(resources, "bc_anchored_10_reads.sorted.bam")
    adjusted = str(tmp_path / "adj.bam")
    adjust_modbam(bam, adjusted, [CollapseMethod("dist", ("h",))])
    reader = BamReader(adjusted)
    n = 0
    for rec in reader.records():
        mm = rec.get_aux("MM") or rec.get_aux("Mm")
        assert mm is not None
        assert "h" not in mm[1]
        n += 1
    assert n == 10
