"""Ports of the reference adjust-mods/call-mods integration scenarios
(tests/test_adjust_mods.rs, tests/test_call_mods.rs): convert sum/rename
semantics, chained collapses, ChEBI round trips, out-of-spec code repair,
edge-filter ranges, old-tag conversion, and secondary/supplementary
passthrough."""

import os

from modkit_tpu.caller import ThresholdCaller
from modkit_tpu.cli import main
from modkit_tpu.io.bam import BamReader, build_bai
from modkit_tpu.summary import summarize_modbam

BAM = "bc_anchored_10_reads.sorted.bam"


def _summary_counts(bam):
    s = summarize_modbam(bam, caller=ThresholdCaller.passthrough())
    return s.mod_call_counts


def _raw_mm(rec):
    got = rec.get_aux("MM") or rec.get_aux("Mm")
    return got[1] if got else ""


def test_adjust_convert_sum_probs(resources, tmp_path):
    """test_adjust_mods.rs:107 — --convert h m folds h calls into m."""
    src = os.path.join(resources, BAM)
    initial = _summary_counts(src)
    out = str(tmp_path / "sum.bam")
    assert main(["adjust-mods", src, out, "--convert", "h", "m"]) == 0
    converted = _summary_counts(out)
    assert converted["C"]["m"] == initial["C"]["m"] + initial["C"]["h"]
    assert "h" not in converted["C"]


def test_adjust_convert_rename(resources, tmp_path):
    """test_adjust_mods.rs:155 — --convert h C renames without summing."""
    src = os.path.join(resources, BAM)
    initial = _summary_counts(src)
    out = str(tmp_path / "rename.bam")
    assert main(["adjust-mods", src, out, "--convert", "h", "C"]) == 0
    converted = _summary_counts(out)
    assert converted["C"]["C"] == initial["C"]["h"]


def test_adjust_convert_sum_probs_rename(resources, tmp_path):
    """test_adjust_mods.rs:192 — both codes convert to a new one."""
    src = os.path.join(resources, BAM)
    initial = _summary_counts(src)
    out = str(tmp_path / "sum_rename.bam")
    assert main([
        "adjust-mods", src, out, "--convert", "h", "C",
        "--convert", "m", "C",
    ]) == 0
    converted = _summary_counts(out)
    assert converted["C"]["C"] == initial["C"]["m"] + initial["C"]["h"]
    assert "h" not in converted["C"] and "m" not in converted["C"]


def test_adjust_to_no_mods(resources, tmp_path):
    """test_adjust_mods.rs:248 — chaining --ignore h then --ignore m
    leaves implicit any-C tags (C+m? -> C+C?)."""
    src = os.path.join(resources, BAM)
    first = str(tmp_path / "no_h.bam")
    assert main(["adjust-mods", src, first, "--ignore", "h"]) == 0
    for rec in BamReader(first).records():
        assert _raw_mm(rec).startswith("C+m?")
    second = str(tmp_path / "no_mods.bam")
    assert main(["adjust-mods", first, second, "--ignore", "m"]) == 0
    for rec in BamReader(second).records():
        assert _raw_mm(rec).startswith("C+C?")


def test_adjust_convert_old_tags(resources, tmp_path):
    """test_adjust_mods.rs:81 — converting a BAM with old-style Mm/Ml tags
    keeps the old tag style and the converted code."""
    out = str(tmp_path / "old_conv.bam")
    assert main([
        "adjust-mods", "--convert", "m", "C",
        os.path.join(resources, "HG002_small.ch20._other.sorted.bam"), out,
    ]) == 0
    n = 0
    for rec in BamReader(out).records():
        assert rec.get_aux("MM") is None, "must keep old-style Mm tag"
        got = rec.get_aux("Mm")
        if got and got[1]:
            assert got[1].startswith("C+C,"), got[1]
            n += 1
    assert n > 0


def test_adjust_out_of_spec_codes(resources, tmp_path):
    """test_adjust_mods.rs:286 — update old tags, then map out-of-spec
    codes (Z -> m, Y -> h); summary equals the in-spec BAM's."""
    updated = str(tmp_path / "upd.bam")
    assert main([
        "update-tags",
        os.path.join(resources, "bc_anchored_10_reads_old_tags.bam"),
        updated, "--no-implicit-probs",
    ]) == 0
    adjusted = str(tmp_path / "spec.bam")
    assert main([
        "adjust-mods", updated, adjusted,
        "--convert", "Z", "m", "--convert", "Y", "h",
    ]) == 0
    assert _summary_counts(adjusted) == _summary_counts(
        os.path.join(resources, BAM)
    )


def test_adjust_edge_filter_ranges(resources, tmp_path):
    """test_adjust_mods.rs:326 — extract positions stay within
    [trim, read_len - trim] for several trims."""
    src = os.path.join(resources, "bc_anchored_10_reads_old_tags.bam")
    for trim in (0, 10, 50, 100):
        adjusted = str(tmp_path / f"edge{trim}.bam")
        assert main([
            "adjust-mods", src, adjusted, "--edge-filter", str(trim),
        ]) == 0
        tsv = str(tmp_path / f"edge{trim}.tsv")
        assert main(["extract", "full", adjusted, tsv, "--force"]) == 0
        lines = open(tsv).read().splitlines()
        hdr = lines[0].split("\t")
        qcol = hdr.index("forward_read_position")
        lcol = hdr.index("read_length")
        for line in lines[1:]:
            f = line.split("\t")
            q, L = int(f[qcol]), int(f[lcol])
            assert q >= trim and q <= L - trim


def test_adjust_chebi_code(resources, tmp_path):
    """test_adjust_mods.rs:363 — ignoring h equals converting h to ChEBI
    76792 then ignoring 76792 (byte-identical records)."""
    src = os.path.join(resources, BAM)
    control = str(tmp_path / "ctl.bam")
    assert main(["adjust-mods", src, control, "--ignore", "h"]) == 0
    pre = str(tmp_path / "chebi.bam")
    assert main(["adjust-mods", src, pre, "--convert", "h", "76792"]) == 0
    exp = str(tmp_path / "chebi_ign.bam")
    assert main(["adjust-mods", pre, exp, "--ignore", "76792"]) == 0
    a = [r.raw() for r in BamReader(control).records()]
    b = [r.raw() for r in BamReader(exp).records()]
    assert a == b


def test_adjust_mods_supplementary_secondary(resources, tmp_path):
    """test_adjust_mods.rs:415 — all 3 records (primary + supplementary +
    secondary) survive adjust with --ff."""
    out1 = str(tmp_path / "supp_ign.bam")
    assert main([
        "adjust-mods",
        os.path.join(resources, "test_supplementary_secondary.bam"),
        out1, "--ignore", "h", "--ff",
    ]) == 0
    assert len(list(BamReader(out1).records())) == 3
    out2 = str(tmp_path / "supp_conv.bam")
    assert main([
        "adjust-mods", out1, out2, "--convert", "m", "C", "--ff",
    ]) == 0
    assert len(list(BamReader(out2).records())) == 3


def test_adjust_mods_motifs(resources, tmp_path):
    """test_adjust_mods.rs:461 — multi-motif keep runs without error."""
    out = str(tmp_path / "motifs.bam")
    assert main([
        "adjust-mods",
        os.path.join(resources, "testing_all_context_calls.bam"), out,
        "--motif", "DRACH", "2", "--motif", "CG", "0", "--ff",
    ]) == 0
    assert len(list(BamReader(out).records())) > 0


def test_adjust_no_tags(resources, tmp_path):
    """test_adjust_mods.rs:68 — a BAM without MM/ML tags passes through
    without failing."""
    import pytest

    src = os.path.join(resources, "input_C_no_tags.bam")
    if not os.path.exists(src):
        pytest.skip("input_C_no_tags.bam not shipped in this reference copy")
    out = str(tmp_path / "no_tags.bam")
    assert main(["adjust-mods", "--ignore", "h", src, out]) == 0


def test_adjust_golden_bams(resources, tmp_path):
    """test_adjust_mods.rs:17 tests_adjust_output — --ignore h against the
    checked-in adjusted BAMs (record-level equality)."""
    import pytest

    if not os.path.exists(os.path.join(resources, "input_C.bam")):
        pytest.skip("input_C fixtures not shipped in this reference copy")
    for src, want in (
        ("input_C.bam", "ref_out_C_auto.bam"),
        ("input_5mC.bam", "ref_out_5mC_auto.bam"),
    ):
        out = str(tmp_path / f"adj_{src}")
        assert main([
            "adjust-mods", "--ignore", "h",
            os.path.join(resources, src), out,
        ]) == 0
        got = list(BamReader(out).records())
        exp = list(BamReader(os.path.join(resources, want)).records())
        assert len(got) == len(exp)
        for g, e in zip(got, exp):
            assert g.name == e.name
            assert _raw_mm(g) == _raw_mm(e)
            gm, em = g.get_aux("ML"), e.get_aux("ML")
            if em is not None:
                assert (gm[1] == em[1]).all()


def test_call_mods_keeps_all_mod_calls(resources, tmp_path):
    """test_call_mods.rs:169 — with --no-filtering every input call
    survives as a 0/1 probability call."""
    out = str(tmp_path / "called.bam")
    assert main([
        "call-mods", os.path.join(resources, BAM), out, "--no-filtering",
    ]) == 0
    n_in = sum(
        len(_raw_mm(r)) > 0 for r in BamReader(
            os.path.join(resources, BAM)
        ).records()
    )
    n_out = 0
    for rec in BamReader(out).records():
        ml = rec.get_aux("ML")
        if ml is not None:
            assert set(ml[1].tolist()) <= {0, 255}
            n_out += 1
    assert n_out == n_in == 10


def test_call_mods_thresholds_correctly(resources, tmp_path):
    """test_call_mods.rs:80 — per-base + per-mod thresholds: every call
    surviving call-mods had its winning probability over the matching
    threshold in the original BAM, and survivors are hardened to 0/255."""
    import numpy as np

    src = os.path.join(resources, "ecoli_reg.sorted.bam")
    out = str(tmp_path / "ecoli_called.bam")
    assert main([
        "call-mods", src, out,
        "--filter-threshold", "A:0.65", "--mod-threshold", "a:0.95",
        "--filter-threshold", "C:0.85", "--mod-threshold", "m:0.95",
    ]) == 0
    caller = ThresholdCaller(
        {"A": 0.65, "C": 0.85}, {"a": 0.95, "m": 0.95}, 0.0
    )
    from modkit_tpu.thresholds import read_groups

    orig = {
        r.name: r for r in BamReader(src).records() if not r.is_not_primary
    }
    n_checked = 0
    for rec in BamReader(out).records():
        if rec.is_not_primary:
            continue
        ml = rec.get_aux("ML")
        if ml is not None and len(ml[1]):
            assert set(np.unique(ml[1]).tolist()) <= {0, 255}
        # survivors <= original calls, per base
        called = read_groups(rec, only_mapped=False)
        source = read_groups(orig[rec.name], only_mapped=False)
        for b_idx, glist in called.items():
            n_live = sum(int((p >= 0).sum()) for _, p in glist)
            n_src = sum(
                int((p >= 0).sum()) for _, p in source.get(b_idx, [])
            )
            assert n_live <= n_src
        n_checked += 1
    assert n_checked > 0


def test_update_tags_implicit_no_probabilities(resources, tmp_path):
    """test_update_tags.rs:7 — bare old-style 'C+h;C+m;' headers update to
    implicit '.' mode by default."""
    src = os.path.join(resources, "single_read_old_tags_no_probs.bam")
    rec = next(BamReader(src).records())
    assert (rec.get_aux("MM") or rec.get_aux("Mm"))[1] == "C+h;C+m;"
    out = str(tmp_path / "updated_noprobs.bam")
    assert main(["update-tags", src, out]) == 0
    rec = next(BamReader(out).records())
    assert rec.get_aux("MM")[1] == "C+h.;C+m.;"


def test_call_mods_supplementary_secondary(resources, tmp_path):
    """test_call_mods.rs:301 — primary + supplementary + secondary records
    all survive call-mods with --ff."""
    out = str(tmp_path / "supp_called.bam")
    assert main([
        "call-mods",
        os.path.join(resources, "test_supplementary_secondary.bam"),
        out, "--no-filtering", "--ff",
    ]) == 0
    assert len(list(BamReader(out).records())) == 3
