"""Golden conformance: motif/CpG pileup, strand combining, presets,
include-positions (reference tests/test_pileup.rs motif tests)."""

import os

import pytest

from modkit_tpu.pileup.runner import PileupConfig, run_pileup


def _check(tmp_path, name, want_fp, **kw):
    out = str(tmp_path / f"{name}.bed")
    run_pileup(PileupConfig(out=out, **kw))
    with open(out) as fh:
        got = fh.read()
    with open(want_fp) as fh:
        want = fh.read()
    assert got == want, f"{name}: output differs from golden"


def test_pileup_cpg_motif_filtering(resources, tmp_path):
    # test_pileup.rs:237
    _check(
        tmp_path, "cg", os.path.join(resources, "bc_anchored_10_reads_nofilt_cg_motif.bed"),
        in_bam=os.path.join(resources, "bc_anchored_10_reads.sorted.bam"),
        no_filtering=True, mixed_delimiters=True, cpg=True,
        reference_fasta=os.path.join(resources, "CGI_ladder_3.6kb_ref.fa"),
    )


@pytest.mark.parametrize("interval_size", [10, 88, 91, 94, 10000])
def test_pileup_cpg_strand_combine(resources, tmp_path, interval_size):
    # test_pileup.rs:257 — interval sweep exercises motif-boundary extension
    _check(
        tmp_path, f"sc{interval_size}",
        os.path.join(resources, "bc_anchored_10_reads_nofilt_cg_motif_strand_combine.bed"),
        in_bam=os.path.join(resources, "bc_anchored_10_reads.sorted.bam"),
        no_filtering=True, interval_size=interval_size, cpg=True,
        combine_strands=True, mixed_delimiters=True,
        reference_fasta=os.path.join(resources, "CGI_ladder_3.6kb_ref.fa"),
    )


def test_pileup_multi_motif_cg0_cgcg2(resources, tmp_path):
    # test_pileup.rs:738
    bam = os.path.join(
        resources,
        "CG_5mC_20230207_1700_6A_PAG66026_3c0abf27_oligo_741_adapters_modcalls_0th_sort_10_reads.bam",
    )
    ref = os.path.join(resources, "CGI_ladder_3.6kb_ref.fa")
    _check(
        tmp_path, "cgcg2", os.path.join(resources, "cgcg2_cg0_test1.bed"),
        in_bam=bam, motifs=["CG", "0", "CGCG", "2"], mixed_delimiters=True,
        no_filtering=True, reference_fasta=ref,
        region="oligo_741_adapters:22-62",
    )
    _check(
        tmp_path, "cgcg2c",
        os.path.join(resources, "cgcg2_cg0_test1_combine_strands.bed"),
        in_bam=bam, motifs=["CG", "0", "CGCG", "2"], mixed_delimiters=True,
        no_filtering=True, combine_strands=True, reference_fasta=ref,
        region="oligo_741_adapters:22-62",
    )


def test_pileup_traditional_preset_include_positions(resources, tmp_path):
    # test_pileup.rs:663 — preset + include-BED + estimated thresholds
    _check(
        tmp_path, "trad",
        os.path.join(resources, "modbam.modpileup_filt_positions_025_traditional.methyl.bed"),
        in_bam=os.path.join(resources, "bc_anchored_10_reads.sorted.bam"),
        mixed_delimiters=True, interval_size=25, filter_percentile=0.25,
        preset="traditional",
        reference_fasta=os.path.join(resources, "CGI_ladder_3.6kb_ref.fa"),
        include_bed=os.path.join(resources, "CGI_ladder_3.6kb_ref_include_positions.bed"),
    )


def test_preset_equals_explicit_options(resources, tmp_path):
    # test_pileup.rs:286 — preset traditional == --cpg --ignore h --combine-strands
    from modkit_tpu.collapse import CollapseMethod

    bam = os.path.join(resources, "bc_anchored_10_reads.sorted.bam")
    ref = os.path.join(resources, "CGI_ladder_3.6kb_ref.fa")
    a = str(tmp_path / "preset.bed")
    b = str(tmp_path / "options.bed")
    run_pileup(PileupConfig(
        in_bam=bam, out=a, no_filtering=True, preset="traditional",
        reference_fasta=ref,
    ))
    run_pileup(PileupConfig(
        in_bam=bam, out=b, no_filtering=True, cpg=True, combine_strands=True,
        collapse=[CollapseMethod("dist", ("h",))], reference_fasta=ref,
    ))
    with open(a) as fa, open(b) as fb:
        assert fa.read() == fb.read()


def test_pileup_multi_motif_cg0_cgcg2_second_bam(resources, tmp_path):
    # test_pileup.rs:738 (second run) + :779 test_pileup_motifs_cg0_cgcg2_combined
    bam2 = os.path.join(
        resources,
        "CG_5mC_20230207_1700_6A_PAG66026_3c0abf27_oligo_741_adapters_modcalls_0th_sort_10_reads-2.bam",
    )
    ref = os.path.join(resources, "CGI_ladder_3.6kb_ref.fa")
    _check(
        tmp_path, "cgcg2_b2", os.path.join(resources, "cgcg2_cg0_test2.bed"),
        in_bam=bam2, motifs=["CG", "0", "CGCG", "2"], mixed_delimiters=True,
        no_filtering=True, reference_fasta=ref,
        region="oligo_741_adapters:22-62",
    )
    _check(
        tmp_path, "cgcg2_b2c",
        os.path.join(resources, "cgcg2_cg0_test2_combine_strands.bed"),
        in_bam=bam2, motifs=["CG", "0", "CGCG", "2"], mixed_delimiters=True,
        no_filtering=True, combine_strands=True, reference_fasta=ref,
        region="oligo_741_adapters:22-62",
    )
