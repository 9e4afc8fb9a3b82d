"""--partition-tag pileup: per-key output files (writers.rs:1005
PartitioningBedMethylWriter, pileup/mod.rs:607 PartitionKey).

Mirrors the reference integration tests (tests/test_pileup.rs:501
test_pileup_partition_tags_partitioned, :547 ..._bedgraph, :692
..._combine_strands): the haplotyped fixture carries each of the 10
anchored reads once per (RG in {A,B,C}) x (HP in {1,2}) combination, so
partitioning on RG and HP must produce 6 files, each byte-identical to the
unpartitioned control run on the plain 10-read BAM.
"""

import os

import pytest

from modkit_tpu.pileup.runner import PileupConfig, run_pileup

BAM = "bc_anchored_10_reads.sorted.bam"
HAP_BAM = "bc_anchored_10_reads.haplotyped.sorted.bam"
REF_FA = "CGI_ladder_3.6kb_ref.fa"


def test_partition_tags_partitioned(resources, tmp_path):
    control = str(tmp_path / "control.bed")
    run_pileup(
        PileupConfig(
            in_bam=os.path.join(resources, BAM),
            out=control,
            no_filtering=True,
        )
    )
    out_dir = str(tmp_path / "partitioned")
    run_pileup(
        PileupConfig(
            in_bam=os.path.join(resources, HAP_BAM),
            out=out_dir,
            no_filtering=True,
            partition_tags=["RG", "HP"],
        )
    )
    files = sorted(os.listdir(out_dir))
    assert len(files) == 6
    assert files == sorted(
        f"{rg}_{hp}.bed" for rg in "ABC" for hp in (1, 2)
    )
    expected = open(control).read()
    for f in files:
        assert open(os.path.join(out_dir, f)).read() == expected, f


def test_partition_tags_bedgraph(resources, tmp_path):
    control_dir = str(tmp_path / "control_bg")
    run_pileup(
        PileupConfig(
            in_bam=os.path.join(resources, BAM),
            out=control_dir,
            no_filtering=True,
            bedgraph=True,
        )
    )
    out_dir = str(tmp_path / "partitioned_bg")
    run_pileup(
        PileupConfig(
            in_bam=os.path.join(resources, HAP_BAM),
            out=out_dir,
            no_filtering=True,
            bedgraph=True,
            partition_tags=["RG", "HP"],
        )
    )
    controls = {
        f: open(os.path.join(control_dir, f)).read()
        for f in os.listdir(control_dir)
    }
    outs = sorted(os.listdir(out_dir))
    # 6 partition keys x each control (mod code, strand) file
    assert len(outs) == 6 * len(controls)
    for f in outs:
        base = "_".join(f.split("_")[2:])  # strip the "RG_HP" key prefix
        assert open(os.path.join(out_dir, f)).read() == controls[base], f


def test_partition_tags_combine_strands(resources, tmp_path):
    control = str(tmp_path / "control_cs.bed")
    run_pileup(
        PileupConfig(
            in_bam=os.path.join(resources, BAM),
            out=control,
            no_filtering=True,
            combine_strands=True,
            cpg=True,
            reference_fasta=os.path.join(resources, REF_FA),
        )
    )
    out_dir = str(tmp_path / "partitioned_cs")
    run_pileup(
        PileupConfig(
            in_bam=os.path.join(resources, HAP_BAM),
            out=out_dir,
            no_filtering=True,
            combine_strands=True,
            cpg=True,
            reference_fasta=os.path.join(resources, REF_FA),
            partition_tags=["RG", "HP"],
        )
    )
    files = sorted(os.listdir(out_dir))
    assert len(files) == 6
    expected = open(control).read()
    for f in files:
        assert open(os.path.join(out_dir, f)).read() == expected, f


def test_partition_tag_missing_tag_goes_ungrouped(resources, tmp_path):
    # the plain BAM has no XX tag on any read: everything lands in the
    # NoKey partition -> a single ungrouped.bed equal to the control
    control = str(tmp_path / "control_u.bed")
    run_pileup(
        PileupConfig(
            in_bam=os.path.join(resources, BAM), out=control,
            no_filtering=True,
        )
    )
    out_dir = str(tmp_path / "ungrouped_out")
    run_pileup(
        PileupConfig(
            in_bam=os.path.join(resources, BAM),
            out=out_dir,
            no_filtering=True,
            partition_tags=["XX"],
        )
    )
    assert os.listdir(out_dir) == ["ungrouped.bed"]
    assert (
        open(os.path.join(out_dir, "ungrouped.bed")).read()
        == open(control).read()
    )


def test_partition_tag_validation(resources, tmp_path):
    with pytest.raises(ValueError):
        run_pileup(
            PileupConfig(
                in_bam=os.path.join(resources, BAM),
                out=str(tmp_path / "x"),
                no_filtering=True,
                partition_tags=["TOOLONG"],
            )
        )
