"""Ports of reference integration-test scenarios not covered elsewhere
(tests/test_pileup.rs, tests/test_extract.rs): region pileup, duplex
reads, old-style Mm/Ml tags, edge filters (symmetric/asymmetric/inverted),
ChEBI code equivalence, duplicate-read exclusion, header output, and the
estimated-threshold position-filter golden."""

import os

import pytest

from modkit_tpu.cli import main
from modkit_tpu.io.bam import build_bai

BAM = "bc_anchored_10_reads.sorted.bam"
REF = "CGI_ladder_3.6kb_ref.fa"


def _golden(resources, name):
    return open(os.path.join(resources, name)).read()


def test_pileup_with_region(resources, tmp_path):
    """test_pileup.rs:194 — --region start/end are 0-based half-open."""
    out = str(tmp_path / "region.bed")
    assert main([
        "pileup", os.path.join(resources, BAM), out,
        "-i", "25", "--no-filtering", "--mixed-delim",
        "--region", "oligo_1512_adapters:0-50",
    ]) == 0
    assert open(out).read() == _golden(
        resources, "modbam.modpileup_nofilt_oligo_1512_adapters_10_50.bed"
    )


def test_pileup_duplex_reads(resources, tmp_path):
    """test_pileup.rs:217 — duplex BAM pileup over chr17."""
    out = str(tmp_path / "duplex.bed")
    assert main([
        "pileup", os.path.join(resources, "duplex_modbam.sorted.bam"), out,
        "--mixed-delim", "--region", "chr17", "--no-filtering",
    ]) == 0
    assert open(out).read() == _golden(
        resources, "duplex_modbam_pileup_nofilt.bed"
    )


def test_pileup_old_tags(resources, tmp_path):
    """test_pileup.rs:168 — update old-style Mm/Ml tags to ambiguous mode
    without implicit probs, then pileup."""
    updated = str(tmp_path / "updated.bam")
    assert main([
        "update-tags", os.path.join(
            resources, "HG002_small.ch20._other.sorted.bam"
        ),
        updated, "--mode", "ambiguous", "--no-implicit-probs",
    ]) == 0
    build_bai(updated)
    out = str(tmp_path / "oldtags.bed")
    assert main(["pileup", updated, out, "--no-filtering"]) == 0
    assert open(out).read() == _golden(
        resources, "pileup-old-tags-regressiontest.methyl.bed"
    )


def test_pileup_edge_filter_regression(resources, tmp_path):
    """test_pileup.rs:370 — --edge-filter 50 golden, and adjust-mods
    --edge-filter then plain pileup gives the same rows."""
    out = str(tmp_path / "edge50.bed")
    assert main([
        "pileup", os.path.join(resources, BAM), out,
        "--no-filtering", "--mixed-delim", "--edge-filter", "50",
    ]) == 0
    golden = _golden(resources, "bc_anchored_10_reads_edge_filter50.bed")
    assert open(out).read() == golden

    adjusted = str(tmp_path / "edge50.bam")
    assert main([
        "adjust-mods", os.path.join(resources, BAM), adjusted,
        "--edge-filter", "50",
    ]) == 0
    build_bai(adjusted)
    out2 = str(tmp_path / "edge50_adjusted.bed")
    assert main([
        "pileup", adjusted, out2, "--no-filtering", "--mixed-delim",
    ]) == 0
    assert open(out2).read() == golden


def test_pileup_edge_filter_asymmetric_regression(resources, tmp_path):
    """test_pileup.rs:417 — 50,50 equals the symmetric golden; 50,0 has
    its own golden, also reachable through adjust-mods."""
    out = str(tmp_path / "edge5050.bed")
    assert main([
        "pileup", os.path.join(resources, BAM), out,
        "--no-filtering", "--mixed-delim", "--edge-filter", "50,50",
    ]) == 0
    assert open(out).read() == _golden(
        resources, "bc_anchored_10_reads_edge_filter50.bed"
    )

    out = str(tmp_path / "edge500.bed")
    assert main([
        "pileup", os.path.join(resources, BAM), out,
        "--no-filtering", "--mixed-delim", "--edge-filter", "50,0",
    ]) == 0
    golden = _golden(resources, "bc_anchored_10_reads_edge_filter50-0.bed")
    assert open(out).read() == golden

    adjusted = str(tmp_path / "edge500.bam")
    assert main([
        "adjust-mods", os.path.join(resources, BAM), adjusted,
        "--edge-filter", "50,0",
    ]) == 0
    build_bai(adjusted)
    out2 = str(tmp_path / "edge500_adjusted.bed")
    assert main([
        "pileup", adjusted, out2, "--no-filtering", "--mixed-delim",
    ]) == 0
    assert open(out2).read() == golden


def test_pileup_no_mod_calls(resources, tmp_path):
    """test_pileup.rs:143 — a BAM with empty MM/ML tags yields no rows."""
    out = str(tmp_path / "empty.bed")
    assert main([
        "pileup", os.path.join(resources, "empty-tags.sorted.bam"), out,
        "--no-filtering",
    ]) == 0
    assert open(out).read() == ""


def test_pileup_with_header(resources, tmp_path):
    """test_pileup.rs:900 — --with-header emits the 18-column header."""
    out = str(tmp_path / "hdr.bed")
    assert main([
        "pileup", os.path.join(resources, BAM), out,
        "-i", "25", "--no-filtering", "--with-header",
    ]) == 0
    assert open(out).read() == _golden(resources, "pileup_with_header.bed")


def test_pileup_with_filt_position_filter(resources, tmp_path):
    """test_pileup.rs:639 — estimated threshold at the 25th percentile
    restricted to --include-positions."""
    out = str(tmp_path / "incl.bed")
    assert main([
        "pileup", os.path.join(resources, BAM), out,
        "--mixed-delim", "-i", "25", "-p", "0.25",
        "--include-positions",
        os.path.join(resources, "CGI_ladder_3.6kb_ref_include_positions.bed"),
    ]) == 0
    assert open(out).read() == _golden(
        resources, "modbam.modpileup_filt_positions_025.methyl.bed"
    )


def _normalized_rows(text, code_map):
    rows = []
    for line in text.splitlines():
        f = line.split("\t")
        f[3] = code_map.get(f[3], f[3])
        rows.append("\t".join(f))
    return sorted(rows)


@pytest.mark.parametrize("to_code", ["76792", "c"])
def test_pileup_chebi_code_same_output(resources, tmp_path, to_code):
    """test_pileup.rs:822 — converting h to a ChEBI / another char code
    yields the same counts with only the name column changed."""
    adjusted = str(tmp_path / f"conv_{to_code}.bam")
    assert main([
        "adjust-mods", os.path.join(resources, BAM), adjusted,
        "--convert", "h", to_code,
    ]) == 0
    build_bai(adjusted)
    out = str(tmp_path / f"conv_{to_code}.bed")
    assert main([
        "pileup", adjusted, out, "-i", "25", "--no-filtering",
    ]) == 0
    got = _normalized_rows(open(out).read(), {to_code: "h"})
    want = _normalized_rows(
        _golden(resources, "modbam.modpileup_nofilt.methyl.bed"), {}
    )
    assert got == want


def test_pileup_duplicated_reads_ignored(resources, tmp_path):
    """test_pileup.rs:177 — duplicate-flagged reads are excluded, so the
    duplicated BAM pileups identically to the original."""
    a = str(tmp_path / "orig.bed")
    b = str(tmp_path / "dup.bed")
    assert main([
        "pileup", os.path.join(resources, BAM), a,
        "-i", "25", "--no-filtering",
    ]) == 0
    assert main([
        "pileup", os.path.join(resources, "duplicated.marked.fixed.bam"), b,
        "-i", "25", "--no-filtering",
    ]) == 0
    assert open(a).read() == open(b).read()


def test_extract_invert_edge_filter(resources, tmp_path):
    """test_extract.rs:325 — inverted edge filter keeps only positions
    outside [start_trim, len - end_trim)."""
    out = str(tmp_path / "invert.tsv")
    assert main([
        "extract", "full", os.path.join(resources, BAM), out,
        "--edge-filter", "50,45", "--invert-edge-filter", "--force",
    ]) == 0
    lines = open(out).read().splitlines()
    header = lines[0].split("\t")
    qpos_col = header.index("forward_read_position")
    assert len(lines) > 1
    for line in lines[1:]:
        q_pos = int(line.split("\t")[qpos_col])
        assert q_pos < 50 or q_pos >= 45
