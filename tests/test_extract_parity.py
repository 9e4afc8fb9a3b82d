"""Ports of the reference extract integration scenarios
(tests/test_extract.rs): include/exclude site masks (BED6 + BED3), duplex
outputs, and the duplex include-sites regression golden."""

import os

from modkit_tpu.cli import main

BAM = "bc_anchored_10_reads.sorted.bam"


def _profile_rows(path):
    lines = open(path).read().splitlines()
    hdr = lines[0].split("\t")
    return hdr, [ln.split("\t") for ln in lines[1:]]


def _parse_bed(path):
    sites = {}
    for line in open(path):
        f = line.split()
        if len(f) < 3:
            continue
        strand = f[5] if len(f) >= 6 else "."
        for pos in range(int(f[1]), int(f[2])):
            sites.setdefault(f[0], set()).add((pos, strand))
    return sites


def test_extract_include_sites(resources, tmp_path):
    """test_extract.rs:193 — every emitted (ref_pos, ref_mod_strand) sits
    in the include BED."""
    bed = os.path.join(resources, "CGI_ladder_3.6kb_ref_CG.bed")
    out = str(tmp_path / "incl.tsv")
    assert main([
        "extract", "full", os.path.join(resources, BAM), out,
        "-i", "25", "--include-bed", bed, "--force",
    ]) == 0
    sites = _parse_bed(bed)
    hdr, rows = _profile_rows(out)
    assert rows
    pos_c, chrom_c, strand_c = (
        hdr.index("ref_position"), hdr.index("chrom"),
        hdr.index("ref_mod_strand"),
    )
    for r in rows:
        key = (int(r[pos_c]), r[strand_c])
        assert key in sites[r[chrom_c]], key


def test_extract_include_sites_bed3(resources, tmp_path):
    """test_extract.rs:221 — BED3 (strandless) masks apply to both
    strands."""
    bed = os.path.join(resources, "CGI_ladder_3.6kb_ref_CG_bed3.bed")
    out = str(tmp_path / "incl3.tsv")
    assert main([
        "extract", "full", os.path.join(resources, BAM), out,
        "-i", "25", "--include-bed", bed, "--force",
    ]) == 0
    positions = {
        chrom: {p for p, _ in sites}
        for chrom, sites in _parse_bed(bed).items()
    }
    hdr, rows = _profile_rows(out)
    assert rows
    pos_c, chrom_c = hdr.index("ref_position"), hdr.index("chrom")
    for r in rows:
        assert int(r[pos_c]) in positions[r[chrom_c]]


def test_extract_exclude_sites(resources, tmp_path):
    """test_extract.rs:282 — -v removes masked (pos, strand) sites."""
    bed = os.path.join(resources, "CGI_ladder_3.6kb_ref_CG_exclude.bed")
    out = str(tmp_path / "excl.tsv")
    assert main([
        "extract", "full", os.path.join(resources, BAM), out,
        "-i", "25", "-v", bed, "--force",
    ]) == 0
    sites = _parse_bed(bed)
    hdr, rows = _profile_rows(out)
    assert rows
    pos_c, chrom_c, strand_c = (
        hdr.index("ref_position"), hdr.index("chrom"),
        hdr.index("ref_mod_strand"),
    )
    for r in rows:
        key = (int(r[pos_c]), r[strand_c])
        assert key not in sites.get(r[chrom_c], set()), key


def test_extract_duplex_correct_output(resources, tmp_path):
    """test_extract.rs:148 — duplex BAM extract matches the golden as a
    multiset of rows (sorted vs unsorted inputs agree)."""
    a = str(tmp_path / "dup_sorted.tsv")
    assert main([
        "extract", "full",
        os.path.join(resources, "duplex_modbam.sorted.bam"), a,
        "--region", "chr17", "--force",
    ]) == 0
    golden_rows = sorted(
        open(os.path.join(resources, "duplex_sorted.tsv"))
        .read().splitlines()[1:]
    )
    got_rows = sorted(open(a).read().splitlines()[1:])
    assert got_rows == golden_rows


def test_extract_include_sites_duplex_regression(resources, tmp_path):
    """test_extract.rs:252 — duplex extract restricted to a CG0 BED
    matches the checked-in expected TSV (multiset)."""
    out = str(tmp_path / "dup_incl.tsv")
    assert main([
        "extract", "full",
        os.path.join(resources, "duplex_modbam.sorted.bam"), out,
        "--include-bed", os.path.join(resources, "hg38_chr17_CG0_snip.bed"),
        "--force",
    ]) == 0
    golden = sorted(
        open(
            os.path.join(
                resources,
                "test_extract_include_sites_duplex_regression_expected.tsv",
            )
        ).read().splitlines()[1:]
    )
    got = sorted(open(out).read().splitlines()[1:])
    assert got == golden


def test_extract_cpg_motif(resources, tmp_path):
    """test_extract.rs:450 — --cpg restricts rows to reference CpG focus
    positions, stranded."""
    out = str(tmp_path / "cpg.tsv")
    assert main([
        "extract", "full",
        os.path.join(resources, "2_reads_all_context.bam"), out,
        "--cpg", "--reference",
        os.path.join(resources, "CGI_ladder_3.6kb_ref.fa"),
        "--force",
    ]) == 0
    sites = _parse_bed(os.path.join(resources, "CGI_ladder_3.6kb_ref_CG.bed"))
    hdr, rows = _profile_rows(out)
    assert rows
    pos_c, chrom_c, strand_c = (
        hdr.index("ref_position"), hdr.index("chrom"),
        hdr.index("ref_mod_strand"),
    )
    for r in rows:
        assert (int(r[pos_c]), r[strand_c]) in sites[r[chrom_c]]


def test_extract_implicit_mod_calls(resources, tmp_path):
    """test_extract.rs:435 — implicit-mode tags emit inferred rows
    matching the checked-in golden (multiset)."""
    out = str(tmp_path / "implicit.tsv")
    assert main([
        "extract", "full",
        os.path.join(resources, "implicit_mod_tags.bam"), out, "--force",
    ]) == 0
    golden = sorted(
        open(os.path.join(resources, "extract_with_implicit.tsv"))
        .read().splitlines()[1:]
    )
    got = sorted(open(out).read().splitlines()[1:])
    assert got == golden


def test_extract_region_correct_output(resources, tmp_path):
    """test_extract.rs:556 — a region fetch decodes whole overlapping
    reads, so a window covered by all reads reproduces the full ignore-h
    profile (multiset)."""
    out = str(tmp_path / "region.tsv")
    assert main([
        "extract", "full", os.path.join(resources, BAM), out,
        "--ignore", "h", "-i", "10",
        "--region", "oligo_1512_adapters:55-95", "--force",
    ]) == 0
    golden = sorted(
        open(
            os.path.join(
                resources,
                "bc_anchored_10_reads.sorted.methylprofile_ignoreh.tsv",
            )
        ).read().splitlines()[1:]
    )
    got = sorted(open(out).read().splitlines()[1:])
    assert got == golden


def test_extract_unmapped_bam_correct_output(resources, tmp_path):
    """test_extract.rs:349 — extracting the unmapped twin of the anchored
    reads yields the same per-read forward positions."""
    mapped = str(tmp_path / "mapped.tsv")
    unmapped = str(tmp_path / "unmapped.tsv")
    assert main([
        "extract", "full",
        os.path.join(resources, "bc_anchored_10_reads.unmapped.bam"),
        unmapped, "-i", "25", "--force",
    ]) == 0
    assert main([
        "extract", "full", os.path.join(resources, BAM), mapped,
        "-i", "25", "--force",
    ]) == 0

    def qpos_by_read(path):
        hdr, rows = _profile_rows(path)
        rc, qc = hdr.index("read_id"), hdr.index("forward_read_position")
        out = {}
        for r in rows:
            out.setdefault(r[rc], []).append(int(r[qc]))
        return {k: sorted(v) for k, v in out.items()}

    a, b = qpos_by_read(mapped), qpos_by_read(unmapped)
    assert a and a == b
