"""build_tabix: the standalone `bgzip` + `tabix -p bed` equivalent the
reference's dmr/stats/localize workflows assume (dmr/subcommands.rs:33).
Query-equivalence is checked against the htslib-built .tbi fixtures."""

import os
import random
import shutil

RES = "/root/reference/tests/resources"
A = f"{RES}/lung_00733-m_adjacent-normal_5mc-5hmc_chr20_cpg_pileup.bed.gz"


def test_build_tabix_matches_htslib_queries(tmp_path):
    from modkit_tpu.io.tabix import TabixFile, build_tabix

    gz = tmp_path / "a.bed.gz"
    shutil.copy(A, gz)
    build_tabix(str(gz))
    ours = TabixFile(str(gz))
    theirs = TabixFile(A)
    random.seed(1)
    total = 0
    for _ in range(200):
        beg = random.randint(9_000_000, 11_000_000)
        end = beg + random.randint(10, 200_000)
        a = list(ours.fetch("chr20", beg, end))
        b = list(theirs.fetch("chr20", beg, end))
        assert a == b, (beg, end, len(a), len(b))
        total += len(a)
    assert total > 100_000


def test_bgzip_and_index_roundtrip_pileup_to_dmr(tmp_path):
    """pileup output -> bgzip_text -> build_tabix -> dmr pair runs without
    any external htslib tooling (the standalone-workflow gap)."""
    from modkit_tpu.cli import main
    from modkit_tpu.io.tabix import bgzip_text, build_tabix

    bam = f"{RES}/bc_anchored_10_reads.sorted.bam"
    bed = tmp_path / "p.bed"
    assert main(["pileup", bam, str(bed), "--no-filtering",
                 "--suppress-progress"]) in (0, None)
    for name in ("a", "b"):
        gz = tmp_path / f"{name}.bed.gz"
        bgzip_text(str(bed), str(gz))
        build_tabix(str(gz))
    # synthesize a reference FASTA with C/G at record positions
    import numpy as np

    rows = []
    maxp = 0
    for line in open(bed):
        f = line.split("\t")
        rows.append((int(f[1]), f[5]))
        maxp = max(maxp, int(f[1]))
    seq = np.full(maxp + 2, ord("A"), dtype=np.uint8)
    for pos, strand in rows:
        seq[pos] = ord("C") if strand != "-" else ord("G")
    fa = tmp_path / "ref.fa"
    with open(fa, "w") as fh:
        fh.write(">oligo_1512_adapters\n")
        fh.write(seq.tobytes().decode() + "\n")
    out = tmp_path / "dmr.bed"
    rc = main([
        "dmr", "pair", "-a", str(tmp_path / "a.bed.gz"),
        "-b", str(tmp_path / "b.bed.gz"), "-o", str(out),
        "--ref", str(fa), "--base", "C", "-f", "--suppress-progress",
    ])
    assert rc in (0, None)
    lines = [l for l in out.read_text().splitlines() if l.strip()]
    assert lines, "expected single-site dmr rows"
    # identical samples: counts and fractions agree; llk favors "same"
    for l in lines:
        f = l.split("\t")
        assert f[6] == f[8] and f[7] == f[9], l
        assert float(f[4]) <= 0.0, l
