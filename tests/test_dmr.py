"""DMR conformance tests vs the reference goldens.

Mirrors reference tests/test_dmr.rs test_dmr_regression. The fixture FASTA
(GRCh38_chr20.fa) is not shipped in the reference checkout, so we synthesize
an equivalent one: 'C' at every +strand bedMethyl record position, 'G' at
every -strand position, 'A' elsewhere. The DMR position filter only
intersects reference C/G positions with record positions, so this produces
identical output for these fixtures.

The score column is compared numerically at 1e-9 relative tolerance (the
reference's rv crate uses a different ln_gamma implementation whose last
~2 float64 digits differ); every other column must be byte-identical.
"""

import io
import os
import zlib

import pytest

RES = "/root/reference/tests/resources"
A_BM = f"{RES}/lung_00733-m_adjacent-normal_5mc-5hmc_chr20_cpg_pileup.bed.gz"
B_BM = f"{RES}/lung_00733-m_primary-tumour_5mc-5hmc_chr20_cpg_pileup.bed.gz"


def _read_bgz(path):
    raw = open(path, "rb").read()
    blob = bytearray()
    while raw:
        d = zlib.decompressobj(wbits=47)
        blob += d.decompress(raw)
        raw = d.unused_data
    return [l.decode() for l in bytes(blob).split(b"\n") if l]


@pytest.fixture(scope="module")
def synthetic_chr20_fa(tmp_path_factory):
    """chr20 FASTA with C/G exactly at the bedMethyl record positions."""
    import numpy as np

    max_pos = 0
    rows = []
    for path in (A_BM, B_BM):
        for line in _read_bgz(path):
            f = line.split("\t")
            rows.append((int(f[1]), f[5]))
            max_pos = max(max_pos, int(f[1]))
    seq = np.full(max_pos + 2, ord("A"), dtype=np.uint8)
    for pos, strand in rows:
        seq[pos] = ord("C") if strand != "-" else ord("G")
    fa = tmp_path_factory.mktemp("dmr") / "chr20_synth.fa"
    with open(fa, "w") as fh:
        fh.write(">chr20\n")
        s = seq.tobytes().decode()
        for i in range(0, len(s), 80):
            fh.write(s[i : i + 80] + "\n")
    return str(fa)


def _compare_dmr(out_text, golden_path):
    golden = open(golden_path).read()
    out_lines = out_text.rstrip("\n").split("\n")
    gold_lines = golden.rstrip("\n").split("\n")
    assert len(out_lines) == len(gold_lines)
    for ol, gl in zip(out_lines, gold_lines):
        of, gf = ol.split("\t"), gl.split("\t")
        assert len(of) == len(gf), (ol, gl)
        for i, (a, b) in enumerate(zip(of, gf)):
            if i == 4:  # score column: numeric tolerance
                assert abs(float(a) - float(b)) <= 1e-9 * max(
                    1.0, abs(float(b))
                ), (a, b)
            else:
                assert a == b, (i, ol, gl)


def test_dmr_pair_regression(tmp_path, synthetic_chr20_fa):
    from modkit_tpu.cli import main

    out = tmp_path / "dmr_out.bed"
    rc = main(
        [
            "dmr", "pair",
            "-a", A_BM,
            "-b", B_BM,
            "-o", str(out),
            "-r", f"{RES}/cpg_chr20_with_orig_names_selection.bed",
            "--ref", synthetic_chr20_fa,
            "-f",
            "--base", "C",
        ]
    )
    assert rc == 0
    _compare_dmr(out.read_text(), f"{RES}/test_output_chr20-2.bed")


def test_dmr_pair_explicit_index(tmp_path, synthetic_chr20_fa):
    """--index-a/--index-b point at relocated .tbi files so the index need
    not sit next to the bedMethyl (advanced_usage.md:2280-2285)."""
    import shutil

    from modkit_tpu.cli import main

    # bedMethyls without a sibling .tbi; indexes live elsewhere
    data = tmp_path / "data"
    idxd = tmp_path / "indexes"
    data.mkdir(); idxd.mkdir()
    a_bm = data / "a.bed.gz"
    b_bm = data / "b.bed.gz"
    shutil.copy(A_BM, a_bm)
    shutil.copy(B_BM, b_bm)
    a_idx = idxd / "a_index.tbi"
    b_idx = idxd / "b_index.tbi"
    shutil.copy(A_BM + ".tbi", a_idx)
    shutil.copy(B_BM + ".tbi", b_idx)

    out = tmp_path / "dmr_out.bed"
    rc = main(
        [
            "dmr", "pair",
            "-a", str(a_bm),
            "-b", str(b_bm),
            "--index-a", str(a_idx),
            "--index-b", str(b_idx),
            "-o", str(out),
            "-r", f"{RES}/cpg_chr20_with_orig_names_selection.bed",
            "--ref", synthetic_chr20_fa,
            "-f",
            "--base", "C",
        ]
    )
    assert rc == 0
    _compare_dmr(out.read_text(), f"{RES}/test_output_chr20-2.bed")

    # without the explicit index the same invocation must fail loudly
    import pytest as _pytest
    with _pytest.raises((SystemExit, FileNotFoundError)):
        main(
            [
                "dmr", "pair",
                "-a", str(a_bm), "-b", str(b_bm),
                "-o", str(tmp_path / "x.bed"),
                "-r", f"{RES}/cpg_chr20_with_orig_names_selection.bed",
                "--ref", synthetic_chr20_fa, "-f", "--base", "C",
            ]
        )


def test_dmr_multi(tmp_path, synthetic_chr20_fa):
    """dmr multi with two named samples produces one pairwise BED matching
    the pair output."""
    from modkit_tpu.cli import main

    out_dir = tmp_path / "multi"
    rc = main(
        [
            "dmr", "multi",
            "-s", A_BM, "normal",
            "-s", B_BM, "tumour",
            "-o", str(out_dir),
            "-r", f"{RES}/cpg_chr20_with_orig_names_selection.bed",
            "--ref", synthetic_chr20_fa,
            "-f",
            "--base", "C",
        ]
    )
    assert rc == 0
    produced = sorted(os.listdir(out_dir))
    assert produced == ["normal_tumour.bed"]
    _compare_dmr(
        (out_dir / "normal_tumour.bed").read_text(),
        f"{RES}/test_output_chr20-2.bed",
    )


def test_roi_bed_parsing():
    from modkit_tpu.engines.dmr import parse_roi_bed

    rois = parse_roi_bed(f"{RES}/sim_cpg_regions.bed")
    assert [(r.chrom, r.start, r.stop, r.name, r.strand) for r in rois] == [
        ("chr20", 10172120, 10172545, "r1", "."),
        ("chr20", 10217487, 10218336, "r2", "."),
        ("chr20", 10034963, 10035266, "r3", "."),
    ]
    rois = parse_roi_bed(f"{RES}/sim_cpg_regions_noname.bed")
    assert rois[0].name == "chr20:10172120-10172545"


def test_bedmethyl_line_parse():
    from modkit_tpu.bedmethyl import BedMethylLine

    for sep in ("\t", " "):
        line = (
            "chr20\t10034963\t10034964\tm,CG,0\t19\t-\t10034963\t10034964\t"
            f"255,0,0\t19{sep}94.74{sep}18{sep}1{sep}0{sep}0{sep}1{sep}0{sep}2"
        )
        bm = BedMethylLine.parse(line)
        assert (
            bm.chrom, bm.start, bm.stop, bm.raw_mod_code, bm.strand
        ) == ("chr20", 10034963, 10034964, "m", "-")
        assert (
            bm.count_methylated, bm.valid_coverage, bm.count_canonical,
            bm.count_other, bm.count_delete, bm.count_fail, bm.count_diff,
            bm.count_nocall,
        ) == (18, 19, 1, 0, 0, 1, 0, 2)
    chebi = BedMethylLine.parse(
        "oligo_1512_adapters\t9\t10\t76792\t4\t+\t9\t10\t255,0,0\t"
        "4 50.00 2 1 1 0 0 2 0"
    )
    assert chebi.raw_mod_code == 76792


def test_aggregate_counts_validation():
    from modkit_tpu.bedmethyl import BedMethylLine, aggregate_counts
    from modkit_tpu.modcodes import MOD_CODE_TO_DNA_BASE

    lines = []
    for line in open(f"{RES}/modbam.modpileup_nofilt.methyl.bed"):
        bm = BedMethylLine.parse(line)
        if bm.start == 72 and bm.strand == "+":
            lines.append(bm)
    counts = aggregate_counts(lines, MOD_CODE_TO_DNA_BASE)
    assert counts.string_counts() == "h:2,m:4"
    assert counts.total == 6
    # dropping the h record makes canonical+modified != valid -> error
    only_m = [l for l in lines if l.raw_mod_code == "m"]
    with pytest.raises(ValueError):
        aggregate_counts(only_m, MOD_CODE_TO_DNA_BASE)
