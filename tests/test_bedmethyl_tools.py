"""stats / localize / bedmethyl merge / bedmethyl tobigwig."""

import zlib

import numpy as np
import pytest

from tests.test_dmr import A_BM, RES, _read_bgz


def _write_sizes(tmp_path):
    fp = tmp_path / "sizes.tsv"
    fp.write_text("chr20\t64444167\n")
    return str(fp)


def test_bedmethyl_merge_doubles_counts(tmp_path):
    """test_bedmethyl_util.rs:19-78 -- merging a file with itself doubles
    every counter and keeps row order."""
    from modkit_tpu.cli import main

    out = tmp_path / "merged.bed"
    rc = main(
        [
            "bedmethyl", "merge", A_BM, A_BM,
            "-g", _write_sizes(tmp_path),
            "-o", str(out),
            "--force",
        ]
    )
    assert rc == 0
    in_rows = [l.split("\t") for l in _read_bgz(A_BM)]
    out_rows = [
        l.split("\t") for l in out.read_text().rstrip("\n").split("\n")
    ]
    assert len(in_rows) == len(out_rows)
    for x, y in zip(in_rows, out_rows):
        assert x[0] == y[0] and x[1] == y[1] and x[5] == y[5]
        assert x[3].split(",")[0] == y[3]
        xs = x[9].split()
        ys = y[9:] if len(y) > 10 else y[9].split()
        assert int(ys[0]) == 2 * int(xs[0])  # valid cov
        for i in range(2, 9):
            assert int(ys[i]) == 2 * int(xs[i]), (x, y)


def test_stats(tmp_path):
    from modkit_tpu.cli import main

    regions = tmp_path / "regions.bed"
    regions.write_text(
        "chr20\t9838623\t9839213\tr1\n" "chr20\t10034962\t10035266\tr2\n"
    )
    out = tmp_path / "stats.tsv"
    rc = main(
        [
            "stats", A_BM,
            "--regions", str(regions),
            "-o", str(out),
            "--force",
        ]
    )
    assert rc == 0
    lines = out.read_text().rstrip("\n").split("\n")
    header = lines[0].split("\t")
    assert header[:5] == ["chrom", "start", "end", "name", "strand"]
    # fixture contains only code C
    assert header[5:] == ["count_C", "count_valid_C", "percent_C"]
    # oracle for region 1
    n_mod = n_valid = 0
    for l in _read_bgz(A_BM):
        f = l.split("\t")
        if 9838623 <= int(f[1]) < 9839213:
            rest = f[9].split()
            if int(rest[0]) >= 1:
                n_mod += int(rest[2])
                n_valid += int(rest[0])
    r1 = lines[1].split("\t")
    assert r1[:5] == ["chr20", "9838623", "9839213", "r1", "."]
    assert int(r1[5]) == n_mod
    assert int(r1[6]) == n_valid
    expect_pct = float(
        np.float32(n_mod) / np.float32(n_valid) * np.float32(100.0)
    )
    assert float(r1[7]) == pytest.approx(expect_pct, rel=1e-6)


def test_localize(tmp_path):
    from modkit_tpu.cli import main

    regions = tmp_path / "feat.bed"
    # single feature centered at 9838900
    regions.write_text("chr20\t9838900\t9838900\tctcf\n")
    out = tmp_path / "loc.tsv"
    rc = main(
        [
            "localize", A_BM,
            "--regions", str(regions),
            "-r", _write_sizes(tmp_path),
            "-w", "300",
            "-o", str(out),
            "-f",
        ]
    )
    assert rc == 0
    lines = out.read_text().rstrip("\n").split("\n")
    assert lines[0].split("\t") == [
        "mod_code", "offset", "n_valid", "n_mod", "percent_modified",
    ]
    rows = [l.split("\t") for l in lines[1:]]
    assert rows, "expected offset rows"
    # offsets are anchor - position, within +-window+1
    offs = [int(r[1]) for r in rows]
    assert all(-301 <= o <= 301 for o in offs)
    assert offs == sorted(offs)
    # oracle: the anchor is the midpoint of the EXPANDED region
    # [mp-301, mp+300), i.e. mp-1 (localise/util.rs:196-199 + midpoint)
    lo, hi = 9838900 - 301, 9838900 + 300
    anchor = (lo + hi) // 2
    oracle = {}
    for l in _read_bgz(A_BM):
        f = l.split("\t")
        pos = int(f[1])
        if lo <= pos < hi:
            rest = f[9].split()
            off = anchor - pos
            cur = oracle.get(off, (0, 0))
            oracle[off] = (cur[0] + int(rest[2]), cur[1] + int(rest[0]))
    assert len(rows) == len(oracle)
    for r in rows:
        off = int(r[1])
        assert (int(r[3]), int(r[2])) == oracle[off]


def test_tobigwig_roundtrip(tmp_path):
    from modkit_tpu.cli import main
    from modkit_tpu.io.bigwig import BigWigReader

    # write an uncompressed text bedMethyl subset
    plain = tmp_path / "in.bed"
    rows = [l for l in _read_bgz(A_BM)[:5000]]
    plain.write_text("\n".join(rows) + "\n")
    out = tmp_path / "out.bw"
    rc = main(
        [
            "bedmethyl", "tobigwig", str(plain), str(out),
            "-g", _write_sizes(tmp_path),
            "-m", "C",
        ]
    )
    assert rc == 0
    bw = BigWigReader(str(out))
    assert "chr20" in bw.chroms
    got = bw.intervals()
    # oracle with stream semantics: single code C, so no combining; same
    # position opposite strand keeps higher coverage
    expected = []
    prev = None
    for l in rows:
        f = l.split("\t")
        rest = f[9].split()
        rec = (f[0], int(f[1]), int(f[2]), f[5], int(rest[2]), int(rest[0]))
        if prev and rec[:3] == prev[:3]:
            if rec[5] > prev[5]:
                prev = rec
            continue
        if prev:
            expected.append(prev)
        prev = rec
    if prev:
        expected.append(prev)
    assert len(got) == len(expected)
    for (chrom, s, e, v), exp in zip(got, expected):
        assert (chrom, s, e) == exp[:3]
        pct = float(
            np.float32(exp[4]) / np.float32(exp[5]) * np.float32(100.0)
        )
        assert v == pytest.approx(pct, abs=1e-4)
    # summary sanity
    n_bases = sum(e - s for (_, s, e, _) in got)
    assert bw.valid_count == n_bases
    assert bw.min_val == pytest.approx(min(v for *_, v in got), abs=1e-4)
    assert bw.max_val == pytest.approx(max(v for *_, v in got), abs=1e-4)
    assert len(bw.zooms) > 0
    bw.close()


def test_tobigwig_combines_codes(tmp_path):
    """h+m at the same position/strand combine into one value."""
    from modkit_tpu.engines.bedmethyl_tools import iter_bedmethyl_values

    lines = [
        "c1\t10\t11\th\t20\t+\t10\t11\t255,0,0\t20 25.00 5 10 5 0 0 0 0",
        "c1\t10\t11\tm\t20\t+\t10\t11\t255,0,0\t20 50.00 10 10 0 0 0 0 0",
        "c1\t15\t16\tm\t10\t-\t15\t16\t255,0,0\t10 100.00 10 0 0 0 0 0 0",
    ]
    vals = list(iter_bedmethyl_values(lines, {"h", "m"}, False))
    assert vals == [
        ("c1", 10, 11, pytest.approx(75.0)),
        ("c1", 15, 16, pytest.approx(100.0)),
    ]
    # negative strand values
    vals = list(iter_bedmethyl_values(lines, {"h", "m"}, True))
    assert vals[1][3] == pytest.approx(-100.0)
