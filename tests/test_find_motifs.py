"""Motif discovery: unit tests ported from find_motifs/mod.rs plus an
end-to-end planted-motif search."""

import numpy as np
import pytest

RES = "/root/reference/tests/resources"


def _ms(mod_code, pairs):
    from modkit_tpu.engines.find_motifs import MultiSequence

    return MultiSequence.from_dict(mod_code, dict(pairs))


def _motif(pairs, base="C", code="m"):
    from modkit_tpu.engines.find_motifs import EnrichedMotif

    return EnrichedMotif(base, _ms(code, pairs))


def test_multi_sequence_from_kmers():
    """mod.rs test_multi_sequence / test_create_motifs_from_fixed_length."""
    from modkit_tpu.engines.find_motifs import MultiSequence

    kmers = [b"AACGA", b"CACGC", b"GACGG", b"AACGT"]
    ms = MultiSequence.from_kmers(kmers, (2, 2), "m")
    assert str(ms) == "VA[m]G"
    kmers = [b"ACCGG", b"CCCGG", b"TCCGG", b"GCCGG"]
    ms = MultiSequence.from_kmers(kmers, (2, 2), 21839)
    assert str(ms) == "C[21839]GG"
    kmers = [b"AACAT", b"CACAT", b"GCCAT", b"TCCAT"]
    ms = MultiSequence.from_kmers(kmers, (2, 2), 21839)
    assert str(ms) == "M[21839]AT"


def test_is_superset_subset():
    """mod.rs test_is_superset / test_is_subset."""
    from modkit_tpu.engines.find_motifs import parse_iupac as P

    x = _ms("m", [(1, P("S")), (2, P("G")), (3, P("W"))])
    y = _ms("m", [(1, P("G")), (2, P("G")), (3, P("W"))])
    assert x.is_superset(y)
    y2 = _ms("m", [(1, P("G")), (2, P("G")), (3, P("G"))])
    assert not x.is_superset(y2)
    b = _ms("m", [(1, P("B")), (2, P("D"))])
    s = _ms("m", [(1, P("S")), (2, P("W"))])
    assert b.is_superset(s)
    assert not s.is_superset(b)

    x = _motif(
        [(-4, P("R")), (-2, P("G")), (-1, P("A")), (1, P("A")), (2, P("Y"))],
        code=21839,
    )
    assert str(x) == "RNGA[21839]AY"
    assert x.is_subset(x)
    y = _motif(
        [(-2, P("G")), (-1, P("A")), (1, P("A")), (2, P("C"))], code=21839
    )
    assert str(y) == "GA[21839]AC"
    assert y.is_subset(x)


def test_merge_motifs():
    """mod.rs test_merge_motif."""
    from modkit_tpu.engines.find_motifs import merge_motifs
    from modkit_tpu.engines.find_motifs import parse_iupac as P

    w = _motif([(1, P("A")), (2, P("G")), (3, P("T"))])
    x = _motif([(1, P("S")), (2, P("G")), (3, P("W"))])
    y = _motif([(1, P("G")), (2, P("G")), (3, P("A"))])
    z = _motif([(1, P("C")), (2, P("G")), (3, P("T"))])
    merged = merge_motifs([x, y, z, w])
    reprs = {str(m) for m in merged}
    assert reprs == {"[m]AGT", "[m]SGW"}


def test_to_bits_and_compare():
    """mod.rs test_known_motifs."""
    from modkit_tpu.engines.find_motifs import parse_iupac as P

    w = _motif([(-1, P("G")), (1, P("W")), (2, P("S")), (3, P("C"))])
    bits = w.multi_sequence.to_bits((3, 3))
    expected = np.array(
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 1, 0, 0, 1, 0, 1, 1, 0, 0, 1,
         0, 0],
        dtype=bool,
    )
    assert (bits == expected).all()
    t = _motif([(-1, P("G")), (1, P("A")), (2, P("C")), (3, P("C"))])
    assert w.compare(t, (3, 3))[0] == 2  # Superset
    b = _motif([(-1, P("A")), (1, P("W")), (2, P("S")), (3, P("C"))])
    assert w.compare(b, (3, 3)) == (3, 2)  # Disjoint, edit distance 2


def test_intersect_quirk():
    from modkit_tpu.engines.find_motifs import (
        HOLE,
        N_MASK,
        iupac_intersect,
        parse_iupac as P,
    )

    # fixed base intersect non-equal (even N) -> Hole (iupac.rs:118-133)
    assert iupac_intersect(P("A"), P("R")) == HOLE
    assert iupac_intersect(P("A"), N_MASK) == HOLE
    assert iupac_intersect(P("A"), P("A")) == P("A")
    # degenerate set intersections
    assert iupac_intersect(P("B"), P("D")) == P("K")
    assert iupac_intersect(P("H"), P("V")) == P("M")
    assert iupac_intersect(P("R"), P("Y")) == HOLE
    assert iupac_intersect(N_MASK, P("A")) == N_MASK


@pytest.fixture(scope="module")
def planted(tmp_path_factory):
    """Random genome with GATC positions highly modified (6mA-style on C
    for simplicity: plant C[m]CWGG-like signal at CCWGG)."""
    rng = np.random.default_rng(7)
    n = 60_000
    seq = rng.choice(list("ACGT"), size=n)
    s = "".join(seq)
    d = tmp_path_factory.mktemp("motifs")
    fa = d / "genome.fa"
    with open(fa, "w") as fh:
        fh.write(">ctg\n")
        for i in range(0, n, 80):
            fh.write(s[i : i + 80] + "\n")
    # bedMethyl: every C on + strand; CCWGG offset-1 C's high, others low
    import re

    bm = d / "pileup.bed"
    high_positions = set()
    for m in re.finditer("(?=CC[AT]GG)", s):
        high_positions.add(m.start() + 1)
    with open(bm, "w") as fh:
        for m in re.finditer("C", s):
            pos = m.start()
            if pos in high_positions:
                n_mod, valid = 29, 30
            else:
                n_mod, valid = 1, 30
            can = valid - n_mod
            fh.write(
                f"ctg\t{pos}\t{pos + 1}\tm\t{valid}\t+\t{pos}\t{pos + 1}\t"
                f"255,0,0\t{valid} {100.0 * n_mod / valid:.2f} {n_mod} "
                f"{can} 0 0 0 0 0\n"
            )
    return str(fa), str(bm)


def test_motif_search_finds_planted(tmp_path, planted):
    fa, bm = planted
    from modkit_tpu.cli import main

    out = tmp_path / "motifs.tsv"
    rc = main(
        [
            "motif", "search",
            "-i", bm,
            "-r", fa,
            "-o", str(out),
            "--context-size", "6", "6",
            "--min-sites", "10",
            "--skip-search",
        ]
    )
    assert rc == 0
    lines = out.read_text().rstrip("\n").split("\n")
    assert lines[0].split("\t") == [
        "mod_code", "motif", "offset", "frac_mod",
        "high_count", "low_count", "mid_count",
    ]
    rows = [l.split("\t") for l in lines[1:]]
    assert rows, "should find at least one motif"
    top = rows[0]
    assert top[0] == "m"
    # the planted motif CCWGG with offset 1
    assert top[1] == "CCWGG"
    assert top[2] == "1"
    assert float(top[3]) > 0.9


def test_motif_evaluate(tmp_path, planted):
    fa, bm = planted
    from modkit_tpu.cli import main

    out = tmp_path / "eval.tsv"
    rc = main(
        [
            "motif", "evaluate",
            "-i", bm,
            "-r", fa,
            "--known-motif", "CCWGG", "1", "m",
            "--known-motif", "GATC", "3", "m",
            "--context-size", "6", "6",
            "--out", str(out),
        ]
    )
    assert rc == 0
    lines = out.read_text().rstrip("\n").split("\n")
    rows = {r.split("\t")[1]: r.split("\t") for r in lines[1:]}
    assert set(rows) == {"CCWGG", "GATC"}
    assert float(rows["CCWGG"][3]) > 0.9
    assert float(rows["GATC"][3]) < 0.2


def test_motif_bed(tmp_path, capsys):
    from modkit_tpu.cli import main

    rc = main(
        ["motif", "bed", f"{RES}/CGI_ladder_3.6kb_ref.fa", "CG", "0"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    rows = [l.split("\t") for l in out.rstrip("\n").split("\n")]
    # oracle: regex scan
    import re

    from modkit_tpu.io.fasta import FastaReader

    fa = FastaReader(f"{RES}/CGI_ladder_3.6kb_ref.fa")
    expected = []
    for name in fa.names():
        s = fa.fetch(name).tobytes().decode().upper()
        for m in re.finditer("(?=CG)", s):
            expected.append((name, m.start(), "+"))
            expected.append((name, m.start() + 1, "-"))
    assert len(rows) == len(expected)
    for r, (name, pos, strand) in zip(rows, expected):
        assert r[0] == name and int(r[1]) == pos and r[5] == strand
