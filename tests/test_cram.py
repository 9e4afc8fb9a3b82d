"""From-scratch CRAM 3.0 reader (io/cram.py): record-level parity against
the same reads in BAM form, and pileup/extract byte-parity against the
reference goldens when fed the .cram fixtures (the reference reads CRAM
via htslib, command_utils.rs:212)."""

import os

import numpy as np
import pytest

from modkit_tpu.io.bam import BamReader
from modkit_tpu.io.cram import CramReader, open_alignment_reader
from modkit_tpu.pileup.runner import PileupConfig, run_pileup

CRAM = "bc_anchored_10_reads.sorted.cram"
BAM = "bc_anchored_10_reads.sorted.bam"
REF = "CGI_ladder_3.6kb_ref.fa"


def test_cram_records_match_bam(resources):
    cr = CramReader(
        os.path.join(resources, CRAM), os.path.join(resources, REF)
    )
    br = BamReader(os.path.join(resources, BAM))
    crecs = list(cr.records())
    brecs = list(br.records())
    assert len(crecs) == len(brecs) == 10
    for c, b in zip(crecs, brecs):
        assert c.name == b.name
        assert c.flag == b.flag
        assert c.ref_id == b.ref_id
        assert c.pos == b.pos
        assert np.array_equal(c.cigar, b.cigar)
        assert np.array_equal(c.seq_bytes(), b.seq_bytes())
        assert np.array_equal(c.quals(), b.quals())
        assert c.get_aux("MM") == b.get_aux("MM")
        assert np.array_equal(c.get_aux("ML")[1], b.get_aux("ML")[1])
        # regenerated tags
        assert c.get_aux("NM") == b.get_aux("NM")
        assert c.get_aux("MD") == b.get_aux("MD")
        assert c.get_aux("RG") == b.get_aux("RG")


def test_cram_unmapped_records(resources):
    cr = CramReader(
        os.path.join(resources, "bc_anchored_10_reads_unmapped.cram"),
        os.path.join(resources, REF),
    )
    br = BamReader(
        os.path.join(resources, "bc_anchored_10_reads.unmapped.bam")
    )
    by_name = {b.name: b for b in br.records()}
    crecs = list(cr.records())
    assert len(crecs) == 10
    for c in crecs:
        b = by_name[c.name]
        assert c.flag == b.flag and c.is_unmapped
        assert np.array_equal(c.seq_bytes(), b.seq_bytes())
        assert np.array_equal(c.quals(), b.quals())
        assert c.get_aux("MM") == b.get_aux("MM")


def test_pileup_from_cram_matches_golden(resources, tmp_path):
    out = str(tmp_path / "cram.bed")
    run_pileup(
        PileupConfig(
            in_bam=os.path.join(resources, CRAM),
            out=out,
            no_filtering=True,
            reference_fasta=os.path.join(resources, REF),
        )
    )
    golden = open(
        os.path.join(resources, "modbam.modpileup_nofilt.methyl.bed")
    ).read()
    assert open(out).read() == golden


def test_pileup_from_cram_estimated_thresholds(resources, tmp_path):
    out = str(tmp_path / "cram_filt.bed")
    run_pileup(
        PileupConfig(
            in_bam=os.path.join(resources, CRAM),
            out=out,
            sample_frac=1.0,
            filter_percentile=0.25,
            include_unmapped=True,
            reference_fasta=os.path.join(resources, REF),
        )
    )
    golden = open(
        os.path.join(resources, "modbam.modpileup_filt025.methyl.bed")
    ).read()
    assert open(out).read() == golden


def test_extract_from_cram_matches_bam(resources, tmp_path):
    from modkit_tpu.engines.extract import run_extract

    ref = os.path.join(resources, REF)
    a = str(tmp_path / "from_cram.tsv")
    b = str(tmp_path / "from_bam.tsv")
    run_extract(os.path.join(resources, CRAM), a, reference_fasta=ref)
    run_extract(os.path.join(resources, BAM), b, reference_fasta=ref)
    assert sorted(open(a).read().splitlines()) == sorted(
        open(b).read().splitlines()
    )


def test_open_alignment_reader_dispatch(resources):
    r1 = open_alignment_reader(os.path.join(resources, BAM))
    r2 = open_alignment_reader(
        os.path.join(resources, CRAM), os.path.join(resources, REF)
    )
    assert isinstance(r1, BamReader)
    assert isinstance(r2, CramReader)


def test_cram_requires_reference_error(resources, tmp_path, monkeypatch):
    monkeypatch.delenv("MODKIT_REF_PATH", raising=False)
    cr = CramReader(os.path.join(resources, CRAM))
    with pytest.raises(ValueError, match="reference"):
        list(cr.records())


def test_huffman_canonical_order_by_symbol_value():
    """CRAM canonical Huffman assigns codes by (length, symbol VALUE);
    an encoder may list the alphabet unsorted. alphabet=[5,3] lengths=[1,1]
    must give 3 -> code 0 and 5 -> code 1, regardless of list order."""
    from modkit_tpu.io.cram import BitReader, HuffmanReader

    # bits: 0 then 1 -> symbols 3 then 5
    core = BitReader(bytes([0b01000000]))
    hr = HuffmanReader([5, 3], [1, 1], core)
    assert hr.read_int() == 3
    assert hr.read_int() == 5


def test_build_crai_matches_samtools_fixture(resources):
    """Our container-walk indexer reproduces the shipped samtools-built
    .crai entries exactly (htslib cram_index format)."""
    from modkit_tpu.io.cram import build_crai, read_crai

    for name in (
        "bc_anchored_10_reads.sorted.cram",
        "bc_anchored_10_reads_unmapped.sorted.cram",
        "bc_anchored_10_reads_unmapped.cram",
    ):
        path = os.path.join(resources, name)
        assert build_crai(path) == read_crai(path + ".crai"), name


def test_crai_indexed_fetch(resources):
    """Indexed region fetch returns the same records as the full scan and
    touches only covered containers."""
    from modkit_tpu.io.cram import CramReader

    path = os.path.join(resources, CRAM)
    ref = os.path.join(resources, REF)
    r_idx = CramReader(path, ref)
    assert r_idx._crai is not None
    r_full = CramReader(path, ref)
    r_full._crai = None  # force the scan path
    got = [rec.raw() for rec in r_idx.fetch(0, 100, 400)]
    want = [rec.raw() for rec in r_full.fetch(0, 100, 400)]
    assert got == want and len(got) > 0
    # only containers overlapping the query decoded
    covered = {
        e[3]
        for e in r_idx._crai
        if e[0] == 0 and e[1] - 1 < 400 and e[1] - 1 + e[2] > 100
    }
    assert set(r_idx._container_cache) == covered
    assert r_idx._records is None  # no full decode happened


def test_crai_write_roundtrip(resources, tmp_path):
    from modkit_tpu.io.cram import build_crai, read_crai, write_crai

    path = os.path.join(resources, CRAM)
    entries = build_crai(path)
    out = str(tmp_path / "x.crai")
    write_crai(entries, out)
    assert read_crai(out) == entries


def test_native_cram_decode_byte_equal(resources):
    """The native container decoder (mk_cram_decode_container) reproduces
    the Python SliceDecoder byte-for-byte on every fixture CRAM,
    including unmapped containers and rANS/gzip/raw block codecs."""
    from modkit_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    ref = os.path.join(resources, REF)
    for name in (
        "bc_anchored_10_reads.sorted.cram",
        "bc_anchored_10_reads_unmapped.sorted.cram",
        "bc_anchored_10_reads_unmapped.cram",
    ):
        path = os.path.join(resources, name)
        r_nat = CramReader(path, ref)
        nat = [rec.raw() for rec in r_nat._decode_all()]
        r_py = CramReader(path, ref)
        import modkit_tpu.native as _n

        orig = _n.cram_decode_container
        _n.cram_decode_container = lambda *a, **k: None
        try:
            py = [rec.raw() for rec in r_py._decode_all()]
        finally:
            _n.cram_decode_container = orig
        assert len(nat) == len(py), name
        assert nat == py, name
        assert len(nat) > 0
