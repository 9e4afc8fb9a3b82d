"""Native CRAM breadth added in round 5: bzip2/lzma block codecs and
multi-reference containers (per-record RI with a lazy ref callback),
byte-equal between the native decoder and the Python SliceDecoder."""

import os

import numpy as np
import pytest

import tests.cram_synth as synth
from modkit_tpu.io.bam import BamReader
from modkit_tpu.io.cram import CramReader

RES = "/root/reference/tests/resources"
BAM = f"{RES}/bc_anchored_10_reads.sorted.bam"
CRAM = f"{RES}/bc_anchored_10_reads.sorted.cram"
REF = f"{RES}/CGI_ladder_3.6kb_ref.fa"


def _snapshot(reader):
    out = []
    for rec in reader.records():
        out.append((rec.name, rec.flag, rec.ref_id, rec.pos, bytes(rec.raw())))
    return out


@pytest.fixture(autouse=True)
def _ref_env(monkeypatch):
    monkeypatch.setenv("MODKIT_REF_PATH", REF)


@pytest.mark.parametrize("method", [synth.BZIP2, synth.LZMA],
                         ids=["bzip2", "lzma"])
def test_transcoded_codec_matches_original(tmp_path, method, monkeypatch):
    """Fixture recompressed block-by-block with bzip2/lzma decodes to the
    same records, through BOTH the native decoder and the Python path."""
    data = open(CRAM, "rb").read()
    t = synth.transcode_cram(data, method)
    p = tmp_path / "t.cram"
    p.write_bytes(t)
    want = _snapshot(CramReader(CRAM))
    assert want

    got_native = _snapshot(CramReader(str(p)))
    assert got_native == want

    # force the Python block codecs / SliceDecoder
    import modkit_tpu.native as native

    monkeypatch.setattr(native, "available", lambda: False)
    got_py = _snapshot(CramReader(str(p)))
    assert got_py == want


def _multiref_fixture(tmp_path, method):
    fa = tmp_path / "two.fa"
    import random

    random.seed(3)
    seqs = {
        "chrA": "".join(random.choice("ACGT") for _ in range(300)),
        "chrB": "".join(random.choice("ACGT") for _ in range(200)),
    }
    with open(fa, "w") as fh:
        for n, s in seqs.items():
            fh.write(f">{n}\n{s}\n")
    header = (
        "@HD\tVN:1.6\tSO:coordinate\n"
        f"@SQ\tSN:chrA\tLN:300\n@SQ\tSN:chrB\tLN:200\n"
    )
    reads = [
        ("readA1", 0, 0, 10, 50, bytes([30] * 50)),
        ("readA2", 16, 0, 40, 60, bytes([20] * 60)),
        ("readB1", 0, 1, 5, 40, bytes([25] * 40)),
        ("readA3", 0, 0, 100, 30, bytes([10] * 30)),
        ("readB2", 16, 1, 80, 45, bytes([15] * 45)),
    ]
    blob = synth.build_multiref_cram(header, reads, method=method)
    p = tmp_path / "multi.cram"
    p.write_bytes(blob)
    return p, fa, seqs, reads


@pytest.mark.parametrize("method", [synth.RAW, synth.GZIP, synth.BZIP2],
                         ids=["raw", "gzip", "bzip2"])
def test_multiref_container_native_and_python(tmp_path, method, monkeypatch):
    p, fa, seqs, reads = _multiref_fixture(tmp_path, method)
    names = ["chrA", "chrB"]

    def check(reader):
        recs = list(reader.records())
        assert len(recs) == len(reads)
        for rec, (name, flag, rid, pos0, length, q) in zip(recs, reads):
            assert rec.name == name
            assert rec.flag == flag
            assert rec.ref_id == rid
            assert rec.pos == pos0
            # FN=0 records reconstruct their sequence from the reference
            want_seq = seqs[names[rid]][pos0 : pos0 + length]
            got_seq = "".join(chr(c) for c in rec.seq_bytes().tolist())
            assert got_seq == want_seq
            assert bytes(rec.quals().tolist()) == q

    check(CramReader(str(p), str(fa)))

    import modkit_tpu.native as native

    monkeypatch.setattr(native, "available", lambda: False)
    check(CramReader(str(p), str(fa)))


def test_multiref_rr0_decodes_without_reference(tmp_path, monkeypatch):
    """RR=0 (no-ref) multi-reference CRAM decodes with no reference at
    all — sequences come from stored 'b' features (round-5 review fix:
    the per-record ref switch must honor reference_required)."""
    import random

    monkeypatch.delenv("MODKIT_REF_PATH", raising=False)
    random.seed(5)
    seqs = {
        "chrA": "".join(random.choice("ACGT") for _ in range(200)),
        "chrB": "".join(random.choice("ACGT") for _ in range(150)),
    }
    header = (
        "@HD\tVN:1.6\tSO:coordinate\n"
        "@SQ\tSN:chrA\tLN:200\n@SQ\tSN:chrB\tLN:150\n"
    )
    reads = [
        ("r1", 0, 0, 5, 40, bytes([30] * 40)),
        ("r2", 0, 1, 10, 30, bytes([20] * 30)),
        ("r3", 0, 0, 60, 25, bytes([25] * 25)),
    ]
    blob = synth.build_multiref_cram(
        header, reads, method=synth.GZIP, ref_required=False, seqs=seqs
    )
    p = tmp_path / "rr0.cram"
    p.write_bytes(blob)
    names = ["chrA", "chrB"]

    def check(reader):
        recs = list(reader.records())
        assert len(recs) == len(reads)
        for rec, (name, flag, rid, pos0, length, _q) in zip(recs, reads):
            assert (rec.name, rec.ref_id, rec.pos) == (name, rid, pos0)
            got_seq = "".join(chr(c) for c in rec.seq_bytes().tolist())
            assert got_seq == seqs[names[rid]][pos0 : pos0 + length]

    check(CramReader(str(p)))  # native path, NO reference anywhere

    import modkit_tpu.native as native

    monkeypatch.setattr(native, "available", lambda: False)
    check(CramReader(str(p)))  # python path


def test_single_ref_slice_in_multiref_container(tmp_path):
    """A -2 container holding a single-ref slice (spec-gray, produced by
    some writers) resolves the slice reference through the callback
    instead of silently decoding against 'N's (round-5 review fix)."""
    import random

    random.seed(6)
    seqs = {"chrA": "".join(random.choice("ACGT") for _ in range(200))}
    fa = tmp_path / "one.fa"
    fa.write_text(f">chrA\n{seqs['chrA']}\n")
    header = "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chrA\tLN:200\n"
    reads = [
        ("r1", 0, 0, 5, 40, bytes([30] * 40)),
        ("r2", 0, 0, 60, 30, bytes([20] * 30)),
    ]
    blob = synth.build_multiref_cram(
        header, reads, method=synth.GZIP, slice_ref=0
    )
    p = tmp_path / "gray.cram"
    p.write_bytes(blob)
    recs = list(CramReader(str(p), str(fa)).records())
    assert len(recs) == 2
    for rec, (name, _f, rid, pos0, length, _q) in zip(recs, reads):
        got_seq = "".join(chr(c) for c in rec.seq_bytes().tolist())
        assert got_seq == seqs["chrA"][pos0 : pos0 + length]
        assert "N" not in got_seq


def test_multiref_native_byte_equals_python(tmp_path, monkeypatch):
    p, fa, _seqs, _reads = _multiref_fixture(tmp_path, synth.GZIP)
    got_native = _snapshot(CramReader(str(p), str(fa)))

    import modkit_tpu.native as native

    monkeypatch.setattr(native, "available", lambda: False)
    got_py = _snapshot(CramReader(str(p), str(fa)))
    assert got_native == got_py
