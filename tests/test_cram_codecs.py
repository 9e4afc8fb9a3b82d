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


def test_multiref_native_byte_equals_python(tmp_path, monkeypatch):
    p, fa, _seqs, _reads = _multiref_fixture(tmp_path, synth.GZIP)
    got_native = _snapshot(CramReader(str(p), str(fa)))

    import modkit_tpu.native as native

    monkeypatch.setattr(native, "available", lambda: False)
    got_py = _snapshot(CramReader(str(p), str(fa)))
    assert got_native == got_py
