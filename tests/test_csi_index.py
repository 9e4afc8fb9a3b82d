"""CSI (.csi) index support: generalized binning + per-bin loffset,
interchangeable with BAI in every indexed path (the reference gets this
via htslib, command_utils.rs:212)."""

import os
import shutil

from modkit_tpu.io.bam import BamReader, build_csi
from modkit_tpu.pileup.runner import PileupConfig, run_pileup


def _csi_only_copy(resources, tmp_path, name):
    bam = str(tmp_path / name)
    shutil.copy(os.path.join(resources, name), bam)
    build_csi(bam)  # only a .csi next to it, no .bai
    return bam


def test_csi_fetch_matches_bai(resources, tmp_path):
    name = "bc_anchored_10_reads.sorted.bam"
    csi_bam = _csi_only_copy(resources, tmp_path, name)
    bai_reader = BamReader(os.path.join(resources, name))
    csi_reader = BamReader(csi_bam)
    assert type(csi_reader.index).__name__ == "CsiIndex"
    for tid in range(len(bai_reader.header.refs)):
        end = bai_reader.header.refs[tid].length
        for s, e in ((0, end), (10, 60), (100, end)):
            a = [(r.name, r.pos) for r in bai_reader.fetch(tid, s, e)]
            b = [(r.name, r.pos) for r in csi_reader.fetch(tid, s, e)]
            assert a == b, (tid, s, e)
    # idxstats parity (drives the sampling schedule)
    assert bai_reader.idxstats() == csi_reader.idxstats()
    assert bai_reader.n_no_coor() == csi_reader.n_no_coor()


def test_pileup_via_csi_matches_golden(resources, tmp_path):
    csi_bam = _csi_only_copy(
        resources, tmp_path, "bc_anchored_10_reads.sorted.bam"
    )
    out = str(tmp_path / "csi.bed")
    run_pileup(
        PileupConfig(
            in_bam=csi_bam, out=out, interval_size=25, no_filtering=True
        )
    )
    golden = open(
        os.path.join(resources, "modbam.modpileup_nofilt.methyl.bed")
    ).read()
    assert open(out).read() == golden


def test_csi_large_contig_roundtrip(tmp_path):
    """CSI exists for contigs beyond BAI's 512 Mb limit; exercise the
    generalized binning on deep/offset coordinates via a synthetic BAM."""
    from modkit_tpu.utils.synth import make_synthetic_modbam

    bam = str(tmp_path / "synth.bam")
    make_synthetic_modbam(bam, n_reads=300, read_len=1000, coverage=5.0)
    os.remove(bam + ".bai")
    build_csi(bam, min_shift=14, depth=6)
    reader = BamReader(bam)
    assert type(reader.index).__name__ == "CsiIndex"
    got = [(r.name, r.pos) for r in reader.fetch(0, 5_000, 20_000)]
    assert got
    serial = [
        (r.name, r.pos)
        for r in reader.records()
        if not r.is_unmapped and r.pos < 20_000 and r.pos + 1000 > 5_000
    ]
    assert got == serial


def test_csi_loffset_covers_window_spanning_reads(resources, tmp_path):
    """Regression: a read spanning a leaf-window boundary is assigned to a
    PARENT bin; the leaf bin's loffset must still be <= that read's
    voffset or query() clamps away its chunk and fetches silently drop
    overlapping reads. Exercised with min_shift=6 (64 bp windows) so the
    fixture's reads straddle many windows; every windowed sub-fetch must
    match the BAI reader exactly."""
    name = "bc_anchored_10_reads.sorted.bam"
    bam = str(tmp_path / name)
    shutil.copy(os.path.join(resources, name), bam)
    build_csi(bam, min_shift=6, depth=5)
    bai_reader = BamReader(os.path.join(resources, name))
    csi_reader = BamReader(bam)
    assert type(csi_reader.index).__name__ == "CsiIndex"
    for tid in range(len(bai_reader.header.refs)):
        end = bai_reader.header.refs[tid].length
        for s in range(0, end, 64):
            e = min(s + 64, end)
            a = [(r.name, r.pos) for r in bai_reader.fetch(tid, s, e)]
            b = [(r.name, r.pos) for r in csi_reader.fetch(tid, s, e)]
            assert a == b, (tid, s, e)


def test_csi_loffset_window_spanning_read_repro(tmp_path):
    """Direct repro: long read A (spans leaf windows, assigned to a parent
    bin, earliest voffset) + short read B (leaf bin, later voffset). A
    fetch starting in B's window must still return A — the old builder
    set the leaf bin's loffset from B only, so query() clamped away A's
    chunk entirely."""
    import numpy as np

    from modkit_tpu.io.bam import BamHeader, BamWriter, Reference
    from modkit_tpu.utils.synth import _encode_record

    path = str(tmp_path / "repro.bam")
    header = BamHeader(
        "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:c1\tLN:100000\n",
        [Reference("c1", 100000)],
    )
    w = BamWriter(path, header)
    w.write_raw(
        _encode_record(b"readA", 0, 0, np.full(200, 65, np.uint8), "", np.zeros(0))
    )
    w.write_raw(
        _encode_record(b"readB", 0, 100, np.full(10, 65, np.uint8), "", np.zeros(0))
    )
    w.close()
    build_csi(path, min_shift=6, depth=5)
    got = [r.name for r in BamReader(path).fetch(0, 100, 110)]
    assert got == ["readA", "readB"], got
