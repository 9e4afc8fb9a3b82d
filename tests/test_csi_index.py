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
