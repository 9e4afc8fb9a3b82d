"""@PG header records in rewritten BAMs (util.rs:607 add_modkit_pg_records)
and extract --bgzf parallel-compressed output (extract/subcommand.rs:270)."""

import gzip
import os
import sys

from modkit_tpu.engines.extract import run_extract
from modkit_tpu.io.bam import BamReader

BAM = "bc_anchored_10_reads.sorted.bam"


def _adjust(in_bam, out_bam):
    from modkit_tpu.collapse import CollapseMethod
    from modkit_tpu.engines.adjust import adjust_modbam

    adjust_modbam(
        in_bam, out_bam,
        collapse_methods=[CollapseMethod("dist", ("h",))],
    )


def test_pg_records_chain(resources, tmp_path, monkeypatch):
    monkeypatch.setattr(
        sys, "argv", ["modkit", "adjust-mods", "in.bam", "out.bam"]
    )
    first = str(tmp_path / "first.bam")
    _adjust(os.path.join(resources, BAM), first)
    text = BamReader(first).header.text
    pg = [ln for ln in text.splitlines() if ln.startswith("@PG")]
    ours = [ln for ln in pg if "PN:modkit" in ln]
    assert len(ours) == 1
    fields = dict(
        f.split(":", 1) for f in ours[0].split("\t")[1:] if ":" in f
    )
    assert fields["ID"] == "modkit"
    assert fields["CL"].startswith("modkit adjust-mods")
    assert "VN" in fields and "PP" not in fields

    # second invocation chains: ID modkit.1, PP modkit
    second = str(tmp_path / "second.bam")
    _adjust(first, second)
    text2 = BamReader(second).header.text
    ours2 = [
        ln for ln in text2.splitlines()
        if ln.startswith("@PG") and "PN:modkit" in ln
    ]
    assert len(ours2) == 2
    fields2 = dict(
        f.split(":", 1) for f in ours2[-1].split("\t")[1:] if ":" in f
    )
    assert fields2["ID"] == "modkit.1"
    assert fields2["PP"] == "modkit"


def test_extract_bgzf_output_roundtrip(resources, tmp_path):
    bam = os.path.join(resources, BAM)
    plain = str(tmp_path / "plain.tsv")
    packed = str(tmp_path / "packed.tsv.gz")
    run_extract(bam, plain)
    run_extract(bam, packed, bgzf=True, threads=3)
    with gzip.open(packed, "rt") as fh:
        assert fh.read() == open(plain).read()
    # bgzf magic: gzip with the BC extra subfield
    head = open(packed, "rb").read(18)
    assert head[:2] == b"\x1f\x8b" and head[12:14] == b"BC"
