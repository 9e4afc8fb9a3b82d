"""Streaming stdin/stdout + --output-sam on the rewriters (VERDICT r2 #4;
reference command_utils.rs:212-240 get_serial_reader/get_bam_writer,
--output-sam at commands.rs:240,1236,1541)."""

import os
import subprocess
import sys

from modkit_tpu.io.bam import BamReader, record_to_sam


def _cli(argv, stdin_bytes=None):
    return subprocess.run(
        [sys.executable, "-m", "modkit_tpu", *argv],
        input=stdin_bytes,
        capture_output=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=300,
    )


def _bam_essence(path_or_bytes, tmp_path=None):
    """(header text with @PG CL: stripped, record raw buffers) — the @PG
    CL: field legitimately differs between the file-path and piped
    invocations of the same command."""
    if isinstance(path_or_bytes, bytes):
        p = str(tmp_path / "tmp_essence.bam")
        with open(p, "wb") as fh:
            fh.write(path_or_bytes)
    else:
        p = path_or_bytes
    reader = BamReader(p)
    hdr = "\n".join(
        "\t".join(f for f in ln.split("\t") if not f.startswith("CL:"))
        for ln in reader.header.text.splitlines()
    )
    return hdr, [rec.raw() for rec in reader.records()]


def test_adjust_mods_piped_stdin_stdout(resources, tmp_path):
    """`adjust-mods - -` piped must byte-match the file-path run."""
    bam = os.path.join(resources, "bc_anchored_10_reads.sorted.bam")
    out_file = str(tmp_path / "file.bam")
    p = _cli(["adjust-mods", bam, out_file, "--ignore", "h"])
    assert p.returncode == 0, p.stderr.decode()
    piped = _cli(
        ["adjust-mods", "-", "-", "--ignore", "h"],
        stdin_bytes=open(bam, "rb").read(),
    )
    assert piped.returncode == 0, piped.stderr.decode()
    assert _bam_essence(piped.stdout, tmp_path) == _bam_essence(out_file)


def test_adjust_mods_output_sam(resources, tmp_path):
    bam = os.path.join(resources, "bc_anchored_10_reads.sorted.bam")
    out_bam = str(tmp_path / "adj.bam")
    out_sam = str(tmp_path / "adj.sam")
    assert _cli(["adjust-mods", bam, out_bam, "--ignore", "h"]).returncode == 0
    assert _cli(
        ["adjust-mods", bam, out_sam, "--ignore", "h", "--output-sam"]
    ).returncode == 0
    def strip_cl(text):
        return "\n".join(
            "\t".join(f for f in ln.split("\t") if not f.startswith("CL:"))
            for ln in text.splitlines()
        )

    sam_text = open(out_sam).read()
    reader = BamReader(out_bam)
    expected = reader.header.text
    if not expected.endswith("\n"):
        expected += "\n"
    for rec in reader.records():
        expected += record_to_sam(rec, reader.header)
    assert strip_cl(sam_text) == strip_cl(expected)
    # structural sanity on the SAM itself
    body = [ln for ln in sam_text.splitlines() if not ln.startswith("@")]
    assert len(body) == 10
    first = body[0].split("\t")
    assert first[3].isdigit() and int(first[3]) >= 1  # 1-based POS
    assert any(f.startswith("MM:Z:") for f in first)
    assert any(f.startswith("ML:B:C,") for f in first)


def test_call_mods_stdin_requires_thresholds(resources):
    bam = os.path.join(resources, "bc_anchored_10_reads.sorted.bam")
    p = _cli(
        ["call-mods", "-", "-"], stdin_bytes=open(bam, "rb").read()
    )
    assert p.returncode != 0
    assert b"--filter-threshold" in p.stderr


def test_call_mods_piped_with_fixed_threshold(resources, tmp_path):
    bam = os.path.join(resources, "bc_anchored_10_reads.sorted.bam")
    out_file = str(tmp_path / "called.bam")
    args = ["--filter-threshold", "0.8"]
    assert _cli(["call-mods", bam, out_file, *args]).returncode == 0
    piped = _cli(
        ["call-mods", "-", "-", *args], stdin_bytes=open(bam, "rb").read()
    )
    assert piped.returncode == 0, piped.stderr.decode()
    assert _bam_essence(piped.stdout, tmp_path) == _bam_essence(out_file)


def test_update_tags_output_sam_stdout(resources):
    bam = os.path.join(resources, "bc_anchored_10_reads.sorted.bam")
    p = _cli(["update-tags", bam, "-", "--mode", "ambiguous", "--output-sam"])
    assert p.returncode == 0, p.stderr.decode()
    text = p.stdout.decode()
    assert text.startswith("@")
    body = [ln for ln in text.splitlines() if not ln.startswith("@")]
    assert len(body) == 10
    assert all("MM:Z:" in ln for ln in body)
    # ambiguous mode rewrites the MM flag to '?'
    assert all("?" in ln.split("MM:Z:")[1].split("\t")[0] for ln in body)
