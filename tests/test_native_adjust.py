"""Byte-equality of the native adjust/call-mods/update-tags rewrite engine
(native mk_adjust_span) against the Python oracle path
(engines.adjust.adjust_record_tags), across the transform surface:
collapse/convert, threshold calling, edge filters, motif keep/discard, and
tag-mode changes. Reference: src/adjust.rs:115 adjust_mod_probs +
src/mod_bam.rs:1299 format_mm_ml_tag."""

import os

import pytest

from modkit_tpu import native
from modkit_tpu.caller import ThresholdCaller
from modkit_tpu.collapse import CollapseMethod
from modkit_tpu.engines.adjust import (
    SequenceMotifs, _adjust_modbam_native, adjust_record_tags,
)
from modkit_tpu.errors import ErrorTally, ModKitError
from modkit_tpu.io.bam import BamReader, BamWriter, add_modkit_pg_records
from modkit_tpu.motifs import Motif

BAM = "bc_anchored_10_reads.sorted.bam"

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _python_adjust(in_bam, out_bam, **kw):
    """The oracle loop of adjust_modbam (serial Python path)."""
    reader = BamReader(in_bam)
    errors = ErrorTally()
    hdr = add_modkit_pg_records(reader.header)
    n = 0
    motifs = kw.pop("motifs", None)
    seq_motifs = SequenceMotifs(motifs) if motifs else None
    with BamWriter(out_bam, hdr) as writer:
        for rec in reader.records():
            try:
                raw = adjust_record_tags(
                    rec,
                    kw.get("collapse_methods", ()),
                    kw.get("caller"),
                    kw.get("edge_filter"),
                    kw.get("filter_only", False),
                    seq_motifs,
                    kw.get("discard_motifs", False),
                    kw.get("new_mode"),
                    kw.get("drop_implicit", False),
                    kw.get("force_mm_style"),
                )
                writer.write_raw(raw)
                n += 1
            except ModKitError as e:
                errors.add(e)
    return dict(records_written=n, errors=dict(errors))


def _records(path):
    r = BamReader(path)
    return [rec.raw() for rec in r.records()]


def _compare(src, tmp_path, tag, **kw):
    py_out = str(tmp_path / f"{tag}_py.bam")
    nat_out = str(tmp_path / f"{tag}_nat.bam")
    py_stats = _python_adjust(src, py_out, **kw)
    nat_stats = _adjust_modbam_native(
        src, nat_out,
        kw.get("collapse_methods", ()),
        kw.get("caller"),
        kw.get("edge_filter"),
        kw.get("filter_only", False),
        kw.get("motifs"),
        kw.get("discard_motifs", False),
        kw.get("new_mode"),
        kw.get("drop_implicit", False),
        kw.get("force_mm_style"),
    )
    assert nat_stats["records_written"] == py_stats["records_written"]
    assert nat_stats["errors"] == py_stats["errors"]
    py_recs = _records(py_out)
    nat_recs = _records(nat_out)
    assert len(py_recs) == len(nat_recs)
    for i, (a, b) in enumerate(zip(py_recs, nat_recs)):
        assert a == b, f"{tag}: record {i} differs"
    # headers match too (same PG chain)
    assert BamReader(py_out).header.text == BamReader(nat_out).header.text


def test_native_adjust_passthrough(resources, tmp_path):
    _compare(os.path.join(resources, BAM), tmp_path, "pass")


def test_native_adjust_convert(resources, tmp_path):
    _compare(
        os.path.join(resources, BAM), tmp_path, "conv",
        collapse_methods=[CollapseMethod("convert", ("h",), "m")],
    )


def test_native_adjust_ignore_dist(resources, tmp_path):
    _compare(
        os.path.join(resources, BAM), tmp_path, "dist",
        collapse_methods=[CollapseMethod("dist", ("h",))],
    )


def test_native_adjust_ignore_norm(resources, tmp_path):
    _compare(
        os.path.join(resources, BAM), tmp_path, "norm",
        collapse_methods=[CollapseMethod("norm", ("m",))],
    )


def test_native_adjust_edge_filter(resources, tmp_path):
    from modkit_tpu.pileup.events import EdgeFilter

    _compare(
        os.path.join(resources, BAM), tmp_path, "edge",
        edge_filter=EdgeFilter(50, 50, False),
    )
    _compare(
        os.path.join(resources, BAM), tmp_path, "edgeinv",
        edge_filter=EdgeFilter(100, 10, True),
    )


def test_native_call_mods(resources, tmp_path):
    caller = ThresholdCaller({"C": 0.75, "A": 0.6}, {"h": 0.8}, 0.7)
    _compare(
        os.path.join(resources, BAM), tmp_path, "call",
        caller=caller, filter_only=False,
    )


def test_native_filter_only(resources, tmp_path):
    caller = ThresholdCaller({"C": 0.9}, {}, 0.85)
    _compare(
        os.path.join(resources, BAM), tmp_path, "filt",
        caller=caller, filter_only=True,
    )


def test_native_adjust_motifs(resources, tmp_path):
    _compare(
        os.path.join(resources, BAM), tmp_path, "motif",
        motifs=[Motif("CG", 0)],
    )
    _compare(
        os.path.join(resources, BAM), tmp_path, "motifd",
        motifs=[Motif("CHH", 0)], discard_motifs=True,
    )


def test_native_update_tags(resources, tmp_path):
    from modkit_tpu.modtags import EXPLICIT, IMPLICIT

    src = os.path.join(resources, BAM)
    _compare(
        src, tmp_path, "ambig",
        new_mode=EXPLICIT, force_mm_style="MM",
    )
    _compare(
        src, tmp_path, "implicit",
        new_mode=IMPLICIT, force_mm_style="MM",
    )
    _compare(
        src, tmp_path, "noimp",
        new_mode=EXPLICIT, drop_implicit=True, force_mm_style="MM",
    )


def test_native_adjust_synthetic_wgs(tmp_path):
    """Synthetic multi-read BAM through call-mods: exercises the span
    carry path with a larger record stream."""
    from modkit_tpu.utils.synth import make_synthetic_modbam

    bam = str(tmp_path / "s.bam")
    make_synthetic_modbam(
        bam, n_reads=300, read_len=2000, coverage=10, seed=3
    )
    caller = ThresholdCaller({"C": 0.7}, {}, 0.6)
    _compare(
        bam, tmp_path, "synth", caller=caller,
        collapse_methods=[CollapseMethod("convert", ("h",), "m")],
    )
