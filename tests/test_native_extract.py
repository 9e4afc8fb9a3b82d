"""Native streaming `extract full` vs the Python oracle.

The C++ span engine (native/modkit_native.cpp mk_extract_span) must emit
byte-identical TSV to engines/extract full_rows on every fixture BAM and
option combination, including spans small enough that records carry
across span boundaries.
"""

import ctypes
import glob
import os

import numpy as np
import pytest

from modkit_tpu import native
from modkit_tpu.errors import ModKitError
from modkit_tpu.io.bam import BamReader

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def python_rows(
    bam, ref=None, collapse=(), edge_filter=None, kmer_size=5,
    mapped_only=False, allow_non_primary=False,
):
    """The run_extract serial loop without the CLI (oracle path)."""
    from modkit_tpu.engines.extract import ReadProfile, full_rows

    reader = BamReader(bam)
    ref_seqs = None
    if ref is not None:
        from modkit_tpu.io.fasta import FastaReader

        fa = FastaReader(ref)
        ref_seqs = {
            n: fa.fetch(n)
            for n in fa.names()
            if n in reader.header.name_to_tid
        }
    out = []
    errors = {}
    n_reads = 0
    for rec in reader.records():
        if not allow_non_primary and rec.is_not_primary:
            continue
        if mapped_only and rec.is_unmapped:
            continue
        try:
            profile = ReadProfile(
                rec, reader.header, collapse, edge_filter, kmer_size
            )
        except ModKitError as e:
            errors[e.kind] = errors.get(e.kind, 0) + 1
            continue
        out += full_rows(profile, ref_seqs)
        n_reads += 1
    return "".join(out).encode(), n_reads, errors


def native_rows(
    bam, ref=None, collapse=(), edge_filter=None, kmer_size=5,
    mapped_only=False, allow_non_primary=False, span=8 << 20, threads=2,
):
    reader = BamReader(bam)
    names = [x.name for x in reader.header.refs]
    ref_seqs = None
    if ref is not None:
        from modkit_tpu.io.fasta import FastaReader

        fa = FastaReader(ref)
        ref_seqs = {
            n: fa.fetch(n)
            for n in fa.names()
            if n in reader.header.name_to_tid
        }
    parts = []
    n_reads = 0
    errors = {}
    for text, nr, errs in native.extract_full_stream(
        reader.bam_raw, names, ref_seqs=ref_seqs,
        collapse=list(collapse) or None, edge_filter=edge_filter,
        kmer_size=kmer_size, mapped_only=mapped_only,
        allow_non_primary=allow_non_primary, n_threads=threads,
        span_comp_bytes=span,
    ):
        parts.append(text)
        n_reads += nr
        for k, v in errs.items():
            errors[k] = errors.get(k, 0) + v
    return b"".join(parts), n_reads, errors


def test_native_extract_matches_python_all_fixtures(resources):
    checked = 0
    for bam in sorted(glob.glob(os.path.join(resources, "*.bam"))):
        base = os.path.basename(bam)
        nt, n_nt, e_nt = native_rows(bam)
        py, n_py, e_py = python_rows(bam)
        assert nt == py, f"native != python for {base}"
        assert n_nt == n_py and e_nt == e_py, base
        checked += 1
    assert checked > 5


def test_native_extract_with_ref_and_options(resources):
    from modkit_tpu.collapse import CollapseMethod
    from modkit_tpu.pileup.events import EdgeFilter

    bam = os.path.join(resources, "bc_anchored_10_reads.sorted.bam")
    ref = os.path.join(resources, "CGI_ladder_3.6kb_ref.fa")
    for opts in (
        dict(ref=ref),
        dict(collapse=[CollapseMethod("dist", ("h",))]),
        dict(collapse=[CollapseMethod("convert", ("h",), "m")]),
        dict(edge_filter=EdgeFilter(10, 10)),
        dict(edge_filter=EdgeFilter(5, 5, inverted=True)),
        dict(mapped_only=True),
        dict(allow_non_primary=True),
        dict(kmer_size=7),
        dict(kmer_size=4),
    ):
        nt, n_nt, e_nt = native_rows(bam, **opts)
        py, n_py, e_py = python_rows(bam, **opts)
        assert nt == py and n_nt == n_py and e_nt == e_py, opts


def test_native_extract_cli_equivalence(resources, tmp_path):
    """Through the CLI: the fast path output equals the checked golden
    comparison already done by test_extract.py; here just pin that the
    fast path actually engages and writes identical bytes to the
    in-process oracle."""
    from modkit_tpu.cli import main

    bam = os.path.join(resources, "bc_anchored_10_reads.sorted.bam")
    out = str(tmp_path / "cli.tsv")
    assert main(["extract", "full", bam, out, "--force"]) == 0
    body = open(out, "rb").read().split(b"\n", 1)[1]
    py, _, _ = python_rows(bam)
    assert body == py


def test_native_extract_span_carry(resources):
    """Tiny spans force record carry across span boundaries; the
    concatenated stream must equal the one-span output."""
    bam = os.path.join(resources, "bc_anchored_10_reads.sorted.bam")
    whole, n1, _ = native_rows(bam, span=1 << 30)
    tiny, n2, _ = native_rows(bam, span=256)  # below one BGZF block
    assert tiny == whole and n1 == n2 and len(whole) > 1000


def test_native_format_f32_matches_oracle():
    """The C++ shortest-roundtrip half-up formatter is the exact
    writers.format_float algorithm (Rust f32 Display/ryu ties)."""
    from modkit_tpu.writers import format_float

    lib = native.load()
    lib.mk_format_f32.restype = None
    lib.mk_format_f32.argtypes = [ctypes.c_float, ctypes.c_char_p]
    buf = ctypes.create_string_buffer(64)
    rng = np.random.default_rng(42)
    vals = list(((np.arange(256) + 0.5) / 256).astype(np.float32))
    vals += list(rng.random(2000).astype(np.float32))
    vals += [
        np.float32(0.0), np.float32(1.0), np.float32(0.251953125),
        np.float32(0.306640625), np.float32(1e-8), np.float32(123.456),
        np.float32(1e8),
    ]
    for v in vals:
        lib.mk_format_f32(ctypes.c_float(float(v)), buf)
        assert buf.value.decode() == format_float(v), float(v)


def python_calls_rows(
    bam, caller, ref=None, pass_only=False, kmer_size=5,
    mapped_only=False, allow_non_primary=False,
):
    from modkit_tpu.engines.extract import ReadProfile, calls_rows

    reader = BamReader(bam)
    ref_seqs = None
    if ref is not None:
        from modkit_tpu.io.fasta import FastaReader

        fa = FastaReader(ref)
        ref_seqs = {
            n: fa.fetch(n)
            for n in fa.names()
            if n in reader.header.name_to_tid
        }
    out = []
    for rec in reader.records():
        if not allow_non_primary and rec.is_not_primary:
            continue
        if mapped_only and rec.is_unmapped:
            continue
        try:
            profile = ReadProfile(rec, reader.header, (), None, kmer_size)
        except ModKitError:
            continue
        out += calls_rows(profile, caller, ref_seqs, pass_only)
    return "".join(out).encode()


def test_native_extract_calls_matches_python(resources):
    from modkit_tpu.caller import ThresholdCaller

    bam = os.path.join(resources, "bc_anchored_10_reads.sorted.bam")
    ref = os.path.join(resources, "CGI_ladder_3.6kb_ref.fa")
    for caller, opts in (
        (ThresholdCaller.passthrough(), {}),
        (ThresholdCaller({"C": 0.75}, {}, 0.0), {}),
        (ThresholdCaller({}, {"h": 0.9}, 0.5), {}),
        (ThresholdCaller({"C": 0.8, "A": 0.7}, {"m": 0.6}, 0.25),
         dict(pass_only=True)),
        (ThresholdCaller({}, {}, 0.8), dict(ref=ref)),
    ):
        reader = BamReader(bam)
        names = [x.name for x in reader.header.refs]
        ref_seqs = None
        if "ref" in opts:
            from modkit_tpu.io.fasta import FastaReader

            fa = FastaReader(opts["ref"])
            ref_seqs = {
                n: fa.fetch(n)
                for n in fa.names()
                if n in reader.header.name_to_tid
            }
        parts = []
        for text, nr, errs in native.extract_full_stream(
            reader.bam_raw, names, ref_seqs=ref_seqs, caller=caller,
            pass_only=opts.get("pass_only", False), n_threads=2,
        ):
            parts.append(text)
        nt = b"".join(parts)
        py = python_calls_rows(bam, caller, **opts)
        assert nt == py, (caller, opts)
        assert len(py) > 0


def test_native_extract_calls_implicit(resources):
    """Inferred positions call over the union with prob 0 (calls_rows
    implicit branch)."""
    from modkit_tpu.caller import ThresholdCaller

    bam = os.path.join(resources, "implicit_mod_tags.bam")
    caller = ThresholdCaller({}, {}, 0.3)
    reader = BamReader(bam)
    names = [x.name for x in reader.header.refs]
    parts = []
    for text, nr, errs in native.extract_full_stream(
        reader.bam_raw, names, caller=caller, n_threads=1
    ):
        parts.append(text)
    nt = b"".join(parts)
    py = python_calls_rows(bam, caller)
    assert nt == py and len(py) > 0
