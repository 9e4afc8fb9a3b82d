"""Golden conformance for `extract full` / `extract calls`
(reference tests/test_extract.rs)."""

import collections
import os

from modkit_tpu.caller import ThresholdCaller
from modkit_tpu.collapse import CollapseMethod
from modkit_tpu.engines.extract import run_extract
from modkit_tpu.io.bam import BamReader
from modkit_tpu.thresholds import estimate_thresholds


def _load_by_read(fp):
    with open(fp) as fh:
        lines = fh.read().splitlines()
    by_read = collections.defaultdict(collections.Counter)
    for r in lines[1:]:
        by_read[r.split("\t")[0]][r] += 1
    return lines[0], by_read


def _same_profiles(got_fp, want_fp):
    # reference tests compare per-read row multisets (tests/test_extract.rs
    # check_mod_profiles_same)
    h1, got = _load_by_read(got_fp)
    h2, want = _load_by_read(want_fp)
    assert h1 == h2
    assert set(got) == set(want)
    for rid in want:
        assert got[rid] == want[rid], f"rows differ for {rid}"


def test_extract_full(resources, tmp_path):
    out = str(tmp_path / "full.tsv")
    run_extract(
        os.path.join(resources, "bc_anchored_10_reads.sorted.bam"), out,
        mode="full",
    )
    _same_profiles(
        out,
        os.path.join(resources, "bc_anchored_10_reads.sorted.methylprofile.tsv"),
    )


def test_extract_full_with_ref(resources, tmp_path):
    out = str(tmp_path / "ref.tsv")
    run_extract(
        os.path.join(resources, "bc_anchored_10_reads.sorted.bam"), out,
        mode="full",
        reference_fasta=os.path.join(resources, "CGI_ladder_3.6kb_ref.fa"),
    )
    _same_profiles(
        out,
        os.path.join(resources, "bc_anchored_10_reads.sorted.methylprofile_ref.tsv"),
    )


def test_extract_full_ignore_h(resources, tmp_path):
    out = str(tmp_path / "ig.tsv")
    run_extract(
        os.path.join(resources, "bc_anchored_10_reads.sorted.bam"), out,
        mode="full", collapse=[CollapseMethod("dist", ("h",))],
    )
    _same_profiles(
        out,
        os.path.join(resources, "bc_anchored_10_reads.sorted.methylprofile_ignoreh.tsv"),
    )


def test_extract_calls_estimated_thresholds(resources, tmp_path):
    # byte-equality regression (tests/test_extract.rs:499)
    bam = os.path.join(resources, "2_reads_all_context.bam")
    per_base = estimate_thresholds(BamReader(bam), include_unmapped=True)
    out = str(tmp_path / "calls.tsv")
    run_extract(
        bam, out, mode="calls",
        reference_fasta=os.path.join(resources, "CGI_ladder_3.6kb_ref.fa"),
        caller=ThresholdCaller(per_base, {}, 0.0),
    )
    with open(out) as fa, open(
        os.path.join(resources, "test_read_calls_estimate_thresh.tsv")
    ) as fb:
        assert fa.read() == fb.read()


def test_extract_supplementary_secondary(resources, tmp_path):
    # byte-equality with --allow-non-primary (tests/test_extract.rs:519)
    bam = os.path.join(resources, "supplementary_and_secondary_read.bam")
    out_full = str(tmp_path / "sup_full.tsv")
    run_extract(bam, out_full, mode="full", allow_non_primary=True)
    with open(out_full) as fa, open(
        os.path.join(resources, "test_supplementary_extract.tsv")
    ) as fb:
        assert fa.read() == fb.read()

    per_base = estimate_thresholds(BamReader(bam), include_unmapped=True)
    out_calls = str(tmp_path / "sup_calls.tsv")
    run_extract(
        bam, out_calls, mode="calls", allow_non_primary=True,
        caller=ThresholdCaller(per_base, {}, 0.0),
    )
    with open(out_calls) as fa, open(
        os.path.join(resources, "test_supplementary_calls.tsv")
    ) as fb:
        assert fa.read() == fb.read()


def test_mod_data_ord():
    """Port of tests/test_extract.rs:56 test_extract_mod_data_ord: the
    per-read profile comparator orders by (q_pos, mod_code, strand) with
    mod codes in character order ('h' < 'm')."""
    def key(q_pos, mod_code, strand):
        return (q_pos, mod_code, strand)

    d1 = key(0, "m", "+")
    d2 = key(0, "h", "+")
    d3 = key(1, "h", "+")
    assert d2 < d1
    assert d1 < d3
