"""Golden-file conformance tests for pileup vs the reference's expected
outputs (the same fixtures reference tests/test_pileup.rs exercises)."""

import os

import pytest

from modkit_tpu.pileup.runner import PileupConfig, run_pileup


def _diff(out_path: str, expected_path: str):
    with open(out_path) as fh:
        got = fh.read()
    with open(expected_path) as fh:
        want = fh.read()
    if got != want:
        got_lines = got.splitlines()
        want_lines = want.splitlines()
        msgs = [f"line counts: got {len(got_lines)} want {len(want_lines)}"]
        for i, (g, w) in enumerate(zip(got_lines, want_lines)):
            if g != w:
                msgs.append(f"first diff at line {i + 1}:\n  got:  {g}\n  want: {w}")
                break
        raise AssertionError("\n".join(msgs))


def test_pileup_no_filt(resources, tmp_path):
    # reference tests/test_pileup.rs:22 test_pileup_no_filt
    out = str(tmp_path / "nofilt.bed")
    run_pileup(
        PileupConfig(
            in_bam=os.path.join(resources, "bc_anchored_10_reads.sorted.bam"),
            out=out,
            interval_size=25,
            no_filtering=True,
        )
    )
    _diff(out, os.path.join(resources, "modbam.modpileup_nofilt.methyl.bed"))


def test_pileup_with_filt(resources, tmp_path):
    # reference tests/test_pileup.rs:43 test_pileup_with_filt
    out = str(tmp_path / "filt025.bed")
    run_pileup(
        PileupConfig(
            in_bam=os.path.join(resources, "bc_anchored_10_reads.sorted.bam"),
            out=out,
            interval_size=25,
            sample_frac=1.0,
            filter_percentile=0.25,
            seed=42,
            include_unmapped=True,
        )
    )
    _diff(out, os.path.join(resources, "modbam.modpileup_filt025.methyl.bed"))


def test_pileup_combine_mods(resources, tmp_path):
    # reference tests/test_pileup.rs:70 test_pileup_combine
    out = str(tmp_path / "combined.bed")
    run_pileup(
        PileupConfig(
            in_bam=os.path.join(resources, "bc_anchored_10_reads.sorted.bam"),
            out=out,
            no_filtering=True,
            combine_mods=True,
        )
    )
    _diff(out, os.path.join(resources, "modbam.modpileup_combined.methyl.bed"))


def test_pileup_ignore_h(resources, tmp_path):
    # reference tests/test_pileup.rs:91 test_pileup_collapse: pileup with
    # --ignore h must equal pileup over an adjust-mods --ignore h rewrite.
    from modkit_tpu.collapse import CollapseMethod

    out = str(tmp_path / "ignore_h.bed")
    run_pileup(
        PileupConfig(
            in_bam=os.path.join(resources, "bc_anchored_10_reads.sorted.bam"),
            out=out,
            interval_size=25,
            no_filtering=True,
            collapse=[CollapseMethod.parse("norm", "h")],
        )
    )
    # cross-check: only 'm' rows remain
    with open(out) as fh:
        for line in fh:
            assert line.split("\t")[3] == "m"


def _dir_contents(d):
    return {
        f: open(os.path.join(d, f)).read()
        for f in sorted(os.listdir(d))
    }


def _run_multi_file_resume(tmp_path, resources, *, bedgraph, partition):
    """Shared harness: full run vs crash-at-half-journal + resume must
    produce identical per-file outputs for directory writers."""
    import json
    import shutil

    bam = f"{resources}/bc_anchored_10_reads.sorted.bam"
    kw = dict(
        in_bam=bam, interval_size=25, no_filtering=True,
        bedgraph=bedgraph,
        partition_tags=["HP"] if partition else None,
    )
    full_dir = tmp_path / "full"
    jfull = tmp_path / "jfull.jsonl"
    run_pileup(PileupConfig(out=str(full_dir), journal=str(jfull), **kw))
    full = _dir_contents(full_dir)
    assert full, "expected output files"

    lines = [json.loads(l) for l in open(jfull) if l.strip()]
    assert lines and all("out_sizes" in r for r in lines)
    half = lines[: len(lines) // 2]
    resume_dir = tmp_path / "resume"
    shutil.copytree(full_dir, resume_dir)
    # simulate the crash: a garbage tail beyond the journaled sizes in
    # one file, plus an extra partial file not in the journal record
    sizes = half[-1]["out_sizes"]
    victim = sorted(sizes)[0]
    with open(resume_dir / victim, "a") as fh:
        fh.write("GARBAGE\tROW\n")
    suffix = ".bedgraph" if bedgraph else ".bed"
    extra = resume_dir / f"zz_partial{suffix}"
    extra.write_text("partial\trow\n")
    j2 = tmp_path / "j2.jsonl"
    with open(j2, "w") as fh:
        for r in half:
            fh.write(json.dumps(r) + "\n")
    run_pileup(PileupConfig(out=str(resume_dir), journal=str(j2), **kw))
    resumed = _dir_contents(resume_dir)
    # the stray partial file is reset to empty, not deleted
    assert resumed.pop(f"zz_partial{suffix}") == ""
    assert resumed == full


def test_pileup_journal_resume_bedgraph(tmp_path, resources):
    """Journaled resume for --bedgraph directory outputs (VERDICT r4 #8)."""
    _run_multi_file_resume(tmp_path, resources, bedgraph=True, partition=False)


def test_pileup_journal_resume_partition_tag(tmp_path, resources):
    """Journaled resume for --partition-tag directory outputs."""
    _run_multi_file_resume(
        tmp_path, resources, bedgraph=False, partition=True
    )


def test_pileup_journal_resume(tmp_path, resources):
    """Per-tile journal: interrupting and resuming reproduces the golden
    byte-for-byte (SURVEY Section 5 checkpoint/resume)."""
    import json

    from modkit_tpu.pileup.runner import PileupConfig, run_pileup

    bam = f"{resources}/bc_anchored_10_reads.sorted.bam"
    out = tmp_path / "full.bed"
    journal = tmp_path / "journal.jsonl"
    run_pileup(
        PileupConfig(
            in_bam=bam, out=str(out), interval_size=25, no_filtering=True,
            journal=str(journal),
        )
    )
    full = out.read_text()
    # simulate a crash: keep half the journal, leave a garbage tail
    lines = [json.loads(l) for l in open(journal) if l.strip()]
    half = lines[: len(lines) // 2]
    j2 = tmp_path / "j2.jsonl"
    with open(j2, "w") as fh:
        for r in half:
            fh.write(json.dumps(r) + "\n")
    good = max(r["out_size"] for r in half)
    out2 = tmp_path / "resume.bed"
    out2.write_bytes(full.encode()[: good + 37])
    run_pileup(
        PileupConfig(
            in_bam=bam, out=str(out2), interval_size=25, no_filtering=True,
            journal=str(j2),
        )
    )
    assert out2.read_text() == full
    golden = open(f"{resources}/modbam.modpileup_nofilt.methyl.bed").read()
    assert full == golden
