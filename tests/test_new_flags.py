"""Behavior tests for the round-4 flag additions: --sample-region,
extract --ignore-implicit / --out-threads / -q, sample-probs
--dna-color/--mod-color. References: pileup/subcommand.rs:193,
extract/args.rs:24,168, commands.rs:619-625."""

import gzip
import os

import pytest

from modkit_tpu.cli import main

BAM = "bc_anchored_10_reads.sorted.bam"


def test_pileup_sample_region_restricts_sampling(tmp_path, monkeypatch):
    """--sample-region reaches estimate_thresholds as the sampling region
    and restricts which reads are sampled."""
    from modkit_tpu.io.bam import BamReader
    from modkit_tpu.thresholds import sample_reads
    from modkit_tpu.utils.synth import make_synthetic_modbam

    bam = str(tmp_path / "s.bam")
    make_synthetic_modbam(bam, n_reads=400, read_len=1500, coverage=10, seed=5)
    reader = BamReader(bam)
    contig = reader.header.refs[0].name
    c_all = sample_reads(
        BamReader(bam), None, None, None, False, confidences_only=True
    )
    c_reg = sample_reads(
        BamReader(bam), None, None, None, False,
        region=f"{contig}:0-20000", confidences_only=True,
    )
    n_all = sum(len(v) for v in c_all.values())
    n_reg = sum(len(v) for v in c_reg.values())
    assert 0 < n_reg < n_all

    # the CLI plumbs --sample-region through to the estimation call
    seen = {}

    from modkit_tpu.thresholds import estimate_thresholds as real_est

    def spy_est(reader, **kw):
        seen["region"] = kw.get("region")
        return real_est(reader, **kw)

    import modkit_tpu.thresholds as th

    monkeypatch.setattr(th, "estimate_thresholds", spy_est)
    out = str(tmp_path / "o.bed")
    assert main(
        ["pileup", bam, out, "--suppress-progress", "-n", "50",
         "--sample-region", f"{contig}:0-20000"]
    ) == 0
    assert seen["region"] == f"{contig}:0-20000"


def test_call_mods_sample_region(resources, tmp_path):
    src = os.path.join(resources, BAM)
    out = str(tmp_path / "c.bam")
    assert main(
        ["call-mods", src, out, "--sample-region", "oligo_1512_adapters"]
    ) == 0
    assert os.path.getsize(out) > 0


def test_extract_ignore_implicit(resources, tmp_path):
    # 2_reads_all_context uses '.'-mode MM tags -> inferred rows exist
    src = os.path.join(resources, "2_reads_all_context.bam")
    full = str(tmp_path / "full.tsv")
    noimp = str(tmp_path / "noimp.tsv")
    assert main(
        ["extract", "full", src, full, "--suppress-progress"]
    ) == 0
    assert main(
        ["extract", "full", src, noimp, "--suppress-progress",
         "--ignore-implicit"]
    ) == 0
    rows = open(full).read().splitlines()
    rows_ni = open(noimp).read().splitlines()
    inferred_col = rows[0].split("\t").index("inferred")
    assert any(r.split("\t")[inferred_col] == "true" for r in rows[1:])
    assert all(
        r.split("\t")[inferred_col] == "false" for r in rows_ni[1:]
    )
    # the non-inferred rows are exactly preserved
    want = [
        r for r in rows[1:] if r.split("\t")[inferred_col] == "false"
    ]
    assert rows_ni[1:] == want


def test_extract_ignore_implicit_python_oracle(
    resources, tmp_path, monkeypatch
):
    """The Python row path filters identically to the native stream."""
    from modkit_tpu import native

    src = os.path.join(resources, "2_reads_all_context.bam")
    nat = str(tmp_path / "nat.tsv")
    py = str(tmp_path / "py.tsv")
    assert main(
        ["extract", "full", src, nat, "--suppress-progress",
         "--ignore-implicit"]
    ) == 0
    monkeypatch.setattr(native, "available", lambda: False)
    assert main(
        ["extract", "full", src, py, "--suppress-progress",
         "--ignore-implicit"]
    ) == 0
    assert open(py).read() == open(nat).read()


def test_extract_out_threads_and_q_alias(resources, tmp_path):
    src = os.path.join(resources, BAM)
    out = str(tmp_path / "o.tsv.gz")
    assert main(
        ["extract", "full", src, out, "--suppress-progress", "--bgzf",
         "--out-threads", "2", "-q", "50"]
    ) == 0
    text = gzip.open(out, "rt").read()
    assert text.startswith("read_id\t")


def test_sample_probs_colors(resources, tmp_path):
    src = os.path.join(resources, BAM)
    outdir = str(tmp_path / "probs")
    assert main(
        ["sample-probs", src, "-o", outdir, "--hist", "--force",
         "--dna-color", "C", "#111111", "--mod-color", "h", "#222222",
         "--suppress-progress"]
    ) == 0
    html = open(os.path.join(outdir, "counts.html")).read()
    assert "#111111" in html
    assert "#222222" in html
