"""Parity tests for the native entropy window-batch engine
(native/modkit_native.cpp mk_entropy_*) against the Python oracle path.

The native path and the Python path share semantics exactly except for
log2: the native core uses libm log2f (matching the reference's Rust
f32::log2) while the numpy oracle's SIMD log2 can differ by 1 ulp, so
entropy values are compared at 1e-6 and every other column byte-exactly.
"""

import os
import subprocess
import sys

import pytest

RES = "/root/reference/tests/resources"
BAM = f"{RES}/bc_anchored_10_reads.sorted.bam"
REF = f"{RES}/CGI_ladder_3.6kb_ref.fa"


def _run(out, extra, disable_native=False):
    env = dict(os.environ)
    if disable_native:
        env["MODKIT_TPU_DISABLE_NATIVE"] = "1"
    else:
        env.pop("MODKIT_TPU_DISABLE_NATIVE", None)
    subprocess.run(
        [sys.executable, "-m", "modkit_tpu", "entropy",
         "-s", BAM, "-o", str(out), "--ref", REF,
         "--force", "--suppress-progress", *extra],
        check=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )


def _compare(a_path, b_path):
    a = [l.split("\t") for l in open(a_path).read().splitlines()]
    b = [l.split("\t") for l in open(b_path).read().splitlines()]
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert len(ra) == len(rb)
        for i, (x, y) in enumerate(zip(ra, rb)):
            if i == 3:  # entropy value: log2 ulp tolerance
                assert float(x) == pytest.approx(float(y), abs=1e-6)
            else:
                assert x == y, (ra, rb)


@pytest.mark.parametrize(
    "extra",
    [
        ["--cpg", "--min-coverage", "1"],              # combine-strands
        ["--base", "C", "--min-coverage", "1"],        # stranded
        ["--cpg", "--no-filtering"],                   # passthrough caller
        ["--base", "C", "--filter-threshold", "0.5",
         "--min-coverage", "1"],                       # fixed threshold
    ],
    ids=["cpg", "stranded", "nofilt", "fixed-thr"],
)
def test_native_batch_matches_python(tmp_path, extra):
    nat = tmp_path / "nat.bedgraph"
    py = tmp_path / "py.bedgraph"
    _run(nat, extra)
    _run(py, extra, disable_native=True)
    assert nat.read_text().strip(), "expected entropy rows"
    _compare(nat, py)


def test_baseline_shape_byte_equal(tmp_path):
    """MODKIT_TPU_ENTROPY_BASELINE=1 (the reference's scan architecture:
    tiny window batches, no read routing) must produce identical output —
    it is the measurement anchor for vs_baseline_entropy (BASELINE.md)."""
    nat = tmp_path / "nat.bedgraph"
    base = tmp_path / "base.bedgraph"
    _run(nat, ["--cpg", "--min-coverage", "1"])
    env = dict(os.environ)
    env["MODKIT_TPU_ENTROPY_BASELINE"] = "1"
    subprocess.run(
        [sys.executable, "-m", "modkit_tpu", "entropy",
         "-s", BAM, "-o", str(base), "--ref", REF, "--cpg",
         "--min-coverage", "1", "--force", "--suppress-progress"],
        check=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert nat.read_bytes() == base.read_bytes()
