"""Native region sampling (mk_sample_region) reproduces the Python
sampling loop exactly: same consumed reads, same pooled confidences, and
bit-identical estimated thresholds (thresholds.py sample_reads oracle).
Reference: reads_sampler/mod.rs:30 get_sampled_read_ids_to_base_mod_probs."""

import numpy as np
import pytest

from modkit_tpu import native
from modkit_tpu.collapse import CollapseMethod
from modkit_tpu.io.bam import BamReader
from modkit_tpu.pileup.events import EdgeFilter
from modkit_tpu.thresholds import estimate_thresholds, sample_reads

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _python_estimate(bam, **kw):
    """Force the Python fetch loop by hiding the native fast path."""
    reader = BamReader(bam)

    class NoRaw:
        def __init__(self, r):
            self._r = r

        def __getattr__(self, name):
            if name in ("bam_raw", "fetch_chunk_voffsets"):
                raise AttributeError(name)
            return getattr(self._r, name)

    # hasattr() checks fail -> python loop; flush_pending still uses the
    # native batch decoder, which is already equivalence-tested
    return estimate_thresholds(NoRaw(reader), **kw)


@pytest.mark.parametrize("num_reads", [50, 500, 10042])
def test_native_sampling_thresholds_identical(tmp_path, num_reads):
    from modkit_tpu.utils.synth import make_synthetic_modbam

    bam = str(tmp_path / "s.bam")
    make_synthetic_modbam(bam, n_reads=800, read_len=1500, coverage=12, seed=9)
    want = _python_estimate(bam, num_reads=num_reads)
    got = estimate_thresholds(BamReader(bam), num_reads=num_reads)
    assert got == want


def test_native_sampling_with_collapse_and_edge(tmp_path):
    from modkit_tpu.utils.synth import make_synthetic_modbam

    bam = str(tmp_path / "s.bam")
    make_synthetic_modbam(bam, n_reads=400, read_len=1200, coverage=8, seed=4)
    kw = dict(
        num_reads=200,
        collapse=[CollapseMethod("dist", ("h",))],
        edge_filter=EdgeFilter(10, 10, False),
    )
    assert estimate_thresholds(BamReader(bam), **kw) == _python_estimate(
        bam, **kw
    )


def test_native_sampling_confidences_identical(tmp_path):
    """The pooled per-base confidence arrays match after sorting (the
    percentile consumes the sorted vector)."""
    from modkit_tpu.utils.synth import make_synthetic_modbam

    bam = str(tmp_path / "s.bam")
    make_synthetic_modbam(bam, n_reads=300, read_len=1000, coverage=6, seed=2)
    a = sample_reads(
        BamReader(bam), 100, None, None, False, confidences_only=True
    )
    reader = BamReader(bam)

    class NoRaw:
        def __init__(self, r):
            self._r = r

        def __getattr__(self, name):
            if name in ("bam_raw", "fetch_chunk_voffsets"):
                raise AttributeError(name)
            return getattr(self._r, name)

    b = sample_reads(
        NoRaw(reader), 100, None, None, False, confidences_only=True
    )
    assert set(a) == set(b)
    for base in a:
        assert np.array_equal(np.sort(a[base]), np.sort(b[base])), base


def test_native_sampling_reference_bam(resources):
    import os

    bam = os.path.join(resources, "bc_anchored_10_reads.sorted.bam")
    want = _python_estimate(bam, num_reads=10042)
    got = estimate_thresholds(BamReader(bam), num_reads=10042)
    assert got == want
