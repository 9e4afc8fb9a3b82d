"""The one-hot-matmul Pallas count kernel (ops/pallas_counts.py) is
byte-identical to the numpy oracle modcall_counts_numpy across vocab
sizes, event distributions and tile shapes (CPU interpret mode; the
real-TPU equality check runs in bench.py)."""

import numpy as np
import pytest

from modkit_tpu.ops.pallas_counts import modcall_counts_pallas
from modkit_tpu.ops.pileup_counts import modcall_counts_numpy


def _case(n, m, p, seed, thr=0.5):
    rng = np.random.default_rng(seed)
    rpos = rng.integers(0, p, n).astype(np.int32)
    strand = rng.integers(0, 2, n).astype(np.int32)
    base = rng.integers(0, 4, n).astype(np.int32)
    probs = rng.random((n, m), dtype=np.float32)
    # sprinkle absent classes and exact zeros
    probs[rng.random((n, m)) < 0.3] = -1.0
    probs[rng.random((n, m)) < 0.1] = 0.0
    thr_mod = np.full((m, 4), thr, dtype=np.float32)
    thr_can = np.full(4, thr, dtype=np.float32)
    return rpos, strand, base, probs, thr_mod, thr_can


@pytest.mark.parametrize(
    "n,m,p",
    [
        (1000, 1, 700),
        (5000, 2, 4096),
        (20000, 2, 100_000),
        (3000, 3, 5000),  # Km=17 -> KC=32 plan
        (500, 7, 1000),   # Km=33 -> KC=64 plan
        (100, 2, 100),    # tiny tile, single group
    ],
)
def test_pallas_counts_matches_numpy(n, m, p):
    rpos, strand, base, probs, thr_mod, thr_can = _case(n, m, p, seed=n + m)
    want = modcall_counts_numpy(
        rpos.astype(np.int64), strand.astype(np.int64),
        base.astype(np.int64), probs, thr_mod, thr_can, p, m
    )
    got = np.asarray(
        modcall_counts_pallas(
            rpos, strand, base, probs, thr_mod, thr_can, p, interpret=True
        )
    )
    assert got.shape == want.shape
    assert np.array_equal(got, want)


def test_pallas_counts_clustered_positions():
    """Hot columns (many events on few positions) exercise accumulation
    across many chunks of one group."""
    rng = np.random.default_rng(0)
    n, m, p = 30_000, 2, 2000
    rpos = (rng.integers(0, 10, n) + 995).astype(np.int32)
    strand = rng.integers(0, 2, n).astype(np.int32)
    base = rng.integers(0, 4, n).astype(np.int32)
    probs = rng.random((n, m), dtype=np.float32)
    thr_mod = np.full((m, 4), 0.7, dtype=np.float32)
    thr_can = np.full(4, 0.7, dtype=np.float32)
    want = modcall_counts_numpy(
        rpos.astype(np.int64), strand.astype(np.int64),
        base.astype(np.int64), probs, thr_mod, thr_can, p, m
    )
    got = np.asarray(
        modcall_counts_pallas(
            rpos, strand, base, probs, thr_mod, thr_can, p, interpret=True
        )
    )
    assert np.array_equal(got, want)
