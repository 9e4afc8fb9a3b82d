"""Multi-device equivalence: sharded pileup counts == single-device counts
(the analog of the reference's single-process determinism, run on a virtual
8-device CPU mesh)."""

import jax
import numpy as np
import pytest

from modkit_tpu.parallel.sharded_pileup import make_mesh, run_sharded_pileup
from modkit_tpu.pileup.engine import _numpy_counts


@pytest.mark.parametrize("t,r", [(4, 2), (2, 4), (8, 1)])
def test_sharded_matches_numpy(t, r):
    if len(jax.devices()) < t * r:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(7)
    e, m, p = 64, 2, 32
    rpos = rng.integers(0, p, size=(t, r, e)).astype(np.int32)
    strand = rng.integers(0, 2, size=(t, r, e)).astype(np.int32)
    base_idx = rng.integers(0, 4, size=(t, r, e)).astype(np.int32)
    ev_type = rng.integers(0, 3, size=(t, r, e)).astype(np.int32)
    probs = rng.uniform(-1, 1, size=(t, r, e, m)).astype(np.float32)
    valid = rng.random(size=(t, r, e)) < 0.9
    thr_mod = np.full((m, 4), 0.5, np.float32)
    thr_can = np.full(4, 0.5, np.float32)

    mesh = make_mesh(t, r)
    out = run_sharded_pileup(
        mesh, rpos, strand, base_idx, ev_type, probs, valid,
        thr_mod, thr_can, p,
    )
    assert out.shape[0] == t

    for ti in range(t):
        sel = valid[ti].reshape(-1)
        ref = _numpy_counts(
            rpos[ti].reshape(-1)[sel],
            strand[ti].reshape(-1)[sel],
            base_idx[ti].reshape(-1)[sel],
            ev_type[ti].reshape(-1)[sel],
            probs[ti].reshape(-1, m)[sel],
            thr_mod, thr_can, p, m,
        )
        np.testing.assert_array_equal(out[ti], ref)
