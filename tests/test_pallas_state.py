"""Pallas threshold-state kernel vs the XLA kernel and numpy oracle.

Runs in interpreter mode on CPU (real-TPU compilation is exercised by the
driver / bench on hardware).
"""

import numpy as np
import pytest

from modkit_tpu.ops.pallas_state import LANES, threshold_state_pallas
from modkit_tpu.ops.pileup_counts import threshold_state_from_quals


def random_case(rng, n, m):
    quals = rng.integers(0, 256, size=(n, m)).astype(np.uint8)
    present = rng.integers(0, 1 << m, size=n).astype(np.uint8)
    zero = (rng.integers(0, 1 << m, size=n) & present).astype(np.uint8)
    base = rng.integers(0, 4, size=n).astype(np.uint8)
    thr_mod = rng.random((m, 4), dtype=np.float32)
    thr_can = rng.random(4, dtype=np.float32)
    return quals, present, zero, base, thr_mod, thr_can


def oracle_states(quals, present, zero, base, thr_mod, thr_can):
    n, m = quals.shape
    j = np.arange(m, dtype=np.uint8)
    pres = ((present[:, None] >> j) & 1).astype(bool)
    zer = ((zero[:, None] >> j) & 1).astype(bool)
    p = (quals.astype(np.float32) + np.float32(0.5)) / np.float32(256.0)
    probs = np.where(pres, np.where(zer, np.float32(0), p), np.float32(-1))
    present_m = probs >= 0
    thr_e = thr_mod.T[base]
    pass_mod = present_m & (probs >= thr_e)
    canon_p = np.float32(1.0) - np.where(present_m, probs, 0).sum(
        axis=1, dtype=np.float32
    )
    pass_can = canon_p >= thr_can[base]
    mod_p = np.where(pass_mod, probs, -np.inf)
    rev_arg = (m - 1) - np.argmax(mod_p[:, ::-1], axis=1)
    best_p = np.take_along_axis(mod_p, rev_arg[:, None], axis=1)[:, 0]
    any_mod = pass_mod.any(axis=1)
    choose_can = pass_can & ((~any_mod) | (canon_p >= best_p))
    return np.where(choose_can, 1, np.where(any_mod, 2 + rev_arg, 0)).astype(
        np.uint8
    )


@pytest.mark.parametrize("m", [1, 2, 4, 8])
def test_pallas_state_matches_oracle(m):
    rng = np.random.default_rng(m)
    n = 64 * LANES
    quals, present, zero, base, thr_mod, thr_can = random_case(rng, n, m)
    want = oracle_states(quals, present, zero, base, thr_mod, thr_can)
    got = np.asarray(
        threshold_state_pallas(
            np.ascontiguousarray(quals.T), present, zero, base,
            thr_mod, thr_can, interpret=True,
        )
    )
    assert np.array_equal(got, want)
    # XLA kernel agrees too
    got_xla = np.asarray(
        threshold_state_from_quals(
            quals, present, zero, base, thr_mod, thr_can
        )
    )
    assert np.array_equal(got_xla, want)


def test_pallas_state_ties_prefer_last_class_then_canonical():
    # two classes with identical probs at the same threshold: class 1 wins
    # among mods; an equal canonical wins over both.
    m = 2
    quals = np.array([[127, 127]], dtype=np.uint8)  # p = 0.498046875 each
    present = np.array([0b11], dtype=np.uint8)
    zero = np.array([0], dtype=np.uint8)
    base = np.array([1], dtype=np.uint8)
    thr_mod = np.zeros((m, 4), dtype=np.float32)
    thr_can = np.ones(4, dtype=np.float32)  # canonical never passes
    n_pad = LANES * 32

    def pad(a, fill=0):
        out = np.full(n_pad, fill, dtype=a.dtype)
        out[: len(a)] = a
        return out

    got = np.asarray(
        threshold_state_pallas(
            np.ascontiguousarray(np.tile(pad(quals[:, 0]), (m, 1))),
            pad(present), pad(zero), pad(base), thr_mod, thr_can,
            interpret=True,
        )
    )
    assert got[0] == 2 + 1  # class 1 (the later class) wins the tie

    # canonical prob = 1 - 2*0.498 = 0.0039... set thr_can low enough and
    # probs low so canonical >= best passing mod prob -> canonical wins
    quals2 = np.array([[0, 0]], dtype=np.uint8)  # p = 0.001953125
    thr_can2 = np.zeros(4, dtype=np.float32)
    got2 = np.asarray(
        threshold_state_pallas(
            np.ascontiguousarray(np.tile(pad(quals2[:, 0]), (m, 1))),
            pad(present), pad(zero), pad(base), thr_mod, thr_can2,
            interpret=True,
        )
    )
    assert got2[0] == 1  # canonical (0.996) beats passing mods (0.0019)
