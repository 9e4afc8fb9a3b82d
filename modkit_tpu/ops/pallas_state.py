"""Pallas TPU kernel: per-event threshold-call state from compact u8 inputs.

This is the hot device op of the pileup engine (the vectorized
``MultipleThresholdModCaller::call``, reference threshold_mod_caller.rs:28).
The XLA version (ops/pileup_counts.py threshold_state_from_quals)
materializes the reconstructed [N, M] f32 probability matrix and several
[N, M] temporaries in HBM between fused ops; this Pallas kernel streams the
u8 inputs through VMEM once and keeps every per-class temporary in
registers, writing only the one-byte state per event:

    state = 0 filtered | 1 canonical | 2 + j (mod code j)

Inputs are laid out events-major in 128-lane tiles:
    quals_t      u8 [M, R, 128]  ML qualities, one plane per mod class
    present_bits u8 [R, 128]     bit j set = class j present at the event
    zero_bits    u8 [R, 128]     bit j set = prob is exactly 0.0 (inferred)
    base_idx     u8 [R, 128]     primary base (ACGT = 0..3)
    thr_mod      f32 [M, 4]      per-(class, base) thresholds
    thr_can      f32 [1, 4]      per-base canonical thresholds

Call semantics are kept bit-identical to the numpy oracle
(engine.modcall_counts_numpy): probs = (q + 0.5)/256 exact in f32;
canonical prob accumulates 1 - sum in class order; a later equal-probability
class wins ties; canonical beats a tied mod class.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK_ROWS = 512  # events per block = BLOCK_ROWS * LANES


def _state_kernel(thr_mod_ref, thr_can_ref, quals_ref, present_ref,
                  zero_ref, base_ref, out_ref):
    m = quals_ref.shape[0]
    base = base_ref[:].astype(jnp.int32)
    pres_bits = present_ref[:].astype(jnp.int32)
    zero_bits = zero_ref[:].astype(jnp.int32)

    def thr_for(row):
        """Threshold per event for one [4]-vector of per-base thresholds."""
        t = jnp.float32(row[0])
        t = jnp.where(base == 1, row[1], t)
        t = jnp.where(base == 2, row[2], t)
        t = jnp.where(base == 3, row[3], t)
        return t

    shape = base.shape
    prob_sum = jnp.zeros(shape, jnp.float32)
    best_p = jnp.full(shape, -jnp.inf, jnp.float32)
    best_j = jnp.zeros(shape, jnp.int32)
    any_mod = jnp.zeros(shape, jnp.bool_)

    for j in range(m):
        present_j = ((pres_bits >> j) & 1) == 1
        zero_j = ((zero_bits >> j) & 1) == 1
        # Mosaic has no direct u8 -> f32 cast; widen via i32
        q = quals_ref[j].astype(jnp.int32).astype(jnp.float32)
        p = (q + jnp.float32(0.5)) / jnp.float32(256.0)
        pj = jnp.where(zero_j, jnp.float32(0.0), p)
        # canonical prob: 1 - sum(present probs), accumulated in class order
        prob_sum = prob_sum + jnp.where(present_j, pj, jnp.float32(0.0))
        thr_j = thr_for([thr_mod_ref[j, b] for b in range(4)])
        pass_j = present_j & (pj >= thr_j)
        mp = jnp.where(pass_j, pj, -jnp.inf)
        # last max wins ties (Rust Iterator::max keeps the last)
        take = mp >= best_p
        best_p = jnp.where(take, mp, best_p)
        best_j = jnp.where(take, j, best_j)
        any_mod = any_mod | pass_j

    canon_p = jnp.float32(1.0) - prob_sum
    pass_can = canon_p >= thr_for([thr_can_ref[0, b] for b in range(4)])
    choose_can = pass_can & ((~any_mod) | (canon_p >= best_p))
    state = jnp.where(
        choose_can,
        1,
        jnp.where(any_mod, 2 + best_j, 0),
    )
    out_ref[:] = state.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def threshold_state_pallas(
    quals_t,  # u8 [M, N] (transposed: class-major)
    present_bits,  # u8 [N]
    zero_bits,  # u8 [N]
    base_idx,  # u8 [N]
    thr_mod,  # f32 [M, 4]
    thr_can,  # f32 [4]
    interpret: bool = False,
):
    m, n = quals_t.shape
    assert n % LANES == 0, n
    r = n // LANES
    br = min(BLOCK_ROWS, r)
    assert r % br == 0, (r, br)
    grid = (r // br,)

    quals3 = quals_t.reshape(m, r, LANES)
    pres2 = present_bits.reshape(r, LANES)
    zero2 = zero_bits.reshape(r, LANES)
    base2 = base_idx.reshape(r, LANES)
    thr_can2 = thr_can.reshape(1, 4)

    ev_spec = pl.BlockSpec(
        (br, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _state_kernel,
        out_shape=jax.ShapeDtypeStruct((r, LANES), jnp.uint8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (m, br, LANES), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            ev_spec, ev_spec, ev_spec,
        ],
        out_specs=ev_spec,
        interpret=interpret,
    )(thr_mod, thr_can2, quals3, pres2, zero2, base2)
    return out.reshape(n)
