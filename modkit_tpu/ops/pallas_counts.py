"""Pallas TPU kernel: fused pileup count aggregation as one-hot MXU matmuls.

The SURVEY §7 "pileup_scatter" kernel. XLA lowers the per-event
``.at[flat].add`` scatter of ops/pileup_counts.py to a serialized
scatter-add (TPUs have no hardware scatter); the TPU-native formulation is
a segmented one-hot matmul on the MXU:

    counts[p2, col] = sum_e onehot(p2_e)[e, p2] * onehot(col_e)[e, col]

Events are pre-sorted by reference position (host radix sort) and bucketed
into GROUPS of ``W`` windows x WIN_POS positions; each grid step contracts
one CHUNK of 2048 events in a single K=CHUNK **int8** dot with int32
accumulation (exact), accumulating the group's [P2, 128] int32 count block
in VMEM. Output lanes pack ``W`` windows x ``KC`` counters so the full
128-lane width does useful work.

Event-plane layout (the round-5 "rep8" formulation): each chunk's p2 and
col planes are [8, CHUNK] u8 blocks with all 8 sublane rows identical.
The kernel expands [8, K] -> [128, K] with a layout-preserving reshape of
a broadcast (tile-aligned vreg copies), avoiding the per-row sublane
extraction + broadcast that bounded the previous [CR, 128]-block
formulation at ~3 Geps; measured honestly (fetch-forced timing, see
tools/true_bench.py) this kernel runs ~10 Geps on the v5e = ~85% of the
chip's int8 MXU ceiling for the 16K-MAC/event contraction. ``col = 255``
encodes an invalid/padding event (matches no output lane), so no separate
valid plane exists on the wire.

Count layout matches modcall_count_kernel (ops/pileup_counts.py:98): per
(position, strand), counter 0 = filtered, 1 + b*(M+1) + {0 canonical,
1+j mod code j}. Byte-equality vs modcall_counts_numpy is asserted in
tests/test_pallas_counts.py (CPU interpret) and in bench.py on real TPU.

Reference semantics: threshold_mod_caller.rs:28 call +
pileup/mod.rs:227-281 FeatureVector tallies.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pileup_counts import threshold_states

LANES = 128
CHUNK = 2048  # events per grid step
CR = CHUNK // LANES  # legacy natural-layout rows (host array reshapes)
REP = 8  # sublane replication of the event planes
# 64 positions per window keeps the per-event matmul work at
# P2 x 128 = 16 KMAC (the one-hot contraction does P2*NL work per event,
# so the window is the cost knob; 512-position windows measured 8x slower)
WIN_POS = 64
P2 = WIN_POS * 2  # (position-in-window, strand) rows of the output block


def _plan(num_codes: int) -> tuple[int, int, int]:
    """(KC counter lanes per window, W windows per group, group positions).

    KC must hold Km = 1 + 4*(M+1) counters; W*KC = 128 output lanes.
    """
    km = 1 + 4 * (num_codes + 1)
    if km <= 16:
        kc = 16
    elif km <= 32:
        kc = 32
    elif km <= 64:
        kc = 64
    else:
        raise ValueError(f"too many mod codes for the pallas counter: {num_codes}")
    w = LANES // kc
    return kc, w, w * WIN_POS


def _count_kernel(c2g_ref, p2_ref, col_ref, out_ref):
    i = pl.program_id(0)
    g = c2g_ref[i]
    prev_g = jnp.where(i > 0, c2g_ref[jnp.maximum(i - 1, 0)], g - 1)

    @pl.when(g != prev_g)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # [8, CHUNK] u8 replicated planes -> [128, CHUNK] via a
    # layout-preserving reshape of a broadcast (vreg copies only)
    p28 = p2_ref[:].astype(jnp.int32)
    col8 = col_ref[:].astype(jnp.int32)
    p2b = jnp.broadcast_to(
        p28[None, :, :], (P2 // REP, REP, CHUNK)
    ).reshape(P2, CHUNK)
    colb = jnp.broadcast_to(
        col8[None, :, :], (LANES // REP, REP, CHUNK)
    ).reshape(LANES, CHUNK)
    iota_p2 = jax.lax.broadcasted_iota(jnp.int32, (P2, CHUNK), 0)
    iota_nl = jax.lax.broadcasted_iota(jnp.int32, (LANES, CHUNK), 0)
    # int8 one-hots contracted on the MXU with exact int32 accumulation;
    # col 255 (invalid/padding) matches no lane -> zero column
    a_t = (iota_p2 == p2b).astype(jnp.int8)
    b_t = (iota_nl == colb).astype(jnp.int8)
    acc = jax.lax.dot_general(
        a_t, b_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[0] += acc


@functools.partial(
    jax.jit, static_argnames=("n_groups", "interpret")
)
def _count_call(c2g, p2r8, colr8, *, n_groups: int, interpret: bool):
    """p2r8/colr8: [n_chunks * REP, CHUNK] u8, all REP rows of a chunk
    identical; col 255 = invalid."""
    n_chunks = len(c2g)
    ev_spec = pl.BlockSpec((REP, CHUNK), lambda i, ref: (i, 0))
    return pl.pallas_call(
        _count_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[ev_spec, ev_spec],
            out_specs=pl.BlockSpec(
                (1, P2, LANES), lambda i, ref: (ref[i], 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((n_groups, P2, LANES), jnp.int32),
        interpret=interpret,
    )(c2g, p2r8, colr8)


# chunk-count buckets bound jit specializations of the kernel grid (the
# same discipline as pileup_counts._EVENT_BUCKETS); padding chunks carry
# col=255 events routed to the final group
_CHUNK_BUCKETS = (8, 32, 128, 512, 2048)


def _round_up_chunks(n: int) -> int:
    for b in _CHUNK_BUCKETS:
        if n <= b:
            return b
    return ((n + _CHUNK_BUCKETS[-1] - 1) // _CHUNK_BUCKETS[-1]) * _CHUNK_BUCKETS[-1]


def prepare_events(
    rpos: np.ndarray,
    strand: np.ndarray,
    base_idx: np.ndarray,
    probs: np.ndarray,
    num_positions: int,
    num_codes: int,
    bucket_chunks: bool = False,
):
    """Host-side sort + group/pad planning (numpy radix sort on int keys).

    Returns (plan dict, sorted+padded host arrays) ready for the device.
    Padded slots carry valid=0 and contribute nothing. ``bucket_chunks``
    pads the chunk count to a bucket so the production path compiles a
    bounded set of grid shapes. p2/colb ship compact u8 (1 B/event each);
    the device expands to the kernel's replicated layout.
    """
    kc, w, group_pos = _plan(num_codes)
    n = len(rpos)
    order = np.argsort(rpos, kind="stable")
    rs = rpos[order]
    groups = rs // group_pos
    n_groups = max(1, -(-num_positions // group_pos))
    # events per group -> chunks per group (pad each group to CHUNK)
    gcount = np.bincount(groups, minlength=n_groups).astype(np.int64)
    gchunks = np.maximum((gcount + CHUNK - 1) // CHUNK, 0)
    n_chunks = int(gchunks.sum())
    if n_chunks == 0:
        n_chunks = 1
        gchunks[0] = 1
    if bucket_chunks:
        # pad the grid to a bucketed chunk count; the filler chunks carry
        # only invalid events and route to the last group
        gchunks[n_groups - 1] += _round_up_chunks(n_chunks) - n_chunks
        n_chunks = int(gchunks.sum())
    total = n_chunks * CHUNK
    # destination offsets: group g's events start at chunk-aligned offset
    dst_group_start = np.zeros(n_groups, dtype=np.int64)
    dst_group_start[1:] = np.cumsum(gchunks * CHUNK)[:-1]
    src_group_start = np.zeros(n_groups, dtype=np.int64)
    src_group_start[1:] = np.cumsum(gcount)[:-1]
    idx = np.arange(n, dtype=np.int64)
    dst = dst_group_start[groups] + (idx - src_group_start[groups])

    p2 = np.zeros(total, dtype=np.uint8)
    colb = np.zeros(total, dtype=np.uint8)  # w*KC base; counter added later
    valid = np.zeros(total, dtype=np.uint8)
    base_s = np.zeros(total, dtype=np.int32)
    probs_s = np.full((total, probs.shape[1]), -1.0, dtype=np.float32)
    p2[dst] = ((rs % WIN_POS) * 2 + strand[order]).astype(np.uint8)
    colb[dst] = (((rs % group_pos) // WIN_POS) * kc).astype(np.uint8)
    valid[dst] = 1
    base_s[dst] = base_idx[order]
    probs_s[dst] = probs[order]
    c2g = np.repeat(
        np.arange(n_groups, dtype=np.int32), gchunks
    ).astype(np.int32)
    # groups with no chunks are never visited by the grid -> their output
    # blocks are uninitialized; the wrapper zero-masks them
    visited = (gchunks > 0).astype(np.int32)
    plan = dict(kc=kc, w=w, group_pos=group_pos, n_groups=n_groups)
    return plan, c2g, p2, colb, valid, base_s, probs_s, visited


def modcall_counts_pallas(
    rpos: np.ndarray,
    strand: np.ndarray,
    base_idx: np.ndarray,
    probs: np.ndarray,
    thr_mod: np.ndarray,
    thr_can: np.ndarray,
    num_positions: int,
    interpret: bool = False,
    device_inputs: tuple | None = None,
    bucket_chunks: bool = False,
):
    """Device counts [num_positions, 2, Km] via the one-hot-matmul kernel.

    Drop-in device replacement for modcall_count_kernel's XLA scatter
    (threshold state computes in fused XLA elementwise ops; the scatter —
    the actual bottleneck — runs on the MXU). ``device_inputs`` short-cuts
    re-preparation for benchmarking (plan, c2g, p2, colb, valid, base_s,
    probs_s already device-resident).
    """
    m = probs.shape[1] if probs.ndim == 2 else 1
    km = 1 + 4 * (m + 1)
    if device_inputs is None:
        (plan, c2g, p2, colb, valid, base_s, probs_s, visited) = (
            prepare_events(
                rpos, strand, base_idx, probs, num_positions, m,
                bucket_chunks=bucket_chunks,
            )
        )
    else:
        plan, c2g, p2, colb, valid, base_s, probs_s, visited = device_inputs
    out = _counts_from_prepared(
        c2g, p2, colb, valid, base_s, probs_s, visited, thr_mod, thr_can,
        n_groups=plan["n_groups"], kc=plan["kc"], w=plan["w"],
        interpret=interpret,
    )
    return out[:num_positions, :, :km]


@functools.partial(
    jax.jit, static_argnames=("n_groups", "kc", "w", "interpret")
)
def _counts_from_prepared(
    c2g, p2, colb, valid, base_s, probs_s, visited, thr_mod, thr_can,
    *, n_groups: int, kc: int, w: int, interpret: bool,
):
    m = probs_s.shape[1]
    state, _ = threshold_states(probs_s, base_s, thr_mod, thr_can)
    counter = jnp.where(
        state == 0, 0, 1 + base_s * (m + 1) + (state - 1)
    ).astype(jnp.int32)
    col = jnp.where(
        valid != 0, colb.astype(jnp.int32) + counter, 255
    ).astype(jnp.uint8)
    # expand the compact planes to the kernel's [8, CHUNK]-replicated
    # layout (a bandwidth-only XLA broadcast copy)
    n_chunks = p2.shape[0] // CHUNK
    p2r8 = jnp.broadcast_to(
        p2.reshape(n_chunks, 1, CHUNK), (n_chunks, REP, CHUNK)
    ).reshape(n_chunks * REP, CHUNK)
    colr8 = jnp.broadcast_to(
        col.reshape(n_chunks, 1, CHUNK), (n_chunks, REP, CHUNK)
    ).reshape(n_chunks * REP, CHUNK)
    out = _count_call(
        c2g, p2r8, colr8, n_groups=n_groups, interpret=interpret,
    )
    out = out * visited[:, None, None]  # zero never-visited group blocks
    # out[g, posw*2 + strand, w*KC + k] -> [g*W*512 + w*512 + posw, strand, k]
    out = out.reshape(n_groups, WIN_POS, 2, w, kc)
    out = jnp.transpose(out, (0, 3, 1, 2, 4))
    return out.reshape(n_groups * w * WIN_POS, 2, kc)
