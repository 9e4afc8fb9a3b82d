"""Count-kernel variant lab: measure one-hot-matmul formulations on the
real chip. Usage: python tools/kernel_lab.py [variant ...]

Variants measured with device-resident inputs, rep loops amortizing the
~25 ms tunnel sync. Each must stay byte-equal to the current kernel.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from modkit_tpu.ops.pallas_counts import (
    CHUNK, CR, LANES, P2, WIN_POS, _count_call, prepare_events,
)

REPS = int(os.environ.get("LAB_REPS", "10"))


def _timeit(fn):
    fn().block_until_ready()
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn()
    out.block_until_ready()
    return (time.perf_counter() - t0) / REPS


# ---------------------------------------------------------------- variants


def make_kernel(acc_dtype, onehot_dtype, n_acc):
    """Current formulation with configurable one-hot dtype and N
    independent accumulators (breaks the acc dependency chain)."""

    def kernel(c2g_ref, p2_ref, col_ref, valid_ref, out_ref):
        i = pl.program_id(0)
        g = c2g_ref[i]
        prev_g = jnp.where(i > 0, c2g_ref[jnp.maximum(i - 1, 0)], g - 1)

        @pl.when(g != prev_g)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        p2 = p2_ref[:].astype(jnp.int32)
        col = col_ref[:].astype(jnp.int32)
        valid = valid_ref[:] != 0
        iota_p2 = jax.lax.broadcasted_iota(jnp.int32, (P2, LANES), 0)
        iota_nl = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        accs = [jnp.zeros((P2, LANES), acc_dtype) for _ in range(n_acc)]
        for r in range(CR):
            a_t = (iota_p2 == p2[r, :][None, :]).astype(onehot_dtype)
            b_t = (
                (iota_nl == col[r, :][None, :]) & valid[r, :][None, :]
            ).astype(onehot_dtype)
            accs[r % n_acc] = accs[r % n_acc] + jax.lax.dot_general(
                a_t, b_t, (((1,), (1,)), ((), ())),
                preferred_element_type=acc_dtype,
            )
        total = accs[0]
        for a in accs[1:]:
            total = total + a
        out_ref[0] += total.astype(jnp.int32)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n_groups", "acc", "oh", "n_acc")
)
def run_variant(c2g, p2, col, valid, *, n_groups, acc, oh, n_acc):
    n_chunks = len(c2g)
    ev_spec = pl.BlockSpec((CR, LANES), lambda i, ref: (i, 0))
    return pl.pallas_call(
        make_kernel(acc, oh, n_acc),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[ev_spec, ev_spec, ev_spec],
            out_specs=pl.BlockSpec(
                (1, P2, LANES), lambda i, ref: (ref[i], 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((n_groups, P2, LANES), jnp.int32),
    )(
        c2g,
        p2.reshape(n_chunks * CR, LANES),
        col.reshape(n_chunks * CR, LANES),
        valid.reshape(n_chunks * CR, LANES),
    )


# diagnostics: isolate construction / matmul / memory costs
def make_diag_kernel(mode):
    def kernel(c2g_ref, p2_ref, col_ref, valid_ref, out_ref):
        i = pl.program_id(0)
        g = c2g_ref[i]
        prev_g = jnp.where(i > 0, c2g_ref[jnp.maximum(i - 1, 0)], g - 1)

        @pl.when(g != prev_g)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        p2 = p2_ref[:].astype(jnp.int32)
        col = col_ref[:].astype(jnp.int32)
        valid = valid_ref[:] != 0
        iota_p2 = jax.lax.broadcasted_iota(jnp.int32, (P2, LANES), 0)
        iota_nl = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        acc = jnp.zeros((P2, LANES), jnp.float32)
        if mode == "empty":
            # just touch the inputs
            acc += (
                p2[0, :][None, :] + col[0, :][None, :]
            ).astype(jnp.float32) * 0.0
        elif mode == "onehot-only":
            for r in range(CR):
                a_t = (iota_p2 == p2[r, :][None, :]).astype(jnp.bfloat16)
                b_t = (
                    (iota_nl == col[r, :][None, :]) & valid[r, :][None, :]
                ).astype(jnp.bfloat16)
                # cheap combine, no matmul
                acc += a_t.astype(jnp.float32)
                acc += b_t.astype(jnp.float32)
        elif mode == "matmul-only":
            a0 = (iota_p2 == p2[0, :][None, :]).astype(jnp.bfloat16)
            b0 = (
                (iota_nl == col[0, :][None, :]) & valid[0, :][None, :]
            ).astype(jnp.bfloat16)
            for r in range(CR):
                acc += jax.lax.dot_general(
                    a0, b0, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        elif mode == "a-only":
            b0 = (
                (iota_nl == col[0, :][None, :]) & valid[0, :][None, :]
            ).astype(jnp.bfloat16)
            for r in range(CR):
                a_t = (iota_p2 == p2[r, :][None, :]).astype(jnp.bfloat16)
                acc += jax.lax.dot_general(
                    a_t, b0, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        out_ref[0] += acc.astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_groups", "mode"))
def run_diag(c2g, p2, col, valid, *, n_groups, mode):
    n_chunks = len(c2g)
    ev_spec = pl.BlockSpec((CR, LANES), lambda i, ref: (i, 0))
    return pl.pallas_call(
        make_diag_kernel(mode),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[ev_spec, ev_spec, ev_spec],
            out_specs=pl.BlockSpec(
                (1, P2, LANES), lambda i, ref: (ref[i], 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((n_groups, P2, LANES), jnp.int32),
    )(
        c2g,
        p2.reshape(n_chunks * CR, LANES),
        col.reshape(n_chunks * CR, LANES),
        valid.reshape(n_chunks * CR, LANES),
    )


# variant: single big-K dot per chunk ([P2, CHUNK] x [LANES, CHUNK])
def make_bigk_kernel(onehot_dtype, acc_dtype):
    def kernel(c2g_ref, p2_ref, col_ref, valid_ref, out_ref):
        i = pl.program_id(0)
        g = c2g_ref[i]
        prev_g = jnp.where(i > 0, c2g_ref[jnp.maximum(i - 1, 0)], g - 1)

        @pl.when(g != prev_g)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # events flattened to one [1, CHUNK] lane row per plane
        p2 = p2_ref[:].reshape(1, CHUNK).astype(jnp.int32)
        col = col_ref[:].reshape(1, CHUNK).astype(jnp.int32)
        valid = valid_ref[:].reshape(1, CHUNK) != 0
        iota_p2 = jax.lax.broadcasted_iota(jnp.int32, (P2, CHUNK), 0)
        iota_nl = jax.lax.broadcasted_iota(jnp.int32, (LANES, CHUNK), 0)
        a_t = (iota_p2 == p2).astype(onehot_dtype)
        b_t = ((iota_nl == col) & valid).astype(onehot_dtype)
        acc = jax.lax.dot_general(
            a_t, b_t, (((1,), (1,)), ((), ())),
            preferred_element_type=acc_dtype,
        )
        out_ref[0] += acc.astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_groups", "oh", "acc"))
def run_bigk(c2g, p2, col, valid, *, n_groups, oh, acc):
    n_chunks = len(c2g)
    ev_spec = pl.BlockSpec((CR, LANES), lambda i, ref: (i, 0))
    return pl.pallas_call(
        make_bigk_kernel(oh, acc),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[ev_spec, ev_spec, ev_spec],
            out_specs=pl.BlockSpec(
                (1, P2, LANES), lambda i, ref: (ref[i], 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((n_groups, P2, LANES), jnp.int32),
    )(
        c2g,
        p2.reshape(n_chunks * CR, LANES),
        col.reshape(n_chunks * CR, LANES),
        valid.reshape(n_chunks * CR, LANES),
    )


# variant: grid over GROUPS; inner double-buffered DMA loop over the
# group's chunks (amortizes the ~1.3us/grid-step overhead that bounds the
# per-chunk-grid formulation at ~1.5 Geps even with an empty body).
# Event planes packed u8: plane 0 = p2 (0..127), plane 1 = col with 255
# encoding invalid (never matches iota 0..127 -> zero column), so the
# valid plane disappears and a chunk's DMA is one [2*CR, 128] u8 block.
def make_group_kernel(onehot_dtype, acc_dtype, max_chunks, n_acc=1):
    def kernel(gcnt_ref, ev_hbm, out_ref, scr, sems):
        g = pl.program_id(0)
        cnt = gcnt_ref[g]
        start = gcnt_ref[pl.num_programs(0) + g]  # chunk offset of group

        def get_dma(slot, ci):
            return pltpu.make_async_copy(
                ev_hbm.at[pl.ds((start + ci) * 2 * CR, 2 * CR), :],
                scr.at[slot],
                sems.at[slot],
            )

        @pl.when(cnt > 0)
        def _():
            get_dma(0, 0).start()

        iota_p2 = jax.lax.broadcasted_iota(jnp.int32, (P2, LANES), 0)
        iota_nl = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)

        def body(ci, accs):
            slot = jax.lax.rem(ci, 2)
            nxt = jax.lax.rem(ci + 1, 2)

            @pl.when(ci + 1 < cnt)
            def _():
                get_dma(nxt, ci + 1).start()

            get_dma(slot, ci).wait()
            p2 = scr[slot, 0:CR, :].astype(jnp.int32)
            col = scr[slot, CR:2 * CR, :].astype(jnp.int32)
            accs = list(accs)
            for r in range(CR):
                a_t = (iota_p2 == p2[r, :][None, :]).astype(onehot_dtype)
                b_t = (iota_nl == col[r, :][None, :]).astype(onehot_dtype)
                k = r % n_acc
                accs[k] = accs[k] + jax.lax.dot_general(
                    a_t, b_t, (((1,), (1,)), ((), ())),
                    preferred_element_type=acc_dtype,
                )
            return tuple(accs)

        acc0 = tuple(
            jnp.zeros((P2, LANES), acc_dtype) for _ in range(n_acc)
        )
        accs = jax.lax.fori_loop(0, cnt, body, acc0)
        total = accs[0]
        for a in accs[1:]:
            total = total + a
        out_ref[0] = total.astype(jnp.int32)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n_groups", "oh", "acc", "max_chunks", "n_acc")
)
def run_group(gmeta, ev_packed, *, n_groups, oh, acc, max_chunks, n_acc=1):
    return pl.pallas_call(
        make_group_kernel(oh, acc, max_chunks, n_acc),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_groups,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (1, P2, LANES), lambda i, ref: (i, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, 2 * CR, LANES), jnp.uint8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_groups, P2, LANES), jnp.int32),
    )(gmeta, ev_packed)


# variant: host-transposed planes — each chunk's events as a [1, CHUNK]
# lane-major row, so the kernel never extracts sublane rows; one broadcast
# + compare + K=CHUNK dot per chunk.
def make_bigk_host_kernel(onehot_dtype, acc_dtype):
    def kernel(c2g_ref, p2_ref, col_ref, out_ref):
        i = pl.program_id(0)
        g = c2g_ref[i]
        prev_g = jnp.where(i > 0, c2g_ref[jnp.maximum(i - 1, 0)], g - 1)

        @pl.when(g != prev_g)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        p2 = p2_ref[0:1, :].astype(jnp.int32)   # [1, CHUNK]
        col = col_ref[0:1, :].astype(jnp.int32)
        iota_p2 = jax.lax.broadcasted_iota(jnp.int32, (P2, CHUNK), 0)
        iota_nl = jax.lax.broadcasted_iota(jnp.int32, (LANES, CHUNK), 0)
        a_t = (iota_p2 == p2).astype(onehot_dtype)
        b_t = (iota_nl == col).astype(onehot_dtype)
        acc = jax.lax.dot_general(
            a_t, b_t, (((1,), (1,)), ((), ())),
            preferred_element_type=acc_dtype,
        )
        out_ref[0] += acc.astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_groups", "oh", "acc"))
def run_bigk_host(c2g, p2_rows, col_rows, *, n_groups, oh, acc):
    n_chunks = len(c2g)
    ev_spec = pl.BlockSpec((1, CHUNK), lambda i, ref: (i, 0))
    return pl.pallas_call(
        make_bigk_host_kernel(oh, acc),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[ev_spec, ev_spec],
            out_specs=pl.BlockSpec(
                (1, P2, LANES), lambda i, ref: (ref[i], 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((n_groups, P2, LANES), jnp.int32),
    )(c2g, p2_rows, col_rows)


# variant: planes shipped as [8, CHUNK] sublane-replicated rows; device
# expands [8, K] -> [128, K] via a layout-preserving reshape of a
# broadcast (vreg copies, no per-row extraction), then ONE K=CHUNK dot.
def make_rep8_kernel(onehot_dtype, acc_dtype, chunk=CHUNK):
    CHUNK = chunk
    def kernel(c2g_ref, p2_ref, col_ref, out_ref):
        i = pl.program_id(0)
        g = c2g_ref[i]
        prev_g = jnp.where(i > 0, c2g_ref[jnp.maximum(i - 1, 0)], g - 1)

        @pl.when(g != prev_g)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        p28 = p2_ref[:].astype(jnp.int32)    # [8, CHUNK] replicated rows
        col8 = col_ref[:].astype(jnp.int32)
        p2b = jnp.broadcast_to(
            p28[None, :, :], (16, 8, CHUNK)
        ).reshape(128, CHUNK)
        colb = jnp.broadcast_to(
            col8[None, :, :], (16, 8, CHUNK)
        ).reshape(128, CHUNK)
        iota_p2 = jax.lax.broadcasted_iota(jnp.int32, (P2, CHUNK), 0)
        iota_nl = jax.lax.broadcasted_iota(jnp.int32, (LANES, CHUNK), 0)
        a_t = (iota_p2 == p2b).astype(onehot_dtype)
        b_t = (iota_nl == colb).astype(onehot_dtype)
        if os.environ.get("LAB_NO_DOT") == "1":
            # ablation: constructions only, trivial reduce
            acc = (
                a_t[:, :LANES].astype(acc_dtype)
                + b_t[:, :LANES].astype(acc_dtype)
            )
        elif os.environ.get("LAB_NO_CONSTRUCT") == "1":
            # ablation: dot only, constant operands
            a_c = (iota_p2 < 1).astype(onehot_dtype)
            b_c = (iota_nl < 1).astype(onehot_dtype)
            acc = jax.lax.dot_general(
                a_c, b_c, (((1,), (1,)), ((), ())),
                preferred_element_type=acc_dtype,
            ) * p2b[0, 0].astype(acc_dtype)
        else:
            acc = jax.lax.dot_general(
                a_t, b_t, (((1,), (1,)), ((), ())),
                preferred_element_type=acc_dtype,
            )
        out_ref[0] += acc.astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_groups", "oh", "acc", "chunk"))
def run_rep8(c2g, p2_rep, col_rep, *, n_groups, oh, acc, chunk=CHUNK):
    n_chunks = len(c2g)
    ev_spec = pl.BlockSpec((8, chunk), lambda i, ref: (i, 0))
    return pl.pallas_call(
        make_rep8_kernel(oh, acc, chunk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[ev_spec, ev_spec],
            out_specs=pl.BlockSpec(
                (1, P2, LANES), lambda i, ref: (ref[i], 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((n_groups, P2, LANES), jnp.int32),
    )(c2g, p2_rep, col_rep)


def pack_events_u8(c2g, p2, col, valid, n_groups):
    """[n_chunks*2*CR, LANES] u8: per chunk, CR rows of p2 then CR rows of
    col (255 = invalid); plus per-group (count, start) scalar metadata."""
    n_chunks = len(c2g)
    p2r = p2.reshape(n_chunks, CR, LANES)
    colr = col.reshape(n_chunks, CR, LANES)
    vr = valid.reshape(n_chunks, CR, LANES)
    colu = np.where(vr != 0, colr, 255).astype(np.uint8)
    packed = np.concatenate(
        [p2r.astype(np.uint8), colu], axis=1
    ).reshape(n_chunks * 2 * CR, LANES)
    gcnt = np.bincount(c2g, minlength=n_groups).astype(np.int32)
    gstart = np.zeros(n_groups, dtype=np.int32)
    gstart[1:] = np.cumsum(gcnt)[:-1]
    gmeta = np.concatenate([gcnt, gstart]).astype(np.int32)
    return gmeta, packed, int(gcnt.max())


def main():
    rng = np.random.default_rng(7)
    m = 2
    n = 64 * 65536
    p = 100_000
    rpos = rng.integers(0, p, n).astype(np.int32)
    strand = rng.integers(0, 2, n).astype(np.int32)
    base32 = rng.integers(0, 4, n).astype(np.int32)
    probs = rng.random((n, m), dtype=np.float32)
    plan, c2g, p2, colb, valid, base_s, probs_s, visited = prepare_events(
        rpos, strand, base32, probs, p, m
    )
    # emulate the counter/col step with a DETERMINISTIC per-event counter
    # (a function of the event content, so every chunking agrees)
    km = 1 + 4 * (m + 1)

    def counters_for(p2_arr, colb_arr, valid_arr, kc_):
        # recover (winpos, strand, window) from the packed planes and
        # derive a spread-out counter
        return ((p2_arr * 13 + colb_arr // kc_) % km).astype(np.int32)

    counter = counters_for(p2, colb, valid, plan["kc"])
    col = colb + counter
    c2g_d = jax.device_put(c2g)
    p2_d = jax.device_put(p2)
    col_d = jax.device_put(col)
    valid_d = jax.device_put(valid.astype(np.int32))
    n_groups = plan["n_groups"]

    def rep8_prod(plane, fill=None):
        pr = plane.reshape(len(c2g), CHUNK)
        if fill is not None:
            pr = np.where(valid.reshape(len(c2g), CHUNK) != 0, pr, fill)
        return np.repeat(
            pr.reshape(len(c2g), 1, CHUNK).astype(np.uint8), 8, axis=1
        ).reshape(len(c2g) * 8, CHUNK)

    p2r_prod = jax.device_put(rep8_prod(p2))
    colr_prod = jax.device_put(rep8_prod(col, fill=255))
    want = np.asarray(
        _count_call(
            c2g_d, p2r_prod, colr_prod, n_groups=n_groups, interpret=False
        )
    )

    def oracle(plan_, c2g_, chunk_, p2_, col_, valid_):
        ng = plan_["n_groups"]
        grp = np.repeat(np.asarray(c2g_, np.int64), chunk_)
        v = valid_ != 0
        key = (grp[v] * (P2 * LANES)
               + p2_[v].astype(np.int64) * LANES + col_[v].astype(np.int64))
        return np.bincount(key, minlength=ng * P2 * LANES).astype(
            np.int32).reshape(ng, P2, LANES)

    assert np.array_equal(want, oracle(plan, c2g, CHUNK, p2, col, valid))

    def check(got):
        ok = np.array_equal(np.asarray(got), want)
        return "equal" if ok else "MISMATCH"

    dt = _timeit(
        lambda: _count_call(
            c2g_d, p2r_prod, colr_prod, n_groups=n_groups, interpret=False
        )
    )
    print(f"current rep8-int8     : {n / dt / 1e9:.2f} Geps "
          "(enqueue-only timing; see tools/true_bench.py)")

    todo = sys.argv[1:] or [
        "bf16x2", "bf16x4", "int8x1", "int8x4", "bigk-bf16", "bigk-int8",
    ]
    for name in todo:
        try:
            if name.startswith("rep8"):
                oh = jnp.int8 if "int8" in name else jnp.bfloat16
                accdt = jnp.int32 if "int8" in name else jnp.float32
                chunk = CHUNK
                if "-c" in name:
                    chunk = int(name.rsplit("-c", 1)[1])
                import modkit_tpu.ops.pallas_counts as _pc
                oc, ocr = _pc.CHUNK, _pc.CR
                try:
                    _pc.CHUNK, _pc.CR = chunk, chunk // LANES
                    (plan2, c2g2, p22, colb2, valid2, _bs, _ps, _vis) = (
                        prepare_events(rpos, strand, base32, probs, p, m)
                    )
                finally:
                    _pc.CHUNK, _pc.CR = oc, ocr
                col2 = colb2 + counters_for(
                    p22, colb2, valid2, plan2["kc"]
                )
                n_chunks = len(c2g2)
                p2_r = np.repeat(
                    p22.reshape(n_chunks, 1, chunk).astype(np.uint8), 8,
                    axis=1,
                ).reshape(n_chunks * 8, chunk)
                col_r = np.repeat(
                    np.where(
                        valid2.reshape(n_chunks, 1, chunk) != 0,
                        col2.reshape(n_chunks, 1, chunk), 255
                    ).astype(np.uint8), 8, axis=1,
                ).reshape(n_chunks * 8, chunk)
                c2g2_d = jax.device_put(c2g2)
                p2r_d = jax.device_put(p2_r)
                colr_d = jax.device_put(col_r)
                fn = lambda: run_rep8(
                    c2g2_d, p2r_d, colr_d, n_groups=plan2["n_groups"],
                    oh=oh, acc=accdt, chunk=chunk,
                )
                got = fn()
                want2 = oracle(plan2, c2g2, chunk, p22, col2, valid2)
                eq = ("equal" if np.array_equal(np.asarray(got), want2)
                      else "MISMATCH")
                dt = _timeit(fn)
                npad = n_chunks * chunk
                print(f"{name:22s}: {n / dt / 1e9:.2f} Geps  [{eq}] "
                      f"(padded {npad / n:.2f}x)")
                continue
            if name.startswith("bigkh"):
                oh = jnp.int8 if "int8" in name else jnp.bfloat16
                accdt = jnp.int32 if "int8" in name else jnp.float32
                n_chunks = len(c2g)
                # [n_chunks, CHUNK] u8 rows, invalid col -> 255
                p2_rows = p2.reshape(n_chunks, CHUNK).astype(np.uint8)
                col_rows = np.where(
                    valid.reshape(n_chunks, CHUNK) != 0,
                    col.reshape(n_chunks, CHUNK), 255
                ).astype(np.uint8)
                p2r_d = jax.device_put(p2_rows)
                colr_d = jax.device_put(col_rows)
                fn = lambda: run_bigk_host(
                    c2g_d, p2r_d, colr_d, n_groups=n_groups, oh=oh,
                    acc=accdt,
                )
                got = fn()
                eq = check(got)
                dt = _timeit(fn)
                print(f"{name:22s}: {n / dt / 1e9:.2f} Geps  [{eq}]")
                continue
            if name.startswith("group"):
                oh = jnp.int8 if "int8" in name else jnp.bfloat16
                accdt = jnp.int32 if "int8" in name else jnp.float32
                gmeta, packed, mx = pack_events_u8(
                    c2g, p2, col, valid, n_groups
                )
                gmeta_d = jax.device_put(gmeta)
                packed_d = jax.device_put(packed)
                n_acc = int(name.split("x")[1]) if "x" in name else 1
                fn = lambda: run_group(
                    gmeta_d, packed_d, n_groups=n_groups, oh=oh,
                    acc=accdt, max_chunks=mx, n_acc=n_acc,
                )
                got = fn()
                eq = check(got)
                dt = _timeit(fn)
                print(f"{name:22s}: {n / dt / 1e9:.2f} Geps  [{eq}]")
                continue
            if name in ("empty", "onehot-only", "matmul-only", "a-only"):
                fn = lambda: run_diag(
                    c2g_d, p2_d, col_d, valid_d, n_groups=n_groups,
                    mode=name,
                )
                dt = _timeit(fn)
                print(f"{name:22s}: {n / dt / 1e9:.2f} Geps  [diag]")
                continue
            if name.startswith("bigk"):
                oh = jnp.bfloat16 if "bf16" in name else jnp.int8
                acc = jnp.float32 if "bf16" in name else jnp.int32
                fn = lambda: run_bigk(
                    c2g_d, p2_d, col_d, valid_d, n_groups=n_groups,
                    oh=oh, acc=acc,
                )
            else:
                oh = jnp.bfloat16 if name.startswith("bf16") else jnp.int8
                acc = jnp.float32 if name.startswith("bf16") else jnp.int32
                n_acc = int(name.split("x")[1])
                fn = lambda: run_variant(
                    c2g_d, p2_d, col_d, valid_d, n_groups=n_groups,
                    acc=acc, oh=oh, n_acc=n_acc,
                )
            got = fn()
            eq = check(got)
            dt = _timeit(fn)
            print(f"{name:22s}: {n / dt / 1e9:.2f} Geps  [{eq}]")
        except Exception as e:
            print(f"{name:22s}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
