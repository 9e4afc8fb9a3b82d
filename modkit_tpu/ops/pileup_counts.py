"""Device kernels: threshold calling + per-position pileup count aggregation.

This is the TPU-native replacement for the reference's per-read/per-column
hot loops (``threshold_mod_caller.rs:28`` call, ``pileup/mod.rs:238``
FeatureVector::add_feature, ``pileup/mod.rs:763-974`` column loop). Instead
of a per-column pileup engine, the host emits flat *event* arrays per genome
tile and one fused jit kernel computes the thresholded call per event and
scatter-adds one-hot counters into the tile's count tensor.

Count-tensor layout per (position, strand): ``K = 6 + 4 * (M + 1)`` int32
counters for an M-code vocabulary:

    0                      n_delete
    1                      n_filtered
    2 + b                  n_nocall for primary base b (ACGT)
    6 + b*(M+1) + 0        n_canonical for base b
    6 + b*(M+1) + 1 + j    n_mod for base b, mod code j

Event encoding:
    ev_type 0 = mod-call candidate (probs row is live)
    ev_type 1 = nocall
    ev_type 2 = delete

Call semantics match MultipleThresholdModCaller::call: a mod class passes if
``p >= threshold(code, base)``; canonical passes if ``1 - sum(p) >=
threshold(base)``; winner = max-probability passing candidate with canonical
winning ties; no candidate -> Filtered. Tie between two mod classes resolves
to the higher code-column index (candidate insertion order approximation).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# padding buckets to bound jit recompiles; the floor is 64k events — a
# compile over a tunneled chip costs 20-100 s while padding a tiny event
# set to 64k costs <1 ms of transfer, so fewer shapes wins (r3 weak #2:
# 780 s forced-device warm-up from 6x6 shape buckets). Round 5: 3 buckets
# (one fewer cold compile), with 2^21 sized so the 100 kb tile at 25x
# (~1.25 M events) pads 1.7x instead of the old 1<<20->1<<22 cliff's 3.4x
_EVENT_BUCKETS = (1 << 16, 1 << 21, 1 << 22)


def round_up_events(n: int) -> int:
    for b in _EVENT_BUCKETS:
        if n <= b:
            return b
    return ((n + _EVENT_BUCKETS[-1] - 1) // _EVENT_BUCKETS[-1]) * _EVENT_BUCKETS[-1]


_POS_BUCKETS = (32, 256, 2048, 16_384, 100_000, 1_000_000)


def round_up_positions(n: int) -> int:
    for b in _POS_BUCKETS:
        if n <= b:
            return b
    return ((n + _POS_BUCKETS[-1] - 1) // _POS_BUCKETS[-1]) * _POS_BUCKETS[-1]


def round_up_codes(m: int) -> int:
    for b in (1, 2, 4, 8):
        if m <= b:
            return b
    return m


def threshold_states(probs, base_idx, thr_mod, thr_can):
    """Per-event call state: 0 = filtered, 1 = canonical, 2+j = mod code j.

    probs: f32 [N, M] with -1 for absent classes; base_idx: i32 [N];
    thr_mod: f32 [M, 4]; thr_can: f32 [4]. Also returns canonical prob.

    The best-passing-class selection is a sequential column loop (M is
    small) with >= keeping the later class — the Rust Iterator::max
    tie-break — in pure elementwise ops: the argmax + take_along_axis
    formulation lowered to a TPU gather that dominated the whole count
    pipeline (~100 ms per 4 Mevent tile vs ~3 ms for everything else).
    """
    m = probs.shape[1]
    present = probs >= 0
    canon_p = jnp.float32(1.0) - jnp.sum(
        jnp.where(present, probs, 0.0), axis=1
    )
    n = probs.shape[0]

    def thr_for(row):
        # 4-entry table -> per-event via selects: indexing a table with
        # base_idx lowers to a TPU gather, which dominated the whole
        # device count pipeline (~16 ms / 4 Mevent vs ~4 ms of matmuls)
        t = jnp.full((n,), row[0], jnp.float32)
        for b in (1, 2, 3):
            t = jnp.where(base_idx == b, row[b], t)
        return t

    best_p = jnp.full((n,), -jnp.inf, probs.dtype)
    best_j = jnp.zeros((n,), jnp.int32)
    any_mod = jnp.zeros((n,), bool)
    for j in range(m):
        pass_j = present[:, j] & (
            probs[:, j] >= thr_for([thr_mod[j, b] for b in range(4)])
        )
        mp = jnp.where(pass_j, probs[:, j], -jnp.inf)
        take = mp >= best_p  # later equal class wins ties
        best_p = jnp.where(take, mp, best_p)
        best_j = jnp.where(take, j, best_j)
        any_mod = any_mod | pass_j
    pass_can = canon_p >= thr_for([thr_can[b] for b in range(4)])
    choose_can = pass_can & ((~any_mod) | (canon_p >= best_p))
    state = jnp.where(
        choose_can,
        1,
        jnp.where(any_mod, 2 + best_j, 0),
    )
    return state, canon_p


@functools.partial(
    jax.jit, static_argnames=("num_positions", "num_codes")
)
def modcall_count_kernel(
    rpos,  # i32 [N] tile-relative reference position
    strand,  # i32 [N] tally strand after strand-rule routing (0 +, 1 -)
    base_idx,  # i32 [N] primary/count base (ACGT = 0..3)
    probs,  # f32 [N, M]
    valid,  # bool [N]
    thr_mod,  # f32 [M, 4]
    thr_can,  # f32 [4]
    *,
    num_positions: int,
    num_codes: int,
):
    """Fused threshold-call + scatter-add over sparse mod-call candidates.

    Only probability-bearing events reach the device (nocall/delete coverage
    histograms are host-side bincounts); output layout per (position,
    strand) is ``Km = 1 + 4 * (M + 1)``:

        0                  n_filtered
        1 + b*(M+1) + 0    n_canonical for base b
        1 + b*(M+1) + 1+j  n_mod for base b, mod code j
    """
    m = num_codes
    km = 1 + 4 * (m + 1)
    state, _ = threshold_states(probs, base_idx, thr_mod, thr_can)
    counter = jnp.where(state == 0, 0, 1 + base_idx * (m + 1) + (state - 1))
    flat = (rpos * 2 + strand) * km + counter
    flat = jnp.where(valid, flat, 0)
    counts = jnp.zeros((num_positions * 2 * km,), jnp.int32).at[flat].add(
        valid.astype(jnp.int32)
    )
    return counts.reshape(num_positions, 2, km)


_PALLAS_COUNTS_OK: bool | None = None


def _use_pallas_counts() -> bool:
    """Pallas one-hot-matmul counting on real TPU backends (opt-out with
    MODKIT_TPU_PALLAS_COUNTS=0); XLA scatter elsewhere (CPU interpret
    would be far slower than the scatter)."""
    global _PALLAS_COUNTS_OK
    if _PALLAS_COUNTS_OK is None:
        if os.environ.get("MODKIT_TPU_PALLAS_COUNTS") == "0":
            _PALLAS_COUNTS_OK = False
        else:
            _PALLAS_COUNTS_OK = jax.default_backend() not in ("cpu",)
    return _PALLAS_COUNTS_OK


def device_putter(device=None):
    """Array placement function: committed transfer to ``device`` when
    given (jit then executes on that device — the tiles-axis round-robin
    of SURVEY §2.5), default placement otherwise."""
    if device is None:
        return jnp.asarray
    return lambda a: jax.device_put(a, device)


def dispatch_modcall_counts(
    rpos: np.ndarray,
    strand: np.ndarray,
    base_idx: np.ndarray,
    probs: np.ndarray,
    thr_mod: np.ndarray,
    thr_can: np.ndarray,
    num_positions: int,
    device=None,
):
    """Pad events/positions/codes to buckets (bounding jit specializations)
    and dispatch the mod-call kernel WITHOUT blocking: returns the in-flight
    device array [p_pad, 2, Km(m_pad)] (m_pad = round_up_codes(m)) so the
    host can overlap work with device compute + D2H transfer. Materialize
    with ``np.asarray(out)[:num_positions]``. ``device`` pins the dispatch
    to one local device (multi-device tile round-robin)."""
    n = len(rpos)
    m = probs.shape[1] if probs.ndim == 2 else 1
    m_pad = round_up_codes(max(m, 1))
    km = 1 + 4 * (m_pad + 1)
    if n == 0:
        return np.zeros((num_positions, 2, km), dtype=np.int32)
    if _use_pallas_counts():
        # TPU device counting runs the one-hot-matmul Pallas kernel
        # (ops/pallas_counts.py — the SURVEY §7 pileup_scatter): the XLA
        # scatter-add below serializes at ~1% of the HBM copy bound
        from .pallas_counts import modcall_counts_pallas

        probs_p = np.pad(
            probs, ((0, 0), (0, m_pad - m)), constant_values=-1.0
        ).astype(np.float32)
        thr_mod_p = np.pad(thr_mod[:m], ((0, m_pad - m), (0, 0)))
        return modcall_counts_pallas(
            np.ascontiguousarray(rpos.astype(np.int32)),
            strand.astype(np.int32), base_idx.astype(np.int32), probs_p,
            thr_mod_p.astype(np.float32), thr_can.astype(np.float32),
            num_positions, bucket_chunks=True,
        )
    p_pad = round_up_positions(num_positions)
    nb = round_up_events(n)
    pad = nb - n
    put = device_putter(device)

    def pad1(a):
        return np.pad(a, (0, pad))

    probs_p = np.pad(
        probs, ((0, pad), (0, m_pad - m)), constant_values=-1.0
    )
    thr_mod_p = np.pad(thr_mod[:m], ((0, m_pad - m), (0, 0)))
    valid = np.zeros(nb, dtype=bool)
    valid[:n] = True
    return modcall_count_kernel(
        put(pad1(rpos).astype(np.int32)),
        put(pad1(strand).astype(np.int32)),
        put(pad1(base_idx).astype(np.int32)),
        put(probs_p.astype(np.float32)),
        put(valid),
        put(thr_mod_p.astype(np.float32)),
        put(thr_can.astype(np.float32)),
        num_positions=p_pad,
        num_codes=m_pad,
    )


def run_modcall_counts(
    rpos: np.ndarray,
    strand: np.ndarray,
    base_idx: np.ndarray,
    probs: np.ndarray,
    thr_mod: np.ndarray,
    thr_can: np.ndarray,
    num_positions: int,
) -> np.ndarray:
    """Blocking wrapper over dispatch_modcall_counts."""
    out = dispatch_modcall_counts(
        rpos, strand, base_idx, probs, thr_mod, thr_can, num_positions
    )
    return np.asarray(out)[:num_positions]


def modcall_counts_numpy(
    rpos, strand, base_idx, probs, thr_mod, thr_can, p, m
) -> np.ndarray:
    """Pure-numpy oracle of modcall_count_kernel (tests / host fallback)."""
    km = 1 + 4 * (m + 1)
    if len(rpos) == 0:
        return np.zeros((p, 2, km), dtype=np.int32)
    present = probs >= 0
    thr_e = thr_mod.T[base_idx]
    pass_mod = present & (probs >= thr_e)
    canon_p = np.float32(1.0) - np.where(present, probs, 0).sum(
        axis=1, dtype=np.float32
    )
    pass_can = canon_p >= thr_can[base_idx]
    mod_p = np.where(pass_mod, probs, -np.inf)
    rev_arg = (m - 1) - np.argmax(mod_p[:, ::-1], axis=1)
    best_p = np.take_along_axis(mod_p, rev_arg[:, None], axis=1)[:, 0]
    any_mod = pass_mod.any(axis=1)
    choose_can = pass_can & ((~any_mod) | (canon_p >= best_p))
    state = np.where(choose_can, 1, np.where(any_mod, 2 + rev_arg, 0))
    counter = np.where(state == 0, 0, 1 + base_idx * (m + 1) + (state - 1))
    flat = (rpos.astype(np.int64) * 2 + strand) * km + counter
    counts = np.bincount(flat, minlength=p * 2 * km).astype(np.int32)
    return counts.reshape(p, 2, km)


@jax.jit
def threshold_state_from_quals(
    quals,  # u8 [N, M] ML qualities
    present_bits,  # u8 [N] bitmask: class j present at event i
    zero_bits,  # u8 [N] bitmask: prob is exactly 0.0 (inferred canonical)
    base_idx,  # u8 [N]
    thr_mod,  # f32 [M, 4]
    thr_can,  # f32 [4]
):
    """Per-event threshold-call state from compact u8 inputs.

    Reconstructs probs = (q + 0.5)/256 (exact in f32, mod_bam.rs:808) or
    0.0 per the bitmasks, then applies MultipleThresholdModCaller::call.
    Returns u8 state: 0 filtered, 1 canonical, 2+j mod code j. The
    histogram over states runs host-side (native mk_bincount_states) so
    only one byte per event returns over the device link.
    """
    m = quals.shape[1]
    j = jnp.arange(m, dtype=jnp.uint8)
    present = ((present_bits[:, None] >> j) & 1).astype(bool)
    zero = ((zero_bits[:, None] >> j) & 1).astype(bool)
    p = (quals.astype(jnp.float32) + jnp.float32(0.5)) / jnp.float32(256.0)
    probs = jnp.where(
        present, jnp.where(zero, jnp.float32(0.0), p), jnp.float32(-1.0)
    )
    state, _ = threshold_states(
        probs, base_idx.astype(jnp.int32), thr_mod, thr_can
    )
    return state.astype(jnp.uint8)


@jax.jit
def threshold_state_f32(probs, base_idx, thr_mod, thr_can):
    """Per-event threshold-call state from f32 probs (collapse/merged
    fallback of threshold_state_from_quals)."""
    state, _ = threshold_states(
        probs, base_idx.astype(jnp.int32), thr_mod, thr_can
    )
    return state.astype(jnp.uint8)


@functools.partial(
    jax.jit, static_argnames=("num_positions", "num_codes")
)
def pileup_count_kernel(
    rpos,  # i32 [N] tile-relative reference position
    strand,  # i32 [N] output strand after strand-rule routing (0 +, 1 -)
    base_idx,  # i32 [N] primary/count base (ACGT = 0..3)
    ev_type,  # i32 [N] 0 modcall / 1 nocall / 2 delete
    probs,  # f32 [N, M]
    valid,  # bool [N]
    thr_mod,  # f32 [M, 4]
    thr_can,  # f32 [4]
    *,
    num_positions: int,
    num_codes: int,
):
    """Fused threshold-call + scatter-add count aggregation for one tile."""
    m = num_codes
    k = 6 + 4 * (m + 1)
    state, _ = threshold_states(probs, base_idx, thr_mod, thr_can)
    mod_counter = jnp.where(
        state == 0, 1, 6 + base_idx * (m + 1) + (state - 1)
    )
    counter = jnp.where(
        ev_type == 0, mod_counter, jnp.where(ev_type == 1, 2 + base_idx, 0)
    )
    flat = (rpos * 2 + strand) * k + counter
    flat = jnp.where(valid, flat, 0)
    w = valid.astype(jnp.int32)
    counts = jnp.zeros((num_positions * 2 * k,), jnp.int32).at[flat].add(w)
    return counts.reshape(num_positions, 2, k)


def run_pileup_counts(
    rpos: np.ndarray,
    strand: np.ndarray,
    base_idx: np.ndarray,
    ev_type: np.ndarray,
    probs: np.ndarray,
    thr_mod: np.ndarray,
    thr_can: np.ndarray,
    num_positions: int,
) -> np.ndarray:
    """Host wrapper: pad events/positions/codes to buckets (bounding jit
    specializations), run the kernel, return numpy counts
    [num_positions, 2, K(m_pad)] where m_pad = round_up_codes(m)."""
    n = len(rpos)
    m = probs.shape[1] if probs.ndim == 2 else 1
    m_pad = round_up_codes(max(m, 1))
    k = 6 + 4 * (m_pad + 1)
    if n == 0:
        return np.zeros((num_positions, 2, k), dtype=np.int32)
    p_pad = round_up_positions(num_positions)
    nb = round_up_events(n)
    pad = nb - n

    def pad1(a, fill=0):
        return np.pad(a, (0, pad), constant_values=fill)

    probs_p = np.pad(
        probs, ((0, pad), (0, m_pad - m)), constant_values=-1.0
    )
    thr_mod_p = np.pad(thr_mod[:m], ((0, m_pad - m), (0, 0)))
    valid = np.zeros(nb, dtype=bool)
    valid[:n] = True
    out = pileup_count_kernel(
        jnp.asarray(pad1(rpos).astype(np.int32)),
        jnp.asarray(pad1(strand).astype(np.int32)),
        jnp.asarray(pad1(base_idx).astype(np.int32)),
        jnp.asarray(pad1(ev_type).astype(np.int32)),
        jnp.asarray(probs_p.astype(np.float32)),
        jnp.asarray(valid),
        jnp.asarray(thr_mod_p.astype(np.float32)),
        jnp.asarray(thr_can.astype(np.float32)),
        num_positions=p_pad,
        num_codes=m_pad,
    )
    return np.asarray(out)[:num_positions]


_PREWARMED: set = set()
_PREWARM_THREADS: list = []
_PREWARM_LOCK = None


def wait_for_prewarm() -> None:
    """Block until every background shape compile has finished (bench
    hygiene: measurements taken right after warm-up would otherwise
    contend with in-flight compiles)."""
    for t in list(_PREWARM_THREADS):
        t.join()


def prewarm_state_kernels(kind: str, m_pad: int) -> None:
    """Concurrently background-compile the OTHER event-bucket shapes of a
    state-kernel flavor once the first device dispatch reveals (kind,
    m_pad). Without this, forced-device warm-up serializes one 20-100 s
    tunneled-chip compile per bucket against the tile stream (BENCH_r03
    dwarm 779.7 s); with it, remaining shapes compile on daemon threads
    (and land in the persistent compilation cache) while tiles flow
    through the already-compiled bucket. kind: 'pallas' | 'quals' | 'f32'.
    """
    global _PREWARM_LOCK
    import threading

    if _PREWARM_LOCK is None:
        _PREWARM_LOCK = threading.Lock()
    key = (kind, m_pad)
    with _PREWARM_LOCK:
        if key in _PREWARMED:
            return
        _PREWARMED.add(key)
    if os.environ.get("MODKIT_TPU_NO_PREWARM") == "1":
        return
    # only worth it where compiles are slow (tunneled/real chips); on the
    # CPU backend compiles are sub-second and daemon threads still alive
    # at interpreter shutdown abort the process (pthread cancellation
    # during C++ unwinding)
    if jax.default_backend() == "cpu":
        return

    def compile_bucket(nb: int) -> None:
        try:
            thr_mod = jnp.zeros((m_pad, 4), jnp.float32)
            thr_can = jnp.zeros(4, jnp.float32)
            if kind == "pallas":
                from .pallas_state import threshold_state_pallas

                z = jnp.zeros(nb, jnp.uint8)
                threshold_state_pallas(
                    jnp.zeros((m_pad, nb), jnp.uint8), z, z, z,
                    thr_mod, thr_can,
                ).block_until_ready()
            elif kind == "quals":
                z = jnp.zeros(nb, jnp.uint8)
                threshold_state_from_quals(
                    jnp.zeros((nb, m_pad), jnp.uint8), z, z, z,
                    thr_mod, thr_can,
                ).block_until_ready()
            else:
                threshold_state_f32(
                    jnp.full((nb, m_pad), -1.0, jnp.float32),
                    jnp.zeros(nb, jnp.uint8), thr_mod, thr_can,
                ).block_until_ready()
        except Exception:
            pass

    for nb in _EVENT_BUCKETS:
        t = threading.Thread(
            target=compile_bucket, args=(nb,), daemon=True
        )
        t.start()
        _PREWARM_THREADS.append(t)


def counts_layout(num_codes: int) -> dict:
    """Index helpers for the counter axis."""
    m = num_codes
    return dict(
        K=6 + 4 * (m + 1),
        DELETE=0,
        FILTERED=1,
        NOCALL=lambda b: 2 + b,
        CANONICAL=lambda b: 6 + b * (m + 1),
        MOD=lambda b, j: 6 + b * (m + 1) + 1 + j,
    )
