"""Benchmark: pileup event throughput of the fused device kernel.

Measures the flagship hot path — threshold calling + per-position count
aggregation — on a synthetic 30x-coverage-style event stream on the real
device, and compares against the single-thread numpy host oracle on this
machine (the CPU fallback implements identical semantics, standing in for
the reference's CPU inner loop; the reference publishes no benchmark
numbers, see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def synth_events(n, m=2, p=100_000, seed=0):
    rng = np.random.default_rng(seed)
    rpos = rng.integers(0, p, size=n).astype(np.int32)
    strand = rng.integers(0, 2, size=n).astype(np.int32)
    base_idx = rng.integers(0, 4, size=n).astype(np.int32)
    ev_type = rng.choice(
        np.array([0, 1, 2], dtype=np.int32), size=n, p=[0.3, 0.65, 0.05]
    )
    probs = np.where(
        rng.random((n, m)) < 0.8,
        rng.random((n, m)).astype(np.float32),
        np.float32(-1.0),
    ).astype(np.float32)
    return rpos, strand, base_idx, ev_type, probs


def main():
    import jax

    from modkit_tpu.ops.pileup_counts import (
        pileup_count_kernel, round_up_codes,
    )
    from modkit_tpu.pileup.engine import _numpy_counts

    n, m, p = 1 << 22, 2, 100_000
    rpos, strand, base_idx, ev_type, probs = synth_events(n, m, p)
    thr_mod = np.full((m, 4), 0.5, np.float32)
    thr_can = np.full(4, 0.5, np.float32)
    valid = np.ones(n, dtype=bool)

    args = (
        jax.device_put(rpos), jax.device_put(strand),
        jax.device_put(base_idx), jax.device_put(ev_type),
        jax.device_put(probs), jax.device_put(valid),
        jax.device_put(thr_mod), jax.device_put(thr_can),
    )
    run = lambda: pileup_count_kernel(
        *args, num_positions=p, num_codes=m
    ).block_until_ready()
    run()  # compile
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    device_eps = n / dt

    # CPU oracle on a subset, single-thread numpy
    sub = 1 << 20
    t0 = time.perf_counter()
    _numpy_counts(
        rpos[:sub], strand[:sub], base_idx[:sub], ev_type[:sub],
        probs[:sub], thr_mod, thr_can, p, m,
    )
    cpu_eps = sub / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "pileup_events_per_s",
        "value": round(device_eps),
        "unit": "events/s",
        "vs_baseline": round(device_eps / cpu_eps, 3),
    }))


if __name__ == "__main__":
    main()
