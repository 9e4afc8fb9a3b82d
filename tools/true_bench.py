"""Fetch-forced device measurement harness.

Discovery (round 5): on this environment's axon backend,
``block_until_ready()`` returns without waiting for execution — a chain
of 20 large matmuls "blocks" in 0.6 ms and then takes minutes when a
value is actually fetched. Every timing here therefore forces execution
by fetching a scalar (a cheap on-device reduction of the output), and
subtracts the measured fetch round-trip (~25 ms). Signal is amplified by
replicating the op inside one jit over independent inputs (anti-CSE).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp


def sync_cost(reps: int = 10) -> float:
    """Round-trip cost of a tiny fetched op."""
    s = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda a: (a + 1.0).sum())
    float(f(s))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(f(s))
    return (time.perf_counter() - t0) / reps


def timed_scalar(fn, *args, reps: int = 5, sync: float | None = None):
    """Mean wall of float(fn(*args)) minus the fetch round-trip."""
    if sync is None:
        sync = sync_cost()
    float(fn(*args))  # warm/compile
    t0 = time.perf_counter()
    for _ in range(reps):
        float(fn(*args))
    dt = (time.perf_counter() - t0) / reps
    return max(dt - sync, 1e-9), sync


def hbm_read_gbps(gb: float = 2.0, reps: int = 5):
    """Streaming-read bandwidth: (a+1).sum() fuses to one read pass."""
    n = int(gb * (1 << 30) / 4)
    x = jnp.zeros(n, jnp.float32)

    f = jax.jit(lambda a: (a + 1.0).sum())
    dt, sync = timed_scalar(f, x, reps=reps)
    return x.nbytes / dt / 1e9, sync


def hbm_copy_gbps(gb: float = 2.0, reps: int = 5):
    """Read+write bandwidth: materialize a+1 AND reduce it (two passes:
    one read of a, one write of y; the sum fuses into the write pass)."""
    n = int(gb * (1 << 30) / 4)
    x = jnp.zeros(n, jnp.float32)

    @jax.jit
    def f(a):
        y = a + 1.0
        return y.sum(), y

    float(f(x)[0])
    sync = sync_cost()
    t0 = time.perf_counter()
    reps_done = 0
    for _ in range(reps):
        float(f(x)[0])
        reps_done += 1
    dt = max((time.perf_counter() - t0) / reps_done - sync, 1e-9)
    return 2.0 * x.nbytes / dt / 1e9


def mxu_tflops(k: int = 4096, reps: int = 5):
    a = jnp.ones((k, k), jnp.bfloat16)
    b = jnp.ones((k, k), jnp.bfloat16) * 0.5

    @jax.jit
    def f(a, b):
        return (a @ b).sum()

    dt, _ = timed_scalar(f, a, b, reps=reps)
    return 2 * k**3 / dt / 1e12


def main():
    s = sync_cost()
    print(f"fetch round-trip: {s * 1e3:.2f} ms")
    rd, _ = hbm_read_gbps()
    print(f"HBM read: {rd:.0f} GB/s")
    cp = hbm_copy_gbps()
    print(f"HBM copy (r+w): {cp:.0f} GB/s")
    print(f"MXU bf16: {mxu_tflops():.1f} TFLOP/s")


if __name__ == "__main__":
    main()
