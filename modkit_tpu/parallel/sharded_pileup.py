"""Sharded pileup counting over a device mesh.

Mesh axes:
  ``tiles``   — data parallelism over genome tiles (the reference's rayon
                fan-out over MultiChromCoordinates, pileup/mod.rs:684).
  ``readers`` — reads of one tile split across devices; partial count
                tensors are merged with ``psum`` over this axis (the
                reference's Moniod reduce, monoid.rs:5).

Each device runs the fused threshold-call + scatter-add kernel on its local
event shard; psum over ``readers`` yields the complete per-tile counts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.pileup_counts import threshold_states


def make_mesh(n_tiles: int, n_readers: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    devices = devices[: n_tiles * n_readers].reshape(n_tiles, n_readers)
    return Mesh(devices, ("tiles", "readers"))


def _local_counts(rpos, strand, base_idx, ev_type, probs, valid,
                  thr_mod, thr_can, num_positions: int, num_codes: int):
    m = num_codes
    k = 6 + 4 * (m + 1)
    state, _ = threshold_states(probs, base_idx, thr_mod, thr_can)
    mod_counter = jnp.where(state == 0, 1, 6 + base_idx * (m + 1) + (state - 1))
    counter = jnp.where(
        ev_type == 0, mod_counter, jnp.where(ev_type == 1, 2 + base_idx, 0)
    )
    flat = jnp.where(valid, (rpos * 2 + strand) * k + counter, 0)
    w = valid.astype(jnp.int32)
    counts = jnp.zeros((num_positions * 2 * k,), jnp.int32).at[flat].add(w)
    return counts.reshape(num_positions, 2, k)


def make_sharded_pileup_step(
    mesh: Mesh, num_positions: int, num_codes: int
):
    """Build a jitted sharded step.

    Inputs are [T, R, E(, M)] arrays sharded (tiles, readers) on the leading
    axes; output is per-tile complete counts [T, num_positions, 2, K]
    sharded over ``tiles`` and replicated over ``readers``.
    """

    def per_device(rpos, strand, base_idx, ev_type, probs, valid,
                   thr_mod, thr_can):
        # shard_map gives block-local arrays with leading dims 1, 1
        local = _local_counts(
            rpos[0, 0], strand[0, 0], base_idx[0, 0], ev_type[0, 0],
            probs[0, 0], valid[0, 0], thr_mod, thr_can,
            num_positions, num_codes,
        )
        # merge partial counts from all readers of this tile (ICI psum)
        merged = jax.lax.psum(local, axis_name="readers")
        return merged[None]

    ev_spec = P("tiles", "readers")
    step = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(ev_spec,) * 6 + (P(), P()),
        out_specs=P("tiles"),
    )
    return jax.jit(step)


def run_sharded_pileup(
    mesh: Mesh,
    rpos: np.ndarray,  # [T, R, E]
    strand: np.ndarray,
    base_idx: np.ndarray,
    ev_type: np.ndarray,
    probs: np.ndarray,  # [T, R, E, M]
    valid: np.ndarray,
    thr_mod: np.ndarray,
    thr_can: np.ndarray,
    num_positions: int,
) -> np.ndarray:
    """Convenience wrapper: place sharded inputs and run one step."""
    m = probs.shape[-1]
    step = make_sharded_pileup_step(mesh, num_positions, m)
    shard = NamedSharding(mesh, P("tiles", "readers"))
    rep = NamedSharding(mesh, P())
    args = [
        jax.device_put(np.asarray(a, dtype=d), shard)
        for a, d in (
            (rpos, np.int32), (strand, np.int32), (base_idx, np.int32),
            (ev_type, np.int32), (probs, np.float32), (valid, bool),
        )
    ]
    out = step(
        *args,
        jax.device_put(thr_mod.astype(np.float32), rep),
        jax.device_put(thr_can.astype(np.float32), rep),
    )
    return np.asarray(out)
