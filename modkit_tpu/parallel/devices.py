"""Device selection + multi-host initialization for production engines.

Single host: genome tiles dispatch round-robin across all local devices
(the tiles axis of SURVEY §2.5 — the reference's rayon interval fan-out,
pileup/mod.rs:684, mapped onto chips instead of threads). Multi-host: an
optional jax.distributed init from environment variables, after which each
process owns tiles where tile_index % process_count == process_index and
writes its own genome-ordered output shard (the built-in replacement for
the reference's manual --region sharding + external merge,
book/src/perf_considerations.md:3-9).
"""

from __future__ import annotations

import os

_devices_cache: list | None = None
_comp_cache_set = False


def enable_compilation_cache() -> None:
    """Point XLA at a persistent compilation cache so kernel compiles
    (slow over a tunneled chip: ~20 s each) are paid once per shape, not
    once per process. Respects JAX_COMPILATION_CACHE_DIR; defaults to
    ~/.cache/modkit_tpu/jax. Disable with MODKIT_TPU_NO_COMPILE_CACHE=1."""
    global _comp_cache_set
    if _comp_cache_set or os.environ.get("MODKIT_TPU_NO_COMPILE_CACHE"):
        return
    _comp_cache_set = True
    import jax

    d = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "modkit_tpu", "jax"
    )
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def compute_devices() -> list:
    """Local devices used for round-robin tile dispatch.

    ``MODKIT_TPU_DEVICES=N`` caps the count (used by tests to compare
    1-device vs N-device output byte-for-byte).
    """
    global _devices_cache
    if _devices_cache is None:
        import jax

        devs = list(jax.local_devices())
        cap = os.environ.get("MODKIT_TPU_DEVICES")
        if cap:
            devs = devs[: max(1, int(cap))]
        _devices_cache = devs
    return _devices_cache


def reset_devices_cache() -> None:
    global _devices_cache
    _devices_cache = None


_bw_cache: float | None = None


def link_bandwidth_bytes_per_s() -> float:
    """Measured host->device transfer bandwidth (one 4 MiB probe, cached).

    Drives the adaptive offload policy: pileup counting is a
    bandwidth-bound histogram (~6.5 B/event up, 1 B/event down, ~1 Gevent/s
    on-chip), so the offload only pays when the link moves bytes faster
    than the host's C++ counting path consumes events (~30 M events/s).
    PCIe-attached chips (GB/s) always qualify; a network-tunnelled chip
    (~50 MB/s) does not, and counting stays host-side while the device
    keeps the compute-heavy kernels (DMR likelihoods, entropy, percentile).
    """
    global _bw_cache
    if _bw_cache is None:
        import time

        import jax
        import numpy as np

        buf = np.zeros(1 << 22, dtype=np.uint8)
        jax.device_put(buf[: 1 << 14]).block_until_ready()  # warm the path
        t0 = time.perf_counter()
        jax.device_put(buf).block_until_ready()
        dt = time.perf_counter() - t0
        _bw_cache = float(len(buf)) / max(dt, 1e-9)
    return _bw_cache


# fallback host throughput guess (events/s) when the native library (and
# hence the measured probe) is unavailable; override with
# MODKIT_TPU_HOST_EVENT_RATE
_HOST_EVENT_RATE_FALLBACK = 30e6
_host_rate_cache: float | None = None
_policy_logged = False


def host_event_rate() -> float:
    """Host threshold+count throughput (events/s), self-calibrated: one
    ~1 Mevent synthetic probe through the exact native hot loops
    (mk_bench_event_rate), cached for the process. Env override
    MODKIT_TPU_HOST_EVENT_RATE wins; falls back to a conservative guess
    when the native library is unavailable."""
    global _host_rate_cache
    override = os.environ.get("MODKIT_TPU_HOST_EVENT_RATE")
    if override:
        return float(override)
    if _host_rate_cache is None:
        from .. import native

        measured = native.bench_event_rate()
        _host_rate_cache = (
            measured if measured else _HOST_EVENT_RATE_FALLBACK
        )
    return _host_rate_cache


def offload_events_to_device(n_events: int, bytes_per_event: float) -> bool:
    """Adaptive offload policy for transfer-bound event batches.

    MODKIT_TPU_OFFLOAD=always|never|auto (default auto): in auto mode the
    device wins when its transfer time beats 2x the host counting time
    (the 2x credits the host cores the offload frees for BAM decode).
    """
    global _policy_logged
    mode = os.environ.get("MODKIT_TPU_OFFLOAD", "auto")
    if mode == "always":
        return True
    if mode == "never":
        return False
    host_rate = host_event_rate()
    bw = link_bandwidth_bytes_per_s()
    t_dev = n_events * (bytes_per_event + 1.0) / bw
    t_host = n_events / host_rate
    offload = t_dev < 2.0 * t_host
    if not _policy_logged:
        _policy_logged = True
        from ..logging import get_logger

        get_logger().info(
            "offload policy: link %.1f MB/s, host %.1f Mevent/s -> "
            "counting on %s",
            bw / 1e6, host_rate / 1e6,
            "device" if offload else "host",
        )
    return offload


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed from MODKIT_TPU_COORD /
    MODKIT_TPU_NPROC / MODKIT_TPU_PROC_ID (multi-host DCN init); no-op and
    False when unset. Idempotent: a repeat call is tolerated, but any other
    init failure (bad coordinator, port clash, rank mismatch) is FATAL —
    silently degrading to single-process would produce a partial-genome
    shard named like the final output."""
    coord = os.environ.get("MODKIT_TPU_COORD")
    if not coord:
        return False
    import jax

    kwargs = {}
    timeout = os.environ.get("MODKIT_TPU_INIT_TIMEOUT")
    if timeout:
        kwargs["initialization_timeout"] = int(timeout)
    try:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["MODKIT_TPU_NPROC"]),
            process_id=int(os.environ["MODKIT_TPU_PROC_ID"]),
            **kwargs,
        )
    except RuntimeError as e:
        if "already" not in str(e).lower():
            raise RuntimeError(
                f"jax.distributed init failed (coordinator={coord}): {e}"
            ) from e
    except Exception as e:
        raise RuntimeError(
            f"jax.distributed init failed (coordinator={coord}): {e}"
        ) from e
    return True


def process_info() -> tuple[int, int]:
    """(process_index, process_count). When jax.distributed was never
    initialized (no MODKIT_TPU_COORD), this is (0, 1) by construction —
    answered WITHOUT touching jax.process_index(), which would initialize
    the PJRT backend (~10 s against a tunneled TPU) just to learn the
    rank of a single-process run."""
    if not os.environ.get("MODKIT_TPU_COORD"):
        return 0, 1
    import jax

    return jax.process_index(), jax.process_count()


def shard_path(out: str, process_index: int) -> str:
    return f"{out}.shard{process_index:04d}"


_TILE_SENTINEL = b"\x00TILE\x00"


def _iter_tile_blocks(path: str, chunk_size: int = 1 << 20):
    """Yield every tile block of a shard file in order, INCLUDING empty
    blocks (a tile that emitted zero rows still wrote its sentinel, and the
    round-robin zip in merge_shards relies on block index k == k-th owned
    tile). Streams the file in chunks so WGS-scale shards never load whole
    into memory."""
    buf = bytearray()
    with open(path, "rb") as fh:
        while True:
            chunk = fh.read(chunk_size)
            if not chunk:
                break
            buf += chunk
            while True:
                i = buf.find(_TILE_SENTINEL)
                if i < 0:
                    break
                yield bytes(buf[:i])
                del buf[: i + len(_TILE_SENTINEL)]
    # anything after the final sentinel is unterminated trailing data
    # (shouldn't occur — every tile ends with a sentinel); emit it rather
    # than drop rows silently
    if buf:
        yield bytes(buf)


def merge_shards(out: str, n_processes: int, remove: bool = True) -> None:
    """Interleave per-process shards back into one genome-ordered ``out``.

    In multi-host mode tiles are assigned round-robin (global tile k goes
    to process k % P) and each process writes its tiles in order, ending
    every tile block — including empty ones — with a sentinel. Re-merging
    is therefore a round-robin zip of whole tile blocks, no sort needed.
    Empty blocks are consumed (to keep the zip aligned) but write nothing.
    """
    iters = [
        _iter_tile_blocks(shard_path(out, i)) for i in range(n_processes)
    ]
    _done = object()
    with open(out, "wb") as o:
        exhausted = [False] * n_processes
        while not all(exhausted):
            for i, it in enumerate(iters):
                block = next(it, _done)
                if block is _done:
                    exhausted[i] = True
                elif block:
                    o.write(block)
    if remove:
        for i in range(n_processes):
            os.remove(shard_path(out, i))
