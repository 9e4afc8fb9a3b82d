"""ctypes bindings to the native C++ runtime (native/modkit_native.cpp).

The native library implements the host hot loop of the pileup engine —
BAM record parse + MM/ML/MN decode + per-tile pileup event extraction —
in multithreaded C++, the framework's equivalent of the reference's
htslib/compiled-Rust layer. Python (modtags.py / pileup/events.py) remains
the oracle implementation; tests/test_native_decode.py asserts equivalence.

The shared library builds on demand with ``g++`` (cached next to the
source); set ``MODKIT_TPU_DISABLE_NATIVE=1`` to force the Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "modkit_native.cpp")
_SO = os.path.join(_REPO, "native", "libmodkit_native.so")

# index order must match enum Err in modkit_native.cpp
ERR_KINDS = (
    "MM-tag-missing",
    "ML-tag-missing",
    "invalid-MM-tag",
    "invalid-ML-tag",
    "invalid-MN-tag",
    "non-primary-missing-MN",
    "conflict-probability-greater-than-one",
    "conflict-explicit-prob-and-inferred",
    "no-modified-base-information",
    "invalid-implicit-mode",
)

_lock = threading.Lock()
_lib = None
_load_failed = False


class _MkTileOut(ctypes.Structure):
    _fields_ = [
        ("n_events", ctypes.c_int64),
        ("m", ctypes.c_int32),
        ("ev_rpos", ctypes.POINTER(ctypes.c_int32)),
        ("ev_strand", ctypes.POINTER(ctypes.c_int8)),
        ("ev_base", ctypes.POINTER(ctypes.c_int8)),
        ("ev_probs", ctypes.POINTER(ctypes.c_float)),
        ("nc_counts", ctypes.POINTER(ctypes.c_int32)),
        ("del_counts", ctypes.POINTER(ctypes.c_int32)),
        ("observed", ctypes.POINTER(ctypes.c_uint8)),
        ("vocab", ctypes.POINTER(ctypes.c_int64)),
        ("n_used", ctypes.c_int32),
        ("n_skipped", ctypes.c_int32),
        ("n_nc", ctypes.c_int64),
        ("n_del", ctypes.c_int64),
        ("err_counts", ctypes.c_int64 * 16),
        ("handle", ctypes.c_void_p),
    ]


def _build() -> None:
    subprocess.run(
        [
            os.environ.get("CXX", "g++"),
            "-O3", "-std=c++17", "-fPIC", "-Wall", "-pthread",
            "-shared", "-o", _SO, _SRC,
        ],
        check=True,
        capture_output=True,
    )


def load():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed or os.environ.get("MODKIT_TPU_DISABLE_NATIVE") == "1":
        return None
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.mk_decode_tile.restype = ctypes.c_int32
            lib.mk_decode_tile.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),      # chunks
                ctypes.POINTER(ctypes.c_int64),       # chunk_lens
                ctypes.c_int32,                       # n_chunks
                ctypes.c_int32,                       # tid
                ctypes.c_int64,                       # start
                ctypes.c_int64,                       # end
                ctypes.c_int32,                       # force_allow
                ctypes.c_int32,                       # has_edge
                ctypes.c_int64,                       # edge_start
                ctypes.c_int64,                       # edge_end
                ctypes.c_int32,                       # edge_inverted
                ctypes.POINTER(ctypes.c_int64),       # collapse_blob
                ctypes.c_int32,                       # collapse_len
                ctypes.POINTER(ctypes.c_int8),        # focus_rule
                ctypes.c_int32,                       # n_threads
                ctypes.POINTER(_MkTileOut),
            ]
            lib.mk_free_tile.restype = None
            lib.mk_free_tile.argtypes = [ctypes.POINTER(_MkTileOut)]
            _lib = lib
        except Exception:
            _load_failed = True
            return None
    return _lib


def available() -> bool:
    return load() is not None


def encode_code(code) -> int:
    """ModCode (str char | int ChEBI) -> int64 identity used by native."""
    if isinstance(code, int):
        return code
    return -ord(code)


def decode_code(v: int):
    return int(v) if v >= 0 else chr(-v)


def encode_collapse(methods) -> np.ndarray:
    """Serialize CollapseMethod list to the native int64 blob."""
    blob: list[int] = []
    kinds = {"norm": 0, "dist": 1, "convert": 2}
    for m in methods or ():
        blob.append(kinds[m.kind])
        blob.append(len(m.codes))
        blob.extend(encode_code(c) for c in m.codes)
        blob.append(1 if m.to_code is not None else 0)
        blob.append(encode_code(m.to_code) if m.to_code is not None else 0)
    return np.asarray(blob, dtype=np.int64)


def decode_tile(
    chunks: list[bytes],
    tid: int,
    start: int,
    end: int,
    *,
    force_allow: bool = False,
    edge_filter=None,
    collapse=None,
    focus_rule: np.ndarray | None = None,
    n_threads: int | None = None,
):
    """Native tile event decode; returns a dict mirroring the Python
    launch_tile assembly (engine.py:152), or None when native is disabled.

    Keys: rpos/strand/base/probs (sparse mod-call events), nc_counts
    [p,2,4] | None, del_counts [p,2] | None, observed [p,2,4,m] bool,
    vocab (list of ModCode), n_used, n_skipped, errors {kind: count}.
    """
    lib = load()
    if lib is None:
        return None
    n_chunks = len(chunks)
    ChunkArr = ctypes.c_char_p * max(n_chunks, 1)
    LenArr = ctypes.c_int64 * max(n_chunks, 1)
    c_chunks = ChunkArr(*chunks) if n_chunks else ChunkArr()
    c_lens = LenArr(*[len(c) for c in chunks]) if n_chunks else LenArr()

    blob = encode_collapse(collapse)
    c_blob = blob.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    if focus_rule is not None:
        fr = np.ascontiguousarray(focus_rule, dtype=np.int8)
        c_rule = fr.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))
    else:
        fr = None
        c_rule = ctypes.POINTER(ctypes.c_int8)()

    has_edge = edge_filter is not None
    out = _MkTileOut()
    nt = n_threads if n_threads is not None else min(os.cpu_count() or 1, 8)
    rc = lib.mk_decode_tile(
        ctypes.cast(c_chunks, ctypes.POINTER(ctypes.c_char_p)),
        ctypes.cast(c_lens, ctypes.POINTER(ctypes.c_int64)),
        n_chunks, tid, start, end,
        1 if force_allow else 0,
        1 if has_edge else 0,
        edge_filter.start_trim if has_edge else 0,
        edge_filter.end_trim if has_edge else 0,
        1 if (has_edge and edge_filter.inverted) else 0,
        c_blob, len(blob), c_rule, nt,
        ctypes.byref(out),
    )
    if rc != 0:
        raise RuntimeError(f"mk_decode_tile failed rc={rc}")
    try:
        p = end - start
        n = out.n_events
        m = max(out.m, 1)

        def arr(ptr, count, dtype):
            if count == 0 or not ptr:
                return np.empty(0, dtype=dtype)
            return np.ctypeslib.as_array(ptr, shape=(count,)).copy().astype(
                dtype, copy=False
            )

        res = dict(
            rpos=arr(out.ev_rpos, n, np.int32),
            strand=arr(out.ev_strand, n, np.int8),
            base=arr(out.ev_base, n, np.int8),
            probs=arr(out.ev_probs, n * m, np.float32).reshape(n, m),
            n_used=int(out.n_used),
            n_skipped=int(out.n_skipped),
        )
        res["vocab"] = [
            decode_code(v) for v in arr(out.vocab, out.m, np.int64)
        ] if out.m and out.vocab else []
        if out.nc_counts and out.n_nc > 0:
            res["nc_counts"] = arr(out.nc_counts, p * 2 * 4, np.int32).reshape(
                p, 2, 4
            )
        else:
            res["nc_counts"] = None
        if out.del_counts and out.n_del > 0:
            res["del_counts"] = arr(out.del_counts, p * 2, np.int32).reshape(
                p, 2
            )
        else:
            res["del_counts"] = None
        if out.observed:
            res["observed"] = (
                arr(out.observed, p * 2 * 4 * m, np.uint8)
                .reshape(p, 2, 4, m)
                .astype(bool)
            )
        else:
            res["observed"] = np.zeros((p, 2, 4, m), dtype=bool)
        res["errors"] = {
            ERR_KINDS[i]: int(out.err_counts[i])
            for i in range(len(ERR_KINDS))
            if out.err_counts[i]
        }
        return res
    finally:
        lib.mk_free_tile(ctypes.byref(out))
