"""ctypes bridge to the native C++ runtime ops (native/gnntf_native.cc).

Auto-builds ``libgnntf_native.so`` with ``make`` on first use when a
compiler is available; every entry point degrades gracefully (callers fall
back to the numpy/python path) when the library cannot be built or loaded.

Provided ops:
  * :func:`negative_sample_native` — fills a ``negative_sampling``
    instance's edge buffer (rejection sampling against the sorted edge-hash
    set); ~2 orders of magnitude faster than the per-candidate Python loop
    the reference runs inside its training epochs
    (reference graph_predictor.py:84-94, SURVEY §3.5).
  * :func:`lexsort_edges` — stable radix argsort of (row, col) edge arrays
    used by graph construction.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgnntf_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src = os.path.join(_NATIVE_DIR, "gnntf_native.cc")
        try:
            if os.path.exists(src) and (
                    not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)):
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB_PATH)
        except (OSError, subprocess.SubprocessError):
            return None
        i64 = ctypes.c_int64
        u64 = ctypes.c_uint64
        p64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        pu64 = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
        p32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.gnntf_negative_sample.restype = i64
        lib.gnntf_negative_sample.argtypes = [
            p64, i64, p64, i64, pu64, i64, i64, u64, p64]
        lib.gnntf_lexsort_edges.restype = None
        lib.gnntf_lexsort_edges.argtypes = [p32, p32, i64, p64]
        lib.gnntf_sort_unique_u64.restype = i64
        lib.gnntf_sort_unique_u64.argtypes = [pu64, i64]
        lib.gnntf_build_ell.restype = i64
        lib.gnntf_build_ell.argtypes = [p32, p32, i64, i64, i64, i64,
                                        p32, p32, p32]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _edge_hashes(sampler) -> np.ndarray:
    cached = getattr(sampler, "_native_hashes", None)
    if cached is not None:
        return cached
    es = sampler._edge_set
    keys = np.fromiter(
        ((int(u) << 32) | int(v) for u, v in es), dtype=np.uint64, count=len(es))
    lib = _load()
    n = lib.gnntf_sort_unique_u64(keys, len(keys))
    keys = keys[:n].copy()
    sampler._native_hashes = keys
    return keys


def negative_sample_native(sampler, out: Optional[np.ndarray] = None,
                           seed: Optional[int] = None) -> Optional[bool]:
    """Fill ``out`` (default: ``sampler.edges``) negatives in C++.
    Returns True when filled, None to signal the caller to use the python
    fallback (library missing, or the sampler uses a custom ``pool``).
    The ctypes call releases the GIL, so a prefetch thread sampling epoch
    e+1 genuinely overlaps the device step of epoch e."""
    lib = _load()
    if lib is None or sampler._negative_pool is not None:
        return None
    pos = getattr(sampler, "_native_pos", None)
    if pos is None:
        pos = np.asarray(sampler.positive_edges, np.int64).reshape(-1, 2)
        sampler._native_pos = pos
    neg_nodes = np.ascontiguousarray(sampler.negative_nodes, np.int64)
    hashes = _edge_hashes(sampler)
    if seed is None:
        seed = np.random.randint(0, 2**62)
    target = sampler.edges if out is None else out
    buf = np.ascontiguousarray(target, np.int64)
    rc = lib.gnntf_negative_sample(
        pos.reshape(-1), len(pos), neg_nodes, len(neg_nodes), hashes,
        len(hashes), sampler.samples, int(seed), buf.reshape(-1))
    if rc != 0:
        return None
    if buf is not target:
        target[:] = buf
    return True


def build_ell_native(row: np.ndarray, col: np.ndarray, n_nodes: int,
                     k: int, n_vrows: int):
    """Single-pass C++ row-split ELL layout build (any edge order; the
    numpy path needs a stable argsort first).  Returns
    ``(idx[V,k], slot[E], vrow_row[V])`` int32 arrays, or None when the
    native library is unavailable or inputs are inconsistent."""
    lib = _load()
    if lib is None:
        return None
    row = np.ascontiguousarray(row, np.int32)
    col = np.ascontiguousarray(col, np.int32)
    e = len(row)
    idx = np.empty(n_vrows * k, np.int32)
    slot = np.empty(e, np.int32)
    vrow_row = np.empty(n_vrows, np.int32)
    rc = lib.gnntf_build_ell(row, col, e, n_nodes, k, n_vrows,
                             idx, slot, vrow_row)
    if rc != 0:
        return None
    return idx.reshape(n_vrows, k), slot, vrow_row


def lexsort_edges(row: np.ndarray, col: np.ndarray) -> Optional[np.ndarray]:
    """argsort by (row, col); None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    row = np.ascontiguousarray(row, np.int32)
    col = np.ascontiguousarray(col, np.int32)
    order = np.empty(len(row), np.int64)
    lib.gnntf_lexsort_edges(row, col, len(row), order)
    return order
