"""ctypes bindings for the native host library (native/host_ops.cpp).

Auto-builds libphoto_host.so with g++ on first use (cached next to the
source); every entry point has a pure-Python/JAX fallback so the framework
works without a toolchain.  The native tier covers only the inherently
sequential host algorithms — all batched math stays on the TPU.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libphoto_host.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.isfile(_LIB_PATH):
                src = os.path.join(_NATIVE_DIR, "host_ops.cpp")
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                     "-fPIC", src, "-o", _LIB_PATH],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.pg_cluster_exact.restype = ctypes.c_int
            lib.pg_cluster_exact.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
                ctypes.c_double, ctypes.POINTER(ctypes.c_double)]
            lib.pg_greedy_match.restype = ctypes.c_int
            lib.pg_greedy_match.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32)]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def cluster_exact(coords: np.ndarray, max_merge_dist: float) -> np.ndarray:
    """Exact hierarchical clustering (reference semantics); returns rounded
    int32 centroids.  Native when possible, Python fallback otherwise."""
    coords = np.ascontiguousarray(coords, np.int32).reshape(-1, 2)
    lib = _load()
    if lib is None:
        from photogrammetry_tpu.ops.cluster import hierarchical_cluster_exact
        return hierarchical_cluster_exact(coords, max_merge_dist)
    out = np.empty((len(coords), 2), np.float64)
    m = lib.pg_cluster_exact(
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(coords), float(max_merge_dist),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return np.round(out[:m]).astype(np.int32)


def greedy_match(dist: np.ndarray, num_matches: int | None = None):
    """Greedy global mutual assignment (KeypointMatching.cs semantics).

    Returns (i, j, d) int32 arrays of length <= num_matches.
    """
    dist = np.ascontiguousarray(dist, np.int32)
    n1, n2 = dist.shape
    m = min(n1, n2) if num_matches is None else min(num_matches, n1, n2)
    lib = _load()
    if lib is None:
        from photogrammetry_tpu.ops.match import greedy_global_matches
        ii, jj, dd, valid = greedy_global_matches(dist, m)
        v = np.asarray(valid)
        return (np.asarray(ii)[v], np.asarray(jj)[v], np.asarray(dd)[v])
    out_i = np.empty(m, np.int32)
    out_j = np.empty(m, np.int32)
    out_d = np.empty(m, np.int32)
    k = lib.pg_greedy_match(
        dist.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n1, n2, m,
        out_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_j.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_d.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out_i[:k], out_j[:k], out_d[:k]
