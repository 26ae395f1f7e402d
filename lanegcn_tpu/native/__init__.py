"""ctypes loader for the native data kernels (with numpy/scipy fallback).

Builds lanegcn_tpu/native/libdata_kernels.so from data_kernels.cc on first
import when a compiler is available; callers check `available()` and fall
back to the pure-python implementations otherwise. Disable with
LANEGCN_TPU_NATIVE=0.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libdata_kernels.so")
_SRC = os.path.join(_DIR, "data_kernels.cc")

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("LANEGCN_TPU_NATIVE", "1") == "0":
        return None
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    lib.dilated_nbrs.restype = ctypes.c_int64
    lib.dilated_nbrs.argtypes = [
        i32p, i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        i32p, i32p, ctypes.c_int64, i64p,
    ]
    lib.cross_edges.restype = ctypes.c_int64
    lib.cross_edges.argtypes = [
        f32p, f32p, i64p, u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_float,
        i32p, i32p, ctypes.c_int64,
    ]
    lib.threshold_edges.restype = ctypes.c_int64
    lib.threshold_edges.argtypes = [
        f32p, ctypes.c_int32, f32p, ctypes.c_int32, ctypes.c_float,
        i32p, i32p, ctypes.c_int64,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def dilated_nbrs(
    u: np.ndarray, v: np.ndarray, num_nodes: int, num_scales: int
) -> Optional[List[Tuple[np.ndarray, np.ndarray]]]:
    lib = _load()
    if lib is None or num_nodes == 0:
        return None
    u = np.ascontiguousarray(u, np.int32)
    v = np.ascontiguousarray(v, np.int32)
    cap = max(64, 4 * num_scales * max(len(u), num_nodes) * 8)
    out_u = np.empty(cap, np.int32)
    out_v = np.empty(cap, np.int32)
    counts = np.zeros(max(num_scales, 1), np.int64)
    total = lib.dilated_nbrs(
        _ptr(u, ctypes.c_int32), _ptr(v, ctypes.c_int32),
        len(u), num_nodes, num_scales,
        _ptr(out_u, ctypes.c_int32), _ptr(out_v, ctypes.c_int32),
        cap, _ptr(counts, ctypes.c_int64),
    )
    if total < 0:
        return None  # capacity miss → caller falls back to scipy
    out = []
    off = 0
    for s in range(num_scales - 1):
        n = int(counts[s])
        out.append((out_u[off : off + n].copy(), out_v[off : off + n].copy()))
        off += n
    return out


def cross_edges(
    ctrs: np.ndarray,
    feats: np.ndarray,
    lane_idcs: np.ndarray,
    reach: np.ndarray,
    cross_dist: float,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    n = len(ctrs)
    ctrs = np.ascontiguousarray(ctrs, np.float32)
    feats = np.ascontiguousarray(feats, np.float32)
    lane_idcs = np.ascontiguousarray(lane_idcs, np.int64)
    reach8 = np.ascontiguousarray(reach, np.uint8)
    out_u = np.empty(n, np.int32)
    out_v = np.empty(n, np.int32)
    count = lib.cross_edges(
        _ptr(ctrs, ctypes.c_float), _ptr(feats, ctypes.c_float),
        _ptr(lane_idcs, ctypes.c_int64), _ptr(reach8, ctypes.c_uint8),
        n, reach8.shape[0], cross_dist,
        _ptr(out_u, ctypes.c_int32), _ptr(out_v, ctypes.c_int32), n,
    )
    if count < 0:
        return None
    return out_u[:count].copy(), out_v[:count].copy()


def threshold_edges(
    dst: np.ndarray, src: np.ndarray, th: float
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    dst = np.ascontiguousarray(dst, np.float32)
    src = np.ascontiguousarray(src, np.float32)
    cap = max(64, len(dst) * len(src))
    out_u = np.empty(cap, np.int32)
    out_v = np.empty(cap, np.int32)
    count = lib.threshold_edges(
        _ptr(dst, ctypes.c_float), len(dst), _ptr(src, ctypes.c_float), len(src),
        th, _ptr(out_u, ctypes.c_int32), _ptr(out_v, ctypes.c_int32), cap,
    )
    if count < 0:
        return None
    return out_u[:count].copy(), out_v[:count].copy()
