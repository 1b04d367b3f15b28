"""ctypes bindings to the native C++ IO runtime (native/ply_native.cpp).

Compiled on first use with g++ -O3 -fopenmp into the repo-local build dir;
every entry point has a NumPy fallback so the framework still works when no
compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False


def _source_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(here, "native", "ply_native.cpp")


def _build_dir() -> str:
    d = os.path.join(os.path.dirname(_source_path()), "_build")
    os.makedirs(d, exist_ok=True)
    return d


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src = _source_path()
        if not os.path.exists(src):
            return None
        so = os.path.join(_build_dir(), "libply_native.so")
        try:
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
                subprocess.run(
                    [
                        "g++",
                        "-O3",
                        "-march=native",
                        "-fopenmp",
                        "-shared",
                        "-fPIC",
                        "-std=c++17",
                        src,
                        "-o",
                        so,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(so)
        except (subprocess.CalledProcessError, OSError):
            return None
        lib.ply_open.restype = ctypes.c_void_p
        lib.ply_open.argtypes = [ctypes.c_char_p]
        lib.ply_n_vertex.restype = ctypes.c_int64
        lib.ply_n_vertex.argtypes = [ctypes.c_void_p]
        lib.ply_n_props.restype = ctypes.c_int64
        lib.ply_n_props.argtypes = [ctypes.c_void_p]
        lib.ply_prop_names.restype = ctypes.c_char_p
        lib.ply_prop_names.argtypes = [ctypes.c_void_p]
        lib.ply_copy_data.restype = None
        lib.ply_copy_data.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
        lib.ply_close.restype = None
        lib.ply_close.argtypes = [ctypes.c_void_p]
        lib.ply_write.restype = ctypes.c_int
        lib.dedup_points.restype = ctypes.c_int64
        lib.dedup_points.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def read_ply(path: str):
    lib = _load()
    h = lib.ply_open(path.encode())
    if not h:
        # fall back (ascii edge cases, list properties, ...)
        from lidar_global_registration_tpu.utils.io import read_ply_numpy

        return read_ply_numpy(path)
    try:
        n = lib.ply_n_vertex(h)
        p = lib.ply_n_props(h)
        names = lib.ply_prop_names(h).decode().split(",")
        data = np.empty((n, p), np.float32)
        lib.ply_copy_data(h, data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    finally:
        lib.ply_close(h)
    fields = {name: np.ascontiguousarray(data[:, i]) for i, name in enumerate(names)}
    return fields, names


def write_ply(path: str, cols, n: int):
    """cols: list of (name, np.ndarray, 'float'|'uchar')."""
    lib = _load()
    names = ",".join(c[0] for c in cols)
    kinds = (ctypes.c_int * len(cols))(*[1 if c[2] == "uchar" else 0 for c in cols])
    arrays = [np.ascontiguousarray(c[1], np.float32) for c in cols]
    ptrs = (ctypes.POINTER(ctypes.c_float) * len(cols))(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for a in arrays]
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    rc = lib.ply_write(path.encode(), names.encode(), kinds, ptrs, len(cols), n, 1)
    if rc != 0:
        raise IOError(f"native ply_write failed for {path}")


def dedup_points(xyz: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of first occurrences (native hash set)."""
    lib = _load()
    x = np.ascontiguousarray(xyz, np.float32)
    n = len(x)
    keep = np.zeros(n, np.uint8)
    if lib is not None:
        lib.dedup_points(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n,
            keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return keep.astype(bool)
    _, first = np.unique(x, axis=0, return_index=True)
    keep_idx = np.zeros(n, bool)
    keep_idx[first] = True
    return keep_idx
