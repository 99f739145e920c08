"""ctypes bindings for the native C++ runtime kernels (native/*.cpp).

Builds the shared library on first use if g++ is available; every caller
treats import/ABI failure as "use the Python fallback", so the framework
works without a compiler too.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmillieye_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.me_dbscan.restype = ctypes.c_int
    lib.me_dbscan.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_long,
        ctypes.c_double, ctypes.c_long, ctypes.POINTER(ctypes.c_long)]
    lib.me_hungarian.restype = ctypes.c_int
    lib.me_hungarian.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_long)]
    lib.me_parse_mmwave_frame.restype = ctypes.c_int
    lib.me_parse_mmwave_frame.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long)]
    _lib = lib
    return lib


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _lptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_long))


def dbscan_native(points, eps, min_samples):
    lib = _load()
    pts = np.ascontiguousarray(points, np.float64)
    n, d = pts.shape
    labels = np.empty(n, np.int64)
    lib.me_dbscan(_dptr(pts), n, d, float(eps), int(min_samples),
                  _lptr(labels))
    return labels


def hungarian_native(cost):
    lib = _load()
    cost = np.ascontiguousarray(cost, np.float64)
    n, m = cost.shape
    transposed = n > m
    if transposed:
        cost = np.ascontiguousarray(cost.T)
        n, m = m, n
    col = np.empty(n, np.int64)
    lib.me_hungarian(_dptr(cost), n, m, _lptr(col))
    rows = np.arange(n, dtype=np.int64)
    if transposed:
        rows, col = col, rows
    order = np.argsort(rows)
    return rows[order], col[order]


def parse_mmwave_frame(buf, max_points=1024):
    """buf: bytes/bytearray. Returns (ok, xyzv [n, 4], frame_number,
    consumed_bytes)."""
    lib = _load()
    arr = np.frombuffer(bytes(buf), np.uint8)
    out = np.empty((max_points, 4), np.float32)
    n_pts = ctypes.c_long()
    frame_no = ctypes.c_long()
    consumed = ctypes.c_long()
    ok = lib.me_parse_mmwave_frame(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(arr),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_points,
        ctypes.byref(n_pts), ctypes.byref(frame_no), ctypes.byref(consumed))
    return bool(ok), out[:n_pts.value].copy(), frame_no.value, consumed.value
