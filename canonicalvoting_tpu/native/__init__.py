"""ctypes loader for the native coordinate manager.

Compiles coords_native.c on first use (cc -O3 -shared) into this directory
and exposes typed wrappers. Falls back silently (``lib() is None``) when no
compiler is available; ops/coords.py then uses the NumPy implementation.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "coords_native.c")
_SO = os.path.join(_DIR, "_coords_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> bool:
    # compile to a process-unique temp path, then atomic-rename: concurrent
    # processes racing on the same output file would load a torn .so
    tmp = f"{_SO}.{os.getpid()}.tmp"
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-march=native", "-shared", "-fPIC", _SRC,
                 "-o", tmp],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, _SO)
            return True
        except (OSError, subprocess.SubprocessError):
            continue
    return False


def lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("CVT_NO_NATIVE"):
            return None
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            if not _compile():
                return None
        try:
            L = ctypes.CDLL(_SO)
        except OSError:
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        L.build_nbr_table_native.restype = ctypes.c_int
        L.build_nbr_table_native.argtypes = [
            i32p, ctypes.c_int64, i32p, ctypes.c_int64, i32p,
            ctypes.c_int64, i32p, ctypes.c_int64,
        ]
        L.downsample_coords_native.restype = ctypes.c_int64
        L.downsample_coords_native.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int32, i32p,
        ]
        L.sparse_quantize_native.restype = ctypes.c_int64
        L.sparse_quantize_native.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_float, i32p, i64p,
        ]
        _lib = L
        return _lib


def _ptr(a, typ):
    return a.ctypes.data_as(typ)


def build_nbr_table(in_coords, n_in_valid, out_coords, n_out_valid, offsets):
    L = lib()
    if L is None:
        return None
    in_c = np.ascontiguousarray(in_coords, np.int32)
    out_c = np.ascontiguousarray(out_coords, np.int32)
    offs = np.ascontiguousarray(offsets, np.int32)
    k = len(offs)
    nbr = np.full((len(out_c), k), -1, np.int32)
    rc = L.build_nbr_table_native(
        _ptr(in_c, ctypes.POINTER(ctypes.c_int32)), int(n_in_valid),
        _ptr(out_c, ctypes.POINTER(ctypes.c_int32)), int(n_out_valid),
        _ptr(offs, ctypes.POINTER(ctypes.c_int32)), int(k),
        _ptr(nbr, ctypes.POINTER(ctypes.c_int32)), int(len(out_c)),
    )
    return nbr if rc == 0 else None


def downsample_coords(coords, n_valid, stride):
    L = lib()
    if L is None:
        return None
    c = np.ascontiguousarray(coords[:n_valid], np.int32)
    out = np.empty_like(c)
    m = L.downsample_coords_native(
        _ptr(c, ctypes.POINTER(ctypes.c_int32)), int(n_valid),
        int(stride), _ptr(out, ctypes.POINTER(ctypes.c_int32)),
    )
    if m < 0:
        return None
    return out[:m]


def sparse_quantize(points, res):
    L = lib()
    if L is None:
        return None
    p = np.ascontiguousarray(points[:, :3], np.float32)
    n = len(p)
    out_c = np.empty((n, 3), np.int32)
    out_i = np.empty((n,), np.int64)
    m = L.sparse_quantize_native(
        _ptr(p, ctypes.POINTER(ctypes.c_float)), int(n),
        ctypes.c_float(res),
        _ptr(out_c, ctypes.POINTER(ctypes.c_int32)),
        _ptr(out_i, ctypes.POINTER(ctypes.c_int64)),
    )
    if m < 0:
        return None
    return out_c[:m], out_i[:m]
