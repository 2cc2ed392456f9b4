"""Native (C++) fast paths, bound via ctypes.

The shared library is compiled from ldparse.cpp with g++ on first use and
cached next to the source; every entry point has a pure-Python fallback in
data/loaders.py, selected automatically when compilation is unavailable
(set SGVAMP_NO_NATIVE=1 to force the fallback).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger("sgvamp")

_SRC = os.path.join(os.path.dirname(__file__), "ldparse.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "_ldparse.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.debug(f"native ldparse build failed ({e}); using Python fallback")
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if os.environ.get("SGVAMP_NO_NATIVE"):
        return None
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.ldparse_parse.restype = ctypes.c_void_p
        lib.ldparse_parse.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64]
        lib.ldparse_error.restype = ctypes.c_char_p
        lib.ldparse_error.argtypes = [ctypes.c_void_p]
        lib.ldparse_count.restype = ctypes.c_int64
        lib.ldparse_count.argtypes = [ctypes.c_void_p]
        lib.ldparse_copy.restype = None
        lib.ldparse_copy.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.ldparse_free.restype = None
        lib.ldparse_free.argtypes = [ctypes.c_void_p]
        lib.ldparse_max_bandwidth.restype = ctypes.c_int64
        lib.ldparse_max_bandwidth.argtypes = [
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.ldparse_to_band.restype = ctypes.c_int64
        lib.ldparse_to_band.argtypes = [
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.ldparse_to_band_f64.restype = ctypes.c_int64
        lib.ldparse_to_band_f64.argtypes = [
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
        return _lib


def _i64p(x: np.ndarray):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _f64p(x: np.ndarray):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def parse_ld(path: str, variants) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Parse a PLINK .ld table natively. Returns (rows, cols, vals) in
    reference index space, or None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    blob = "\n".join(variants).encode()
    h = lib.ldparse_parse(path.encode(), blob, len(variants))
    if not h:
        raise MemoryError("ldparse_parse allocation failed")
    try:
        err = lib.ldparse_error(h)
        if err:
            raise ValueError(f"ldparse: {err.decode()} in {path}")
        n = lib.ldparse_count(h)
        a = np.empty(n, np.int64)
        b = np.empty(n, np.int64)
        v = np.empty(n, np.float64)
        if n:
            lib.ldparse_copy(h, _i64p(a), _i64p(b), _f64p(v))
        return a, b, v
    finally:
        lib.ldparse_free(h)


def max_bandwidth(rows: np.ndarray, cols: np.ndarray) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    return int(lib.ldparse_max_bandwidth(len(rows), _i64p(rows), _i64p(cols)))


def triplets_to_band(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
                     M: int, bw: int, dtype=np.float32
                     ) -> Optional[Tuple[np.ndarray, int]]:
    """Assemble symmetric band storage (M, 2*bw+1) with unit diagonal from
    one-sided triplets. Returns (band, dropped_count)."""
    lib = get_lib()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    vals = np.ascontiguousarray(vals, np.float64)
    dtype = np.dtype(dtype)
    band = np.zeros((M, 2 * bw + 1), dtype)
    if dtype == np.float64:
        dropped = lib.ldparse_to_band_f64(
            len(rows), _i64p(rows), _i64p(cols), _f64p(vals), M, bw, _f64p(band))
    else:
        dropped = lib.ldparse_to_band(
            len(rows), _i64p(rows), _i64p(cols), _f64p(vals), M, bw,
            band.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
    return band, int(dropped)
