"""ctypes wrapper for the native CSV float parser (native/fastcsv.cpp).

Builds lazily with g++ on first use if the shared library is missing or
older than the source (no pybind11 in this environment; plain C ABI +
ctypes instead).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_HERE, "_libfastcsv.so")
_SRC = os.path.normpath(os.path.join(_HERE, "..", "..", "native", "fastcsv.cpp"))

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    stale = (
        not os.path.exists(_LIB_PATH)
        or (os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH))
    )
    if stale:
        if not os.path.exists(_SRC):
            raise OSError("fastcsv source unavailable")
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-pthread",
             "-o", _LIB_PATH, _SRC],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(_LIB_PATH)
    lib.fastcsv_parse_mt.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.POINTER(ctypes.c_long),
        ctypes.c_int,
    ]
    lib.fastcsv_parse_mt.restype = ctypes.c_int
    lib.fastcsv_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
    lib.fastcsv_free.restype = None
    lib.fastcsv_write_mt.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_long,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.fastcsv_write_mt.restype = ctypes.c_int
    _lib = lib
    return lib


def parse_file(path: str, threads: int = 0) -> np.ndarray:
    """Parse all floats in ``path``. ``threads``: 0 = auto (one worker per
    ~8 MB up to the hardware concurrency), 1 = serial, N = cap at N.
    Chunked parallel parsing is bit-identical to the serial scan."""
    lib = _load()
    out = ctypes.POINTER(ctypes.c_double)()
    count = ctypes.c_long()
    rc = lib.fastcsv_parse_mt(
        str(path).encode(), ctypes.byref(out), ctypes.byref(count), threads
    )
    if rc != 0:
        raise OSError(f"fastcsv_parse failed with code {rc} for {path}")
    try:
        if count.value == 0:
            return np.empty(0, dtype=np.float64)
        arr = np.ctypeslib.as_array(out, shape=(count.value,)).copy()
    finally:
        if count.value:
            lib.fastcsv_free(out)
    return arr


def write_file(values, path: str, threads: int = 0, append: bool = False,
               lead_sep: bool = False) -> None:
    """Write a 1-D float64 array as one comma-separated ASCII line
    (shortest-round-trip formatting; the reference's tofile(sep=',')
    layout). ``append`` extends an existing file; ``lead_sep`` emits a
    leading comma first (streaming-chunk continuation). Chunks are
    formatted in parallel but written in order — the bytes are
    independent of ``threads``."""
    lib = _load()
    arr = np.ascontiguousarray(values, dtype=np.float64).reshape(-1)
    ptr = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    rc = lib.fastcsv_write_mt(ptr, arr.size, str(path).encode(), threads,
                              1 if append else 0, 1 if lead_sep else 0)
    if rc != 0:
        raise OSError(f"fastcsv_write failed with code {rc} for {path}")
