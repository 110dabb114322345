"""ctypes wrapper for the native CSV float parser (native/fastcsv.cpp).

Builds lazily with g++ on first use if the shared library is missing
(no pybind11 in this environment; plain C ABI + ctypes instead).
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
    if not os.path.exists(_LIB_PATH):
        if not os.path.exists(_SRC):
            raise OSError("fastcsv source unavailable")
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-o", _LIB_PATH, _SRC],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(_LIB_PATH)
    lib.fastcsv_parse.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.fastcsv_parse.restype = ctypes.c_int
    lib.fastcsv_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
    lib.fastcsv_free.restype = None
    _lib = lib
    return lib


def parse_file(path: str) -> np.ndarray:
    lib = _load()
    out = ctypes.POINTER(ctypes.c_double)()
    count = ctypes.c_long()
    rc = lib.fastcsv_parse(str(path).encode(), ctypes.byref(out), ctypes.byref(count))
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
