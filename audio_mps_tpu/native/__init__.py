"""ctypes loader for the native data-plane (tfrec.cc).

Builds the shared library on first use with g++ (no pip, no pybind11 — per
environment constraints) and caches it next to the source. Every entry
point degrades gracefully: if the toolchain or build is unavailable,
callers fall back to the pure-Python implementations in data/tfrecord.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "tfrec.cc")
_LIB = os.path.join(_HERE, "libamt_tfrec.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.amt_crc32c.restype = ctypes.c_uint32
        lib.amt_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        lib.amt_masked_crc.restype = ctypes.c_uint32
        lib.amt_masked_crc.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        lib.amt_parse_float_feature.restype = ctypes.c_long
        lib.amt_parse_float_feature.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
            ctypes.c_void_p, ctypes.c_size_t]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def crc32c(data: bytes) -> int:
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    return int(lib.amt_crc32c(data, len(data)))


def masked_crc(data: bytes) -> int:
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    return int(lib.amt_masked_crc(data, len(data)))


def parse_float_feature(record: bytes, name: str = "audio"
                        ) -> Optional[np.ndarray]:
    """Extract a float_list feature from a serialized Example, or None."""
    lib = load()
    if lib is None:
        return None
    n = lib.amt_parse_float_feature(record, len(record),
                                    name.encode(), None, 0)
    if n < 0:
        return None
    out = np.empty(n, dtype=np.float32)
    got = lib.amt_parse_float_feature(
        record, len(record), name.encode(),
        out.ctypes.data_as(ctypes.c_void_p), n)
    if got != n:
        return None
    return out
