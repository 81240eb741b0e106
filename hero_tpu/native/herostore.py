"""ctypes wrapper for libherostore (see herostore.cpp).

Builds the shared library on first use if g++ is available; falls back to
unavailable (callers use the pure-python mmap path, same bytes).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "herostore.cpp")
_LIB = os.path.join(_DIR, "libherostore.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o",
             _LIB, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
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
        lib.hs_open.restype = ctypes.c_void_p
        lib.hs_open.argtypes = [ctypes.c_char_p]
        lib.hs_close.argtypes = [ctypes.c_void_p]
        lib.hs_read.restype = ctypes.c_int64
        lib.hs_read.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                ctypes.c_uint64, ctypes.c_void_p]
        lib.hs_read_many.restype = ctypes.c_int64
        lib.hs_read_many.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.hs_lz4_compress.restype = ctypes.c_int64
        lib.hs_lz4_compress.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                        ctypes.c_void_p, ctypes.c_int64]
        lib.hs_lz4_decompress.restype = ctypes.c_int64
        lib.hs_lz4_decompress.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                          ctypes.c_void_p, ctypes.c_int64]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def open(path: str):  # noqa: A001 - mirrors the C API name
    lib = _load()
    h = lib.hs_open(path.encode())
    if not h:
        raise OSError(f"hs_open failed for {path}")
    return h


def read(handle, offset: int, length: int) -> bytes:
    lib = _load()
    out = ctypes.create_string_buffer(length)
    n = lib.hs_read(handle, offset, length, out)
    if n != length:
        raise OSError("hs_read failed")
    return out.raw


def read_many(handle, offsets, lengths) -> tuple:
    """Gather records → (contiguous bytes, per-record start offsets)."""
    lib = _load()
    offs = np.ascontiguousarray(offsets, dtype=np.uint64)
    lens = np.ascontiguousarray(lengths, dtype=np.uint64)
    total = int(lens.sum())
    out = ctypes.create_string_buffer(total)
    out_offs = np.zeros(len(offs), dtype=np.uint64)
    n = lib.hs_read_many(
        handle, len(offs),
        offs.ctypes.data_as(ctypes.c_void_p),
        lens.ctypes.data_as(ctypes.c_void_p), out,
        out_offs.ctypes.data_as(ctypes.c_void_p))
    if n != total:
        raise OSError("hs_read_many failed")
    return out.raw, out_offs


def lz4_compress(data: bytes) -> bytes:
    lib = _load()
    cap = len(data) + len(data) // 255 + 64
    out = ctypes.create_string_buffer(cap)
    n = lib.hs_lz4_compress(data, len(data), out, cap)
    if n < 0:
        raise ValueError("lz4 compress failed")
    return out.raw[:n]


def lz4_decompress(data: bytes, original_size: int) -> bytes:
    lib = _load()
    out = ctypes.create_string_buffer(original_size)
    n = lib.hs_lz4_decompress(data, len(data), out, original_size)
    if n != original_size:
        raise ValueError(f"lz4 decompress failed ({n} != {original_size})")
    return out.raw
