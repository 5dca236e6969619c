"""Build + ctypes bindings for the native seqio reader.

Compiled lazily on first use with g++ (no pybind11 in this environment);
falls back cleanly if the toolchain is unavailable — callers must check
``available()``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "seqio.cpp")
_SO = os.path.join(_DIR, "_seqio.so")
_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _SO, "-lz"],
            check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not _build():
            _failed = True
            return None
        lib = ctypes.CDLL(_SO)
        lib.seqio_open.restype = ctypes.c_void_p
        lib.seqio_open.argtypes = [ctypes.c_char_p]
        lib.seqio_close.argtypes = [ctypes.c_void_p]
        lib.seqio_read_block.restype = ctypes.c_int64
        lib.seqio_read_block.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None
