"""ctypes bindings for the native TSV engine (native/tsv_engine.cpp).

Built lazily with the in-image g++ on first use; every caller falls back to
the pure-Python path if the toolchain or build is unavailable, so the
framework never hard-depends on the shared object.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libtsv_engine.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.isfile(_SO_PATH):
            src = os.path.join(_NATIVE_DIR, "tsv_engine.cpp")
            if not os.path.isfile(src):
                _build_failed = True
                return None
            try:
                subprocess.run(
                    ["g++", "-O3", "-fPIC", "-shared", "-o", _SO_PATH, src],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.lh_generate_lineidx.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.lh_generate_lineidx.restype = ctypes.c_int64
        lib.lh_b64_decode.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                      ctypes.POINTER(ctypes.c_ubyte)]
        lib.lh_b64_decode.restype = ctypes.c_int64
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def native_generate_lineidx(tsv_path: str, idx_path: str) -> bool:
    lib = _load()
    if lib is None:
        return False
    rows = lib.lh_generate_lineidx(tsv_path.encode(), idx_path.encode())
    return rows >= 0


def native_b64_decode(data: str | bytes) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    raw = data.encode() if isinstance(data, str) else data
    out = np.empty(len(raw) * 3 // 4 + 3, dtype=np.uint8)
    n = lib.lh_b64_decode(
        raw, len(raw), out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
    )
    if n < 0:
        return None
    return out[:n]
