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
        lib.lh_read_rows.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),  # offsets
            ctypes.c_int,                    # n_rows
            ctypes.POINTER(ctypes.c_ubyte),  # arena
            ctypes.POINTER(ctypes.c_int64),  # arena_offsets
            ctypes.POINTER(ctypes.c_int64),  # row_lens (out)
            ctypes.c_int64,                  # max_row_len
        ]
        lib.lh_read_rows.restype = ctypes.c_int
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


def native_read_rows(tsv_path: str, all_offsets: np.ndarray,
                     indices) -> Optional[list]:
    """Bulk row read: one C call fetches every requested row's bytes
    (native/tsv_engine.cpp:lh_read_rows). ``all_offsets`` is the full
    lineidx array; ``indices`` the row numbers wanted. Returns a list of
    ``bytes`` (tab-separated row, no trailing newline), or None when the
    native engine is unavailable or the read fails."""
    lib = _load()
    if lib is None or len(indices) == 0:
        return None
    idx = np.asarray(indices, dtype=np.int64)
    offsets = np.ascontiguousarray(all_offsets[idx], dtype=np.int64)
    # upper bound on row length: gap to the next offset (or EOF)
    total = os.path.getsize(tsv_path)
    nxt = np.where(idx + 1 < len(all_offsets),
                   all_offsets[np.minimum(idx + 1, len(all_offsets) - 1)],
                   total).astype(np.int64)
    lens = nxt - offsets
    max_len = int(lens.max())
    arena_offsets = np.zeros(len(idx), dtype=np.int64)
    np.cumsum(lens[:-1], out=arena_offsets[1:])
    arena = np.empty(int(lens.sum()), dtype=np.uint8)
    row_lens = np.zeros(len(idx), dtype=np.int64)
    rc = lib.lh_read_rows(
        tsv_path.encode(),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(idx),
        arena.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        arena_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        row_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        max_len,
    )
    if rc != 0:
        return None
    return [bytes(arena[arena_offsets[r]:arena_offsets[r] + row_lens[r]])
            for r in range(len(idx))]


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
