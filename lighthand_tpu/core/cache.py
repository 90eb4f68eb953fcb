"""Persistent XLA compilation cache.

This image compiles TPU programs through a remote-compile tunnel, which
makes the first compile of a large train step expensive (minutes). The
persistent cache makes every subsequent process reuse the compiled
executable from disk.
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.path.expanduser("~/.cache/lighthand_tpu_xla")


def enable_compilation_cache(path: str | None = None) -> None:
    path = path or os.environ.get("LIGHTHAND_XLA_CACHE", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # Only persist expensive compiles (the big TPU train/eval steps).
        # Small CPU executables may be AOT-compiled by the remote-compile
        # service with host features this machine lacks — loading those
        # back risks SIGILL, so keep them out of the cache.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except AttributeError:
        pass  # older jax without these knobs
