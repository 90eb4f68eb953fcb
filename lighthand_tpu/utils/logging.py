"""Logger + ANSI color + scalar (TensorBoard-compatible) writer.

Reference: setup_logger (src/utils/logger.py:12-101) — DEBUG-level named
logger, non-leader processes get a silent logger, colored stdout at INFO, a
flush-per-record FileHandler to {output_dir}/log.txt; and the vendored
termcolor ``colored`` (src/utils/bar.py:234).

Scalars go to TensorBoard when available (tags Loss/train, Loss/valid per
epoch like method.py:214,280) and ALWAYS to a plain scalars.jsonl next to
the checkpoint, so runs are inspectable without TB.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Optional

from lighthand_tpu.core.mesh import is_host_leader

_COLORS = {"grey": 30, "red": 31, "green": 32, "yellow": 33, "blue": 34,
           "magenta": 35, "cyan": 36, "white": 37}


def colored(text: str, color: Optional[str] = None) -> str:
    if color is None or os.environ.get("ANSI_COLORS_DISABLED"):
        return text
    return f"\033[{_COLORS[color]}m{text}\033[0m"


class FlushFileHandler(logging.FileHandler):
    """Flush per record — keeps logs live on fuse/remote mounts
    (logger.py:31-79 motivation)."""

    def emit(self, record):
        super().emit(record)
        self.flush()


def _bind_diag_logger(logger: logging.Logger) -> None:
    """Route the library-internal diagnostics logger (init timings in
    train/state.py) into the run's sinks — the run logger is a named
    logger with propagate=False, so module-level loggers would otherwise
    go nowhere."""
    diag = logging.getLogger("lighthand_tpu.init")
    diag.setLevel(logging.DEBUG)
    diag.propagate = False
    diag.handlers = list(logger.handlers)


def setup_logger(name: str, save_dir: Optional[str]) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if logger.handlers:
        _bind_diag_logger(logger)
        return logger
    if not is_host_leader():
        logger.addHandler(logging.NullHandler())
        return logger
    sh = logging.StreamHandler(stream=sys.stdout)
    sh.setLevel(logging.INFO)
    sh.setFormatter(logging.Formatter("%(asctime)s %(name)s: %(message)s"))
    logger.addHandler(sh)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        fh = FlushFileHandler(os.path.join(save_dir, "log.txt"))
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s: %(message)s")
        )
        logger.addHandler(fh)
    _bind_diag_logger(logger)
    return logger


class ScalarWriter:
    """Loss/train & Loss/valid scalars (method.py:214,280)."""

    def __init__(self, log_dir: str, jsonl_dir: Optional[str] = None):
        self._tb = None
        if is_host_leader():
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None
            self._jsonl_path = os.path.join(jsonl_dir or log_dir,
                                            "scalars.jsonl")
            os.makedirs(os.path.dirname(self._jsonl_path), exist_ok=True)
            self._jsonl = open(self._jsonl_path, "a")
        else:
            self._jsonl = None

    def add_scalar(self, tag: str, value: float, step: int):
        if self._jsonl is None:
            return
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step),
             "ts": time.time()}) + "\n")
        self._jsonl.flush()

    def flush(self):
        """Push buffered TB events to disk NOW — called before paths that
        os._exit (check_rss_limit), which skip close() and would otherwise
        drop up to ~2 min of buffered scalars (the jsonl channel flushes
        per write and never needs this)."""
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()
