"""Multi-process (multi-host) runtime initialization.

The reference's distributed story is dormant torch.distributed scaffolding
(src/utils/comm.py:16-173; train.py never calls init_process_group). The
TPU-native equivalent is ``jax.distributed.initialize()`` before any
backend query, after which every process sees the global device set and
jitted collectives ride ICI/DCN (SURVEY.md section 5.8).

Initialization is env-gated so single-host runs (the common case, and the
only one exercisable in CI) never pay coordination-service startup:

- ``LIGHTHAND_COORDINATOR`` = host:port of process 0, with
  ``LIGHTHAND_NUM_PROCESSES`` / ``LIGHTHAND_PROCESS_ID`` — explicit wiring
  (works on any backend, incl. multi-process CPU tests);
- ``LIGHTHAND_DIST=1`` — auto-detection (TPU pod metadata / cluster envs
  that ``jax.distributed.initialize()`` understands natively).
"""

from __future__ import annotations

import os

_initialized = False


def distributed_env_requested() -> bool:
    return bool(os.environ.get("LIGHTHAND_COORDINATOR")) or \
        os.environ.get("LIGHTHAND_DIST", "") in ("1", "true", "TRUE")


def maybe_initialize_distributed() -> bool:
    """Call BEFORE any jax.devices()/jit. Returns True iff the process is
    part of a multi-process run (after this, ``jax.process_count() > 1``)."""
    global _initialized
    if _initialized:
        return True
    if not distributed_env_requested():
        return False
    import jax

    coord = os.environ.get("LIGHTHAND_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["LIGHTHAND_NUM_PROCESSES"]),
            process_id=int(os.environ["LIGHTHAND_PROCESS_ID"]),
        )
    else:
        jax.distributed.initialize()
    _initialized = True
    return True
