"""Parallelism surface (mesh, shardings, collectives-by-construction).

The reference's torch.distributed wrappers (src/utils/comm.py:16-173 —
pickle all_gather, gather_on_master, reduce_dict, synchronize) have no
TPU-native analogue as *functions*: under pjit, collectives are induced by
shardings, not called. This package is the one-stop import for everything
parallel:

  create_mesh / MeshSpec   — ('data','model') mesh over ICI
  batch_sharding           — shard batch dim over 'data' (DP)
  param_sharding           — FSDP-style over 'model'
  replicated_sharding      — full replication
  is_host_leader           — rank-0 gating (comm.is_main_process equiv)
  all_gather_metrics       — eval-metric aggregation across processes
"""

from __future__ import annotations

from lighthand_tpu.core.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    MeshSpec,
    batch_sharding,
    create_mesh,
    is_host_leader,
    param_sharding,
    replicated_sharding,
)


def all_gather_metrics(tree):
    """Gather per-process metric pytrees to every host.

    Replaces comm.all_gather's pickle-over-NCCL machinery
    (comm.py:104-144): in multi-process JAX, a single
    ``process_allgather`` moves host values over the runtime's ICI/DCN
    channels. With one process this is the identity.
    """
    import jax

    if jax.process_count() == 1:
        return [tree]
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)


__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "MeshSpec",
    "batch_sharding",
    "create_mesh",
    "is_host_leader",
    "param_sharding",
    "replicated_sharding",
    "all_gather_metrics",
]
