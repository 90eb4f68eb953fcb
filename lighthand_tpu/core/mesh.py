"""Device mesh / sharding setup.

TPU-native replacement for the reference's (dormant) torch.distributed
helpers (``/root/reference/src/utils/comm.py:16-173`` and the
``DistributedSampler`` path in ``src/datasets/build.py:53-88``).

The reference only ever needs: (a) rank-0 gating for checkpoint saves and
logging, and (b) batch-parallel training. Here that maps to:

- a ``jax.sharding.Mesh`` with a ``data`` axis (DP over ICI) and an optional
  ``model`` axis (FSDP-style parameter sharding for scale-out);
- batch inputs sharded ``('data', None, ...)`` — gradient all-reduce is
  inserted by XLA when the jitted train step produces replicated params;
- host-leader gating via ``jax.process_index() == 0``.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Logical mesh description: #devices along data (DP) and model (FSDP) axes."""

    data: int = -1  # -1 = all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> "MeshSpec":
        model = max(1, self.model)
        data = self.data if self.data > 0 else n_devices // model
        if data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} does not cover {n_devices} devices"
            )
        return MeshSpec(data=data, model=model)


def create_mesh(
    spec: MeshSpec | None = None, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """Create a 2-D ('data','model') mesh over the available devices.

    With a single chip this degenerates to a 1x1 mesh, and every sharding
    below becomes trivially replicated — so the same jitted train step runs
    unchanged from 1 chip to a full pod slice.
    """
    devices = list(devices if devices is not None else jax.devices())
    spec = (spec or MeshSpec()).resolve(len(devices))
    dev_array = np.asarray(devices).reshape(spec.data, spec.model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, leaf: jax.Array | jax.ShapeDtypeStruct) -> NamedSharding:
    """FSDP-style sharding: shard the largest divisible dim over the model axis.

    With model=1 this is fully replicated. Parameters whose dims don't divide
    the model axis stay replicated (XLA handles mixed layouts fine).
    """
    n_model = mesh.shape[MODEL_AXIS]
    if n_model == 1 or not hasattr(leaf, "shape") or leaf.ndim == 0:
        return replicated_sharding(mesh)
    # Pick the largest dimension divisible by the model axis size.
    best = None
    for i, d in enumerate(leaf.shape):
        if d % n_model == 0 and d >= n_model:
            if best is None or d > leaf.shape[best]:
                best = i
    if best is None:
        return replicated_sharding(mesh)
    spec = [None] * leaf.ndim
    spec[best] = MODEL_AXIS
    return NamedSharding(mesh, P(*spec))


def is_host_leader() -> bool:
    """Replaces reference ``comm.is_main_process()`` (comm.py:32)."""
    return jax.process_index() == 0


def local_device_count() -> int:
    return jax.local_device_count()


def maybe_force_host_devices(n: int) -> None:
    """Testing helper: request n virtual CPU devices (set before jax init)."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()


def pad_to_multiple(batch: int, multiple: int) -> int:
    return int(math.ceil(batch / multiple) * multiple)
