from lighthand_tpu.core.mesh import (
    MeshSpec,
    create_mesh,
    batch_sharding,
    replicated_sharding,
    param_sharding,
    is_host_leader,
)
from lighthand_tpu.core.dtypes import DTypePolicy, DEFAULT_POLICY

__all__ = [
    "MeshSpec",
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "param_sharding",
    "is_host_leader",
    "DTypePolicy",
    "DEFAULT_POLICY",
]
