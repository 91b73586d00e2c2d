"""Device-mesh parallelism: mesh construction, sharding rules, collectives."""

from composer_tpu.parallel.mesh import (
    LOGICAL_AXIS_RULES,
    batch_sharding,
    create_mesh,
    initialize_multihost,
    replicated_sharding,
    shard_params,
)

__all__ = [
    "LOGICAL_AXIS_RULES",
    "batch_sharding",
    "create_mesh",
    "initialize_multihost",
    "replicated_sharding",
    "shard_params",
]
