"""Device mesh and sharding utilities.

The reference had no distributed runtime at all (SURVEY.md §2.6); this module
is the whole "communication backend" of the TPU rebuild: a
``jax.sharding.Mesh`` over (data, model) axes plus NamedShardings. Gradient
all-reduce, parameter all-gather, etc. are inserted by XLA's SPMD partitioner
from these annotations and ride ICI — no hand-written collectives needed for
data/tensor parallelism.

Logical axis names used in the models (see models/transformer.py) map to mesh
axes through ``LOGICAL_AXIS_RULES``:

  batch  -> data      (batch dimension of activations)
  heads  -> model     (attention heads / qkv projections)
  mlp    -> model     (MLP hidden dimension)
  vocab/embed -> replicated by default

A 1-D ('data',) mesh gives pure DP (the parity requirement); a 2-D mesh
enables TP on the same annotations.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"
MODEL_AXIS = "model"

LOGICAL_AXIS_RULES = (
    ("batch", DATA_AXIS),
    ("heads", MODEL_AXIS),
    ("mlp", MODEL_AXIS),
    ("vocab", None),
    ("embed", None),
)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Joins a multi-host JAX runtime; returns (process_index, process_count).

    On TPU pods the arguments are discovered from the environment and may be
    omitted; on other platforms pass them explicitly. After this,
    ``jax.devices()`` spans every host, ``create_mesh`` builds a global mesh,
    and the CLI's dataset loading shards windows per host automatically
    (data/loader.py shard_count/shard_index). XLA's SPMD partitioner inserts
    the cross-host collectives — there is no custom transport (SURVEY §2.6).
    Single-process runs can skip this entirely.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index(), jax.process_count()


def create_mesh(data: Optional[int] = None, model: int = 1, devices=None) -> Mesh:
    """Builds a (data, model) mesh over the available devices.

    ``data=None`` uses all remaining devices on the data axis.
    """
    devices = devices if devices is not None else jax.devices()
    count = len(devices)
    if data is None:
        if count % model != 0:
            raise ValueError(f"{count} devices not divisible by model={model}")
        data = count // model
    if data * model != count:
        devices = devices[: data * model]
    grid = np.asarray(devices).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shards the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def make_global_batch(mesh: Mesh, local_batch) -> jax.Array:
    """Assembles per-host local batch rows into one global batch-sharded array.

    In a multi-host runtime each process loads only its shard of the batch
    (data/loader.py ``shard_count``/``shard_index``); this glues those local
    rows into a single global array laid out over the mesh's data axis. The
    global batch size is ``local rows x process_count``.
    """
    return jax.make_array_from_process_local_data(
        batch_sharding(mesh), np.asarray(local_batch)
    )


def logical_to_mesh_sharding(logical_specs, mesh: Mesh):
    """Resolves flax logical annotations to NamedShardings under the rules."""
    return nn.logical_to_mesh_sharding(logical_specs, mesh, LOGICAL_AXIS_RULES)


def infer_param_logical_specs(model, batch_size: int = 1,
                              window_size: int = 8):
    """Logical partition specs for a model's ``params`` tree, without
    materializing any weights.

    Inference-time TP (VERDICT r4 item 2): a restored checkpoint holds only
    unboxed arrays, but the model's ``nn.with_logical_partitioning``
    annotations are recoverable from an abstract init — ``jax.eval_shape``
    keeps the ``nn.Partitioned`` metadata boxes while allocating nothing.
    Feed the result to :func:`shard_params` to lay restored weights out over
    a (data, model) mesh for sharded generation/serving.
    """
    import jax.numpy as jnp

    def abstract_init():
        tokens = jnp.zeros((batch_size, window_size), jnp.int32)
        return model.init({"params": jax.random.PRNGKey(0)}, tokens)

    variables = jax.eval_shape(abstract_init)
    return nn.get_partition_spec(variables)["params"]


def shard_params(params, mesh: Mesh, logical_specs=None):
    """Places a parameter pytree on the mesh.

    With ``logical_specs`` (from ``nn.get_partition_spec`` on a pytree of
    ``nn.Partitioned`` leaves) parameters follow their logical annotations
    (enabling TP); otherwise everything is replicated (pure DP).
    """
    if logical_specs is not None:
        shardings = logical_to_mesh_sharding(logical_specs, mesh)
        return jax.device_put(params, shardings)
    return jax.device_put(params, replicated_sharding(mesh))
