"""Device mesh + sharding helpers.

The reference's distribution story is Accelerate DDP over NCCL
(reference:utils/train_utils.py:97-122). The TPU-native equivalent is a
``jax.sharding.Mesh`` with axes ``('data', 'model')``: batches shard over
``data``, parameters replicate (or shard over ``model`` for TP), and XLA
inserts the gradient ``psum`` over ICI at the jit boundary — there is no
user-level collective to write for DP training.

Multi-host: call ``maybe_initialize_distributed()`` first (no-op on a single
host), then ``make_mesh()`` uses the global device set over DCN.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_initialize_distributed():
    """jax.distributed.initialize() iff a multi-host env is configured."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(mesh_shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """('data', 'model') mesh; default = all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (n, 1)
    d, m = mesh_shape
    assert d * m == n, f"mesh {mesh_shape} != {n} devices"
    arr = np.asarray(devices).reshape(d, m)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Batch dim over the data axis (``batch_axis=1`` for step-stacked
    [K, B, ...] multi-step batches — see trainer steps_per_dispatch)."""
    return NamedSharding(mesh, P(*((None,) * batch_axis + (DATA_AXIS,))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, batch_axis: int = 0):
    """Put a host batch (pytree of arrays) onto the mesh, sharded on the
    batch dim (axis ``batch_axis``)."""
    s = batch_sharding(mesh, batch_axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)
