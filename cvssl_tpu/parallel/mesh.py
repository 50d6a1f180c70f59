"""Device mesh + sharding helpers.

The reference is strictly single-GPU (SURVEY §2.7: its only 'distributed'
artifacts are dead NCCL code). Here parallelism is first-class: a 1-D
``data`` mesh over all local devices (ICI on a TPU slice), batches sharded on
the batch axis, parameters replicated. Collectives are implicit through
GSPMD — BatchNorm statistics, loss reductions, and gradient averaging all
become cross-device automatically once inputs carry shardings.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code spans hosts (DCN axis folded into ``data``).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first ``num_devices`` devices (default: all)."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict, axis: str = "data") -> dict:
    """Device-put a host batch dict with the batch dim sharded over the mesh.

    Batch sizes must divide the mesh size — the engine pads/validates
    upstream (static shapes keep XLA happy).
    """
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate_state(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), tree)
