"""Device mesh + sharding rules.

The reference's distributed story is Lightning DDP over NCCL — pure data
parallelism (SURVEY.md §2.8). The TPU-native equivalent is a 1-D `data` mesh
over ICI: parameters replicated, batches sharded on the leading dim, and XLA
inserts the gradient all-reduce inside the jitted train step. Sequences are
short (~1k tokens) and the model fits one chip, so no tensor/pipeline
parallelism is needed for parity; the mesh helpers are written so a second
axis can be added later without touching call sites.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """A 1-D data-parallel mesh over the first n (default: all) devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place every array in a batch pytree with its leading dim sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
