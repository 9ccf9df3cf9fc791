"""Tensor parallelism over a 2-D (data, model) mesh.

The reference scales by DDP only (SURVEY.md §2.8); data parallelism is all
parity requires. This module goes beyond parity for large-batch serving /
training on pods: Megatron-style parameter shardings for every transformer
block in the CroCo backbone and token stylizer — qkv/fc1 column-sharded,
proj/fc2 row-sharded over the `model` axis — expressed purely as
`jax.sharding` annotations. The model code is untouched: XLA's SPMD
partitioner inserts the all-reduces (one per block, riding ICI), and
anything without a rule (norms, conv heads, adapters) stays replicated.

Usage:
    mesh = make_mesh_2d(n_data, n_model)
    params = shard_params_tp(params, mesh)
    opt_state = tx.init(params)           # follows the param shardings
    step = jax.jit(train_step)            # shardings propagate from args
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_2d(
    n_data: Optional[int] = None,
    n_model: int = 1,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """A (data, model) mesh over the first n_data*n_model devices."""
    devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    use = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, axis_names)


# Column-parallel (output features sharded): the subsequent computation is
# per-head / per-hidden-unit local. Row-parallel (input features sharded):
# the matmul partial-sums all-reduce once per block.
_COLUMN = ("qkv", "projq", "projk", "projv", "fc1")
_ROW = ("proj", "fc2")


def tensor_parallel_spec(path) -> P:
    """PartitionSpec for one param leaf by its tree path (flax naming:
    .../attn/qkv/kernel, .../mlp/fc2/bias, ...)."""
    keys = [getattr(p, "key", str(p)) for p in path]
    if len(keys) < 2:
        return P()
    layer, leaf = keys[-2], keys[-1]
    if layer in _COLUMN:
        if leaf == "kernel":
            return P(None, "model")
        if leaf == "bias":
            return P("model")
    if layer in _ROW and leaf == "kernel":
        return P("model", None)
    return P()


def tensor_parallel_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a params tree (everything unmatched is
    replicated over the whole mesh)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: NamedSharding(mesh, tensor_parallel_spec(path)), params
    )


def shard_params_tp(params, mesh: Mesh):
    """Place params with Megatron-pattern shardings over `mesh`."""
    shardings = tensor_parallel_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def batch_sharding_2d(mesh: Mesh) -> NamedSharding:
    """Batch sharded over the data axis, replicated over model."""
    return NamedSharding(mesh, P("data"))
