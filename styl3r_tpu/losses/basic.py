"""Simple pixel losses (reference src/loss/loss_mse.py)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def mse_loss(pred: Array, target: Array, weight: float = 1.0) -> Array:
    return weight * jnp.mean((pred - target) ** 2)
