"""Depth smoothness loss (reference src/loss/loss_depth.py:26-59; disabled in
all release configs, kept for parity): penalize rendered-depth gradients,
optionally downweighted at image edges (bilateral weighting)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import Array


def depth_smoothness_loss(
    depth: Array,  # (..., h, w)
    image: Optional[Array] = None,  # (..., h, w, 3) for bilateral weighting
    weight: float = 1.0,
    sigma: float = 10.0,
) -> Array:
    dzdx = jnp.abs(depth[..., :, 1:] - depth[..., :, :-1])
    dzdy = jnp.abs(depth[..., 1:, :] - depth[..., :-1, :])
    if image is not None:
        didx = jnp.mean(jnp.abs(image[..., :, 1:, :] - image[..., :, :-1, :]), axis=-1)
        didy = jnp.mean(jnp.abs(image[..., 1:, :, :] - image[..., :-1, :, :]), axis=-1)
        dzdx = dzdx * jnp.exp(-sigma * didx)
        dzdy = dzdy * jnp.exp(-sigma * didy)
    return weight * (jnp.mean(dzdx) + jnp.mean(dzdy))
