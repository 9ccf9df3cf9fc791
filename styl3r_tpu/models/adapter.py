"""Raw head channels -> 3D Gaussians.

Equivalent of the reference UnifiedGaussianAdapter
(`src/model/encoder/common/gaussian_adapter.py:122-153`), as pure functions
over arrays (no parameters): split (3 scale, 4 quat, 3*d_sh SH), softplus-scale
with 0.3 clamp, quaternion normalize, SH degree mask, covariance R S Sᵀ Rᵀ.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from ..geometry.gaussians import Gaussians, build_covariance


def sh_degree_mask(sh_degree: int, dtype=jnp.float32) -> Array:
    """Per-coefficient mask biasing init toward the DC component:
    0.1 * 0.25**degree for degree >= 1 (gaussian_adapter.py:42-48)."""
    d_sh = (sh_degree + 1) ** 2
    mask = jnp.ones((d_sh,), dtype)
    for degree in range(1, sh_degree + 1):
        mask = mask.at[degree**2 : (degree + 1) ** 2].set(0.1 * 0.25**degree)
    return mask


def d_sh(sh_degree: int) -> int:
    return (sh_degree + 1) ** 2


def raw_gaussian_channels(sh_degree: int) -> int:
    """7 (scale+quat) + 3*d_sh, excluding the leading opacity channel."""
    return 7 + 3 * d_sh(sh_degree)


def map_pdf_to_opacity(
    pdf: Array, global_step: Array | int, initial: float = 0.0, final: float = 0.0,
    warm_up: int = 1,
) -> Array:
    """Opacity warm-up schedule (encoder_noposplat_multi_token_style.py:115-128).
    With the release config (initial=final=0) this is the identity."""
    x = initial + jnp.minimum(jnp.asarray(global_step, jnp.float32) / warm_up, 1.0) * (
        final - initial
    )
    exponent = 2.0**x
    return 0.5 * (1.0 - (1.0 - pdf) ** exponent + pdf ** (1.0 / exponent))


def unified_gaussian_adapter(
    means: Array,
    opacities: Array,
    raw: Array,
    sh_degree: int,
    eps: float = 1e-8,
) -> Gaussians:
    """Pose-free adapter: means come straight from the pts3d head.

    Args:
      means: (..., 3); opacities: (...); raw: (..., 7 + 3*d_sh).
    """
    n_sh = d_sh(sh_degree)
    scales = raw[..., 0:3]
    rotations = raw[..., 3:7]
    sh = raw[..., 7 : 7 + 3 * n_sh]

    scales = 0.001 * jnp.logaddexp(scales, 0.0)  # softplus
    scales = jnp.minimum(scales, 0.3)

    rotations = rotations / (jnp.linalg.norm(rotations, axis=-1, keepdims=True) + eps)

    sh = sh.reshape(*sh.shape[:-1], 3, n_sh) * sh_degree_mask(sh_degree, raw.dtype)

    covariances = build_covariance(scales, rotations)
    return Gaussians(
        means=means,
        covariances=covariances,
        harmonics=sh,
        opacities=opacities,
        scales=scales,
        rotations=rotations,
    )
