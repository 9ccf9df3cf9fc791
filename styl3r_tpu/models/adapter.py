"""Raw head channels -> 3D Gaussians.

Equivalent of the reference UnifiedGaussianAdapter
(`src/model/encoder/common/gaussian_adapter.py:122-153`), as pure functions
over arrays (no parameters): split (3 scale, 4 quat, 3*d_sh SH), softplus-scale
with 0.3 clamp, quaternion normalize, SH degree mask, covariance R S Sᵀ Rᵀ.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from ..geometry.gaussians import Gaussians, build_covariance


def safe_normalize(x: Array, eps: float = 1e-8) -> Array:
    """Unit-normalize along the last axis with a backward that is smooth at
    x == 0. `x / (jnp.linalg.norm(x) + eps)` NaNs in the BACKWARD at an
    exactly-zero row (norm's grad is x/||x|| -> 0/0) — and exact-zero raw
    quaternion rows do occur in training (dead-relu pixel + zero bias in the
    gs head's final 1x1 conv; one such row poisoned the whole step-2 gradient
    through clip_by_global_norm in the round-5 overfit run). Keeping eps^2
    INSIDE the rsqrt matches torch F.normalize's clamp-inside behavior
    (reference gaussian_adapter.py rotations normalize) up to O(eps^2)."""
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps * eps)


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

    rotations = safe_normalize(rotations, eps)

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


def get_scale_multiplier(
    intrinsics: Array, pixel_size: Array, multiplier: float = 0.1
) -> Array:
    """Pixel-size-aware scale multiplier (gaussian_adapter.py:100-111)."""
    k2 = intrinsics[..., :2, :2]
    inv = jnp.linalg.inv(k2)
    xy = multiplier * jnp.einsum("...ij,...j->...i", inv, pixel_size)
    return jnp.sum(xy, axis=-1)


def posed_gaussian_adapter(
    extrinsics: Array,  # (..., 4, 4) c2w
    intrinsics: Array,  # (..., 3, 3) normalized
    coordinates: Array,  # (..., 2) normalized pixel coords
    depths: Array,  # (...)
    opacities: Array,  # (...)
    raw: Array,  # (..., 7 + 3*d_sh)
    image_shape,
    sh_degree: int,
    gaussian_scale_min: float = 0.5,
    gaussian_scale_max: float = 15.0,
    eps: float = 1e-8,
) -> Gaussians:
    """The posed (non-pose-free) adapter (gaussian_adapter.py:50-98): means
    unproject along camera rays at the predicted depth; scales are sigmoid-
    bounded in [min, max] and modulated by depth and pixel size; covariances
    rotate into world space with the camera rotation."""
    from ..geometry.projection import get_world_rays

    h, w = image_shape
    n_sh = d_sh(sh_degree)
    scales = raw[..., 0:3]
    rotations = raw[..., 3:7]
    sh = raw[..., 7 : 7 + 3 * n_sh]

    scales = gaussian_scale_min + (gaussian_scale_max - gaussian_scale_min) * (
        1.0 / (1.0 + jnp.exp(-scales))
    )
    pixel_size = jnp.asarray([1.0 / w, 1.0 / h], raw.dtype)
    multiplier = get_scale_multiplier(intrinsics, pixel_size)
    scales = scales * depths[..., None] * multiplier[..., None]

    rotations = safe_normalize(rotations, eps)
    sh = sh.reshape(*sh.shape[:-1], 3, n_sh) * sh_degree_mask(sh_degree, raw.dtype)

    # World-space covariance via quaternion composition: Rc (R S² Rᵀ) Rcᵀ =
    # (Rc R) S² (Rc R)ᵀ. Composing the camera rotation into the stored
    # quaternion keeps scales/rotations exactly consistent with covariances
    # (so the renderer's factor path and PLY export see world-frame
    # orientations; the reference's matrix sandwich gaussian_adapter.py:86-88
    # leaves its returned rotations camera-frame).
    from ..geometry.gaussians import quat_mul_xyzw, rotmat_to_quat_xyzw

    c2w_rot = extrinsics[..., :3, :3]
    q_cam = rotmat_to_quat_xyzw(c2w_rot)
    rotations = quat_mul_xyzw(q_cam, jnp.broadcast_to(rotations, (*scales.shape[:-1], 4)))
    covariances = build_covariance(scales, rotations)

    origins, directions = get_world_rays(coordinates, extrinsics, intrinsics)
    means = origins + directions * depths[..., None]

    return Gaussians(
        means=means,
        covariances=covariances,
        harmonics=sh,  # reference leaves SH unrotated (rotate_sh bypassed)
        opacities=opacities,
        scales=scales,
        rotations=rotations,
    )
