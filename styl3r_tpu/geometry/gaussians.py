"""3D Gaussian primitives as a JAX pytree.

Mirrors the reference contract `src/model/types.py:8-13` (means, covariances,
harmonics, opacities) plus the scales/rotations kept for PLY export
(`src/model/encoder/common/gaussian_adapter.py:15-22`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class Gaussians(NamedTuple):
    """A batch of 3D Gaussians.

    Shapes (leading batch dims are free):
      means:       [..., g, 3]
      covariances: [..., g, 3, 3]
      harmonics:   [..., g, 3, d_sh]
      opacities:   [..., g]
      scales:      [..., g, 3]   (optional; for PLY export)
      rotations:   [..., g, 4]   (optional; xyzw quaternions, for PLY export)
    """

    means: jax.Array
    covariances: jax.Array
    harmonics: jax.Array
    opacities: jax.Array
    scales: Optional[jax.Array] = None
    rotations: Optional[jax.Array] = None


def quat_to_rotmat(quat_xyzw: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Convert xyzw quaternions to rotation matrices.

    Matches the scipy/xyzw ordering used by the reference
    (`src/model/encoder/common/gaussians.py:8-30`). Accepts unnormalized
    quaternions; normalization via 2/|q|^2 is built in.
    """
    i, j, k, r = jnp.moveaxis(quat_xyzw, -1, 0)
    two_s = 2.0 / (jnp.sum(quat_xyzw * quat_xyzw, axis=-1) + eps)
    rot = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return rot.reshape(*rot.shape[:-1], 3, 3)


def build_covariance(scales: jax.Array, rotations_xyzw: jax.Array) -> jax.Array:
    """World-space covariance Σ = R S Sᵀ Rᵀ from per-axis scales and a quaternion.

    Reference: `src/model/encoder/common/gaussians.py:33-45`. Formulated without
    materializing diag matrices: Σ = (R * s²[None, :]) @ Rᵀ, which XLA fuses better.
    """
    rot = quat_to_rotmat(rotations_xyzw)
    s2 = scales * scales
    return jnp.einsum("...ik,...k,...jk->...ij", rot, s2, rot)


def covariance_to_upper_triangle(cov: jax.Array) -> jax.Array:
    """Pack a symmetric 3x3 covariance into its 6-vector upper triangle
    (xx, xy, xz, yy, yz, zz) — the storage layout of 3DGS rasterizers
    (`src/model/decoder/cuda_splatting.py:118,126`)."""
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def upper_triangle_to_covariance(tri: jax.Array) -> jax.Array:
    """Inverse of :func:`covariance_to_upper_triangle`."""
    xx, xy, xz, yy, yz, zz = jnp.moveaxis(tri, -1, 0)
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
