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


def covariance_components(scales: jax.Array, rotations_xyzw: jax.Array):
    """The 6 unique components of Σ = R S Sᵀ Rᵀ as (…,)-shaped vectors
    (c00, c01, c02, c11, c12, c22).

    This is the lane-efficient core of `build_covariance`; the renderer's
    projection consumes these directly (ops/rasterizer/project.py), which lets
    XLA skip materializing the padded (g, 3, 3) tensor entirely on the hot
    path (a 3x3 minor-dim tile pads to 8x128 on TPU — 42x wasted bytes).
    """
    i, j, k, r = jnp.moveaxis(rotations_xyzw, -1, 0)
    two_s = 2.0 / (jnp.sum(rotations_xyzw * rotations_xyzw, axis=-1) + 1e-8)
    r00 = 1 - two_s * (j * j + k * k)
    r01 = two_s * (i * j - k * r)
    r02 = two_s * (i * k + j * r)
    r10 = two_s * (i * j + k * r)
    r11 = 1 - two_s * (i * i + k * k)
    r12 = two_s * (j * k - i * r)
    r20 = two_s * (i * k - j * r)
    r21 = two_s * (j * k + i * r)
    r22 = 1 - two_s * (i * i + j * j)
    s0 = scales[..., 0] ** 2
    s1 = scales[..., 1] ** 2
    s2 = scales[..., 2] ** 2
    # Σ_ab = sum_k R_ak s_k R_bk (6 unique entries).
    c00 = r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2
    c01 = r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2
    c02 = r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2
    c11 = r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2
    c12 = r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2
    c22 = r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2
    return c00, c01, c02, c11, c12, c22


def build_covariance(scales: jax.Array, rotations_xyzw: jax.Array) -> jax.Array:
    """World-space covariance Σ = R S Sᵀ Rᵀ from per-axis scales and a quaternion.

    Reference: `src/model/encoder/common/gaussians.py:33-45`. Expanded as
    scalar component math on (..., g)-shaped vectors — (g, 3, 3) einsums put
    the tiny matrix dims on the 128-lane axis and waste ~42x of every
    register (same finding as the EWA projection, ops/rasterizer/project.py).
    Only the final (..., 3, 3) assembly materializes matrices.
    """
    c00, c01, c02, c11, c12, c22 = covariance_components(scales, rotations_xyzw)
    cov = jnp.stack([c00, c01, c02, c01, c11, c12, c02, c12, c22], axis=-1)
    return cov.reshape(*cov.shape[:-1], 3, 3)


def quat_mul_xyzw(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product q1 ⊗ q2 for xyzw quaternions (rotation composition:
    the result rotates by q2 first, then q1)."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def rotmat_to_quat_xyzw(rot: jax.Array) -> jax.Array:
    """(…, 3, 3) rotation matrix -> xyzw unit quaternion (branchless
    Shepperd variant: compute all four candidate quadrupoles, pick the one
    keyed by the largest diagonal combination — numerically stable for every
    rotation, jit-friendly)."""
    m00, m01, m02 = rot[..., 0, 0], rot[..., 0, 1], rot[..., 0, 2]
    m10, m11, m12 = rot[..., 1, 0], rot[..., 1, 1], rot[..., 1, 2]
    m20, m21, m22 = rot[..., 2, 0], rot[..., 2, 1], rot[..., 2, 2]
    # Four candidates, each safe in a different region; q_abs holds 2|q_i|.
    tw = 1.0 + m00 + m11 + m22
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22
    sw = jnp.sqrt(jnp.maximum(tw, 1e-12))
    sx = jnp.sqrt(jnp.maximum(tx, 1e-12))
    sy = jnp.sqrt(jnp.maximum(ty, 1e-12))
    sz = jnp.sqrt(jnp.maximum(tz, 1e-12))
    qx = jnp.stack([sx / 2, (m01 + m10) / (2 * sx), (m02 + m20) / (2 * sx),
                    (m21 - m12) / (2 * sx)], -1)
    qy = jnp.stack([(m01 + m10) / (2 * sy), sy / 2, (m12 + m21) / (2 * sy),
                    (m02 - m20) / (2 * sy)], -1)
    qz = jnp.stack([(m02 + m20) / (2 * sz), (m12 + m21) / (2 * sz), sz / 2,
                    (m10 - m01) / (2 * sz)], -1)
    qw = jnp.stack([(m21 - m12) / (2 * sw), (m02 - m20) / (2 * sw),
                    (m10 - m01) / (2 * sw), sw / 2], -1)
    # Pick per element the candidate with the largest magnitude seed.
    seeds = jnp.stack([tx, ty, tz, tw], -1)
    best = jnp.argmax(seeds, axis=-1)
    cands = jnp.stack([qx, qy, qz, qw], -2)  # (..., 4 candidates, 4 comps [x,y,z,w])
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


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
