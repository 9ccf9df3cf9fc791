"""SO(3)/SE(3) exponential maps and pose utilities, vectorized + jittable.

Functional equivalents of the reference `src/misc/cam_utils.py:69-140`
(skew/SO3_exp/V/SE3_exp/update_pose) and `:27-43` (camera_normalization),
written batched (the reference loops per sample) and branch-free (lax-friendly
`where` on the small-angle expansion instead of a Python `if`).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from .projection import invert_se3


def skew(v: Array) -> Array:
    """(…, 3) -> (…, 3, 3) skew-symmetric matrices."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    rows = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


def _safe_angle(theta: Array, eps: float) -> tuple[Array, Array]:
    """(angle, small-mask) computed NaN-safely for autodiff: sqrt is only ever
    taken of a value bounded away from zero, so d(angle)/d(theta) stays finite
    even at theta = 0 (where the Taylor branch is selected anyway)."""
    sq = jnp.sum(theta * theta, axis=-1)
    small = sq < eps * eps
    angle = jnp.sqrt(jnp.where(small, 1.0, sq))
    return angle, small


def so3_exp(theta: Array, eps: float = 1e-5) -> Array:
    """Rodrigues' formula with a Taylor fallback for small angles (batched)."""
    w = skew(theta)
    w2 = w @ w
    angle, small = _safe_angle(theta, eps)
    a = jnp.where(small, 1.0, jnp.sin(angle) / angle)
    b = jnp.where(small, 0.5, (1.0 - jnp.cos(angle)) / (angle**2))
    eye = jnp.eye(3, dtype=theta.dtype)
    return eye + a[..., None, None] * w + b[..., None, None] * w2


def _left_jacobian(theta: Array, eps: float = 1e-5) -> Array:
    w = skew(theta)
    w2 = w @ w
    angle, small = _safe_angle(theta, eps)
    b = jnp.where(small, 0.5, (1.0 - jnp.cos(angle)) / (angle**2))
    c = jnp.where(small, 1.0 / 6.0, (angle - jnp.sin(angle)) / (angle**3))
    eye = jnp.eye(3, dtype=theta.dtype)
    return eye + b[..., None, None] * w + c[..., None, None] * w2


def se3_exp(tau: Array) -> Array:
    """Exponential map from a (…, 6) twist [rho, theta] to a (…, 4, 4) transform."""
    rho, theta = tau[..., :3], tau[..., 3:]
    rot = so3_exp(theta)
    t = jnp.einsum("...ij,...j->...i", _left_jacobian(theta), rho)
    top = jnp.concatenate([rot, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=tau.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def update_pose(
    cam_trans_delta: Array, cam_rot_delta: Array, extrinsics: Array
) -> Array:
    """Left-multiply a small SE3 delta onto the w2c of a batch of c2w extrinsics
    and return the updated c2w. Reference: `src/misc/cam_utils.py:117-140`."""
    tau = jnp.concatenate([cam_trans_delta, cam_rot_delta], axis=-1)
    w2c = invert_se3(extrinsics)
    new_w2c = se3_exp(tau) @ w2c
    return invert_se3(new_w2c)


def camera_normalization(pivotal_pose: Array, poses: Array) -> Array:
    """Re-express c2w poses relative to a pivotal camera (which becomes identity).

    Reference: `src/misc/cam_utils.py:27-43`.
    pivotal_pose: (…, 4, 4); poses: (…, n, 4, 4) or (n, 4, 4).
    """
    return invert_se3(pivotal_pose) @ poses
