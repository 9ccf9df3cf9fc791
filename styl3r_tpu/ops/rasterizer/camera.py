"""Camera setup for the Gaussian splatting rasterizer.

Produces the same view/projection convention as the reference's CUDA path
(`src/model/decoder/cuda_splatting.py:16-43,46-92`): view matrix = w2c,
projection maps the frustum to (-1,1) on x/y and (0,1) on z, and the optional
pose deltas (theta, rho) are applied to the w2c so gradients flow to camera
pose (the "w-pose" rasterizer fork's trick) — here they're ordinary traced
inputs and JAX autodiff handles them.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
from jax import Array

from ...geometry.projection import get_fov, invert_se3
from ...geometry.se3 import se3_exp


class RasterCamera(NamedTuple):
    """Static-shape camera bundle for one render (leading batch dims free)."""

    w2c: Array  # (..., 4, 4) world-to-camera
    cam_pos: Array  # (..., 3) camera center in world space
    tan_fov: Array  # (..., 2) = (tan(fov_x/2), tan(fov_y/2))
    focal: Array  # (..., 2) focal lengths in *pixels*
    principal: Array  # (..., 2) principal point in *pixels*
    near: Array  # (...)
    far: Array  # (...)


def make_raster_camera(
    extrinsics: Array,
    intrinsics: Array,
    near: Array,
    far: Array,
    image_shape: tuple[int, int],
    cam_rot_delta: Optional[Array] = None,
    cam_trans_delta: Optional[Array] = None,
) -> RasterCamera:
    """Build a RasterCamera from c2w extrinsics + normalized intrinsics.

    When pose deltas are given, w2c' = exp([rho, theta]) @ w2c — matching
    update_pose (`src/misc/cam_utils.py:117-140`) and the w-pose rasterizer.
    """
    h, w = image_shape
    w2c = invert_se3(extrinsics)
    if cam_rot_delta is not None or cam_trans_delta is not None:
        rot = (
            cam_rot_delta
            if cam_rot_delta is not None
            else jnp.zeros(extrinsics.shape[:-2] + (3,), extrinsics.dtype)
        )
        trans = (
            cam_trans_delta
            if cam_trans_delta is not None
            else jnp.zeros(extrinsics.shape[:-2] + (3,), extrinsics.dtype)
        )
        tau = jnp.concatenate([trans, rot], axis=-1)
        w2c = se3_exp(tau) @ w2c
    c2w = invert_se3(w2c)
    cam_pos = c2w[..., :3, 3]

    fov = get_fov(intrinsics)
    tan_fov = jnp.tan(0.5 * fov)
    # Normalized intrinsics fx,fy scaled to pixels; the EWA Jacobian and the
    # point projection both use pixel focal lengths.
    focal = jnp.stack(
        [intrinsics[..., 0, 0] * w, intrinsics[..., 1, 1] * h], axis=-1
    )
    principal = jnp.stack(
        [intrinsics[..., 0, 2] * w, intrinsics[..., 1, 2] * h], axis=-1
    )
    return RasterCamera(
        w2c=w2c,
        cam_pos=cam_pos,
        tan_fov=tan_fov,
        focal=focal,
        principal=principal,
        near=jnp.asarray(near),
        far=jnp.asarray(far),
    )
