"""Splatting decoder: Gaussians + target cameras -> rendered images.

Equivalent of `DecoderSplattingCUDA` + `render_cuda`
(`src/model/decoder/decoder_splatting_cuda.py:37-68`,
`src/model/decoder/cuda_splatting.py:46-133`), but fully batched: the
reference loops Python-side per (batch*view); here the whole render is
vmapped over (b, v) inside one jit.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..geometry.gaussians import Gaussians
from ..ops.rasterizer import make_raster_camera, render


class DecoderOutput(NamedTuple):
    color: Array  # (b, v, h, w, 3)
    depth: Array  # (b, v, h, w)
    alpha: Array  # (b, v, h, w)


def render_gaussians(
    gaussians: Gaussians,
    extrinsics: Array,
    intrinsics: Array,
    near: Array,
    far: Array,
    image_shape: Tuple[int, int],
    background_color: Optional[Array] = None,
    scale_invariant: bool = False,
    cam_rot_delta: Optional[Array] = None,
    cam_trans_delta: Optional[Array] = None,
    *,
    max_tiles_per_gaussian: int = 32,
    max_per_tile: int = 4096,
    chunk: int = 64,
    impl: str = "jnp",
) -> DecoderOutput:
    """Render each scene's Gaussians into its (b, v) target cameras.

    Args:
      gaussians: batched (b, g, ...) Gaussians.
      extrinsics: (b, v, 4, 4) c2w; intrinsics: (b, v, 3, 3) normalized.
      near/far: (b, v).
      scale_invariant: rescale the scene by 1/near per view before rendering
        (cuda_splatting.py:64-72) to avoid numerical issues with tiny nears.
    """
    b, v = extrinsics.shape[:2]
    h, w = image_shape
    if background_color is None:
        background_color = jnp.zeros((3,), jnp.float32)
    background_color = jnp.broadcast_to(background_color, (b, v, 3))

    means = gaussians.means
    covs = gaussians.covariances
    shs = gaussians.harmonics
    opas = gaussians.opacities

    if cam_rot_delta is None:
        cam_rot_delta = jnp.zeros((b, v, 3), extrinsics.dtype)
    if cam_trans_delta is None:
        cam_trans_delta = jnp.zeros((b, v, 3), extrinsics.dtype)

    def render_one(ext, intr, nr, fr, bg, rot_d, trans_d, mns, cvs, sh, op):
        if scale_invariant:
            scale = 1.0 / nr
            ext = ext.at[:3, 3].multiply(scale)
            mns = mns * scale
            cvs = cvs * scale**2
            nr = nr * scale
            fr = fr * scale
        cam = make_raster_camera(
            ext, intr, nr, fr, image_shape, cam_rot_delta=rot_d, cam_trans_delta=trans_d
        )
        return render(
            cam, mns, cvs, sh, op, image_shape, bg,
            max_tiles_per_gaussian=max_tiles_per_gaussian,
            max_per_tile=max_per_tile,
            chunk=chunk,
            impl=impl,
        )

    # vmap over views (gaussians shared), then over batch.
    per_view = jax.vmap(render_one, in_axes=(0, 0, 0, 0, 0, 0, 0, None, None, None, None))
    per_batch = jax.vmap(per_view, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    out = per_batch(
        extrinsics, intrinsics, near, far, background_color,
        cam_rot_delta, cam_trans_delta, means, covs, shs, opas,
    )
    return DecoderOutput(color=out.color, depth=out.depth, alpha=out.alpha)


def render_orthographic(
    gaussians: Gaussians,
    extrinsics: Array,  # (b, v, 4, 4) c2w
    width: Array,  # (b, v) world-units view width
    height: Array,  # (b, v)
    near: Array,
    far: Array,
    image_shape: Tuple[int, int],
    fov_degrees: float = 0.1,
    **render_kwargs,
) -> DecoderOutput:
    """Orthographic-style projection for top-down gaussian/camera
    visualizations (reference render_cuda_orthographic,
    cuda_splatting.py:136-227): fake orthography by pulling the camera far
    back with a tiny field of view."""
    h, w = image_shape
    fov_x = jnp.deg2rad(jnp.asarray(fov_degrees))
    tan_fov_x = jnp.tan(0.5 * fov_x)
    distance = (0.5 * width) / tan_fov_x
    tan_fov_y = 0.5 * height / distance

    # Move each camera back along its own -z.
    def backed(ext, d):
        m = jnp.eye(4).at[2, 3].set(-d)
        return ext @ m

    b, v = extrinsics.shape[:2]
    ext_flat = extrinsics.reshape(b * v, 4, 4)
    d_flat = distance.reshape(b * v)
    new_ext = jax.vmap(backed)(ext_flat, d_flat).reshape(b, v, 4, 4)

    # Normalized intrinsics with the tiny fov: fx = 1/(2 tan_x).
    fx = 1.0 / (2.0 * tan_fov_x)
    fy = 1.0 / (2.0 * tan_fov_y)
    k = jnp.zeros((b, v, 3, 3))
    k = k.at[..., 0, 0].set(fx)
    k = k.at[..., 1, 1].set(fy)
    k = k.at[..., 0, 2].set(0.5)
    k = k.at[..., 1, 2].set(0.5)
    k = k.at[..., 2, 2].set(1.0)

    return render_gaussians(
        gaussians, new_ext, k, near + distance, far + distance, image_shape,
        **render_kwargs,
    )
