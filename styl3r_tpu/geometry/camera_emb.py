"""Pixelwise camera-intrinsics embedding.

Equivalent of `src/geometry/camera_emb.py` + `src/misc/sht.py` (rsh_cart_*):
per-pixel local ray directions expanded in a real spherical-harmonics basis,
used by the 'pixelwise' intrinsics-embedding mode of the backbone (the
release configs use the 'token' mode instead; this exists for config parity).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from .projection import get_local_rays_basis, sample_image_grid

# Real SH constants (graphics convention, consistent with ops.rasterizer.project).
C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)
C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
      -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
      0.47308734787878004, -1.7701307697799304, 0.6258357354491761)


def rsh_cart(dirs: Array, degree: int) -> Array:
    """Real spherical harmonics basis of unit directions (..., 3) up to
    `degree` (0..4) -> (..., (degree+1)^2)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full_like(x, C0)]
    if degree >= 1:
        out += [-C1 * y, C1 * z, -C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
        ]
    if degree >= 3:
        out += [
            C3[0] * y * (3.0 * xx - yy),
            C3[1] * xy * z,
            C3[2] * y * (4.0 * zz - xx - yy),
            C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            C3[4] * x * (4.0 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3.0 * yy),
        ]
    if degree >= 4:
        out += [
            C4[0] * xy * (xx - yy),
            C4[1] * yz * (3.0 * xx - yy),
            C4[2] * xy * (7.0 * zz - 1.0),
            C4[3] * yz * (7.0 * zz - 3.0),
            C4[4] * (zz * (35.0 * zz - 30.0) + 3.0),
            C4[5] * xz * (7.0 * zz - 3.0),
            C4[6] * (xx - yy) * (7.0 * zz - 1.0),
            C4[7] * xz * (xx - 3.0 * yy),
            C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
        ]
    if degree > 4:
        raise ValueError("rsh_cart supports degree <= 4")
    return jnp.stack(out, axis=-1)


def get_intrinsic_embedding(
    intrinsics: Array, image_shape, degree: int = 4
) -> Array:
    """Per-pixel intrinsics conditioning (camera_emb.py:7-29): unit local ray
    directions expanded in the SH basis (degree 0 -> the raw directions).

    Args: intrinsics (..., 3, 3) normalized; image_shape (h, w).
    Returns (..., h, w, c) with c = 3 (degree 0) or (degree+1)^2.
    """
    h, w = image_shape
    coords, _ = sample_image_grid((h, w))
    dirs = get_local_rays_basis(coords, intrinsics[..., None, None, :, :])
    if degree <= 0:
        return dirs
    return rsh_cart(dirs, degree)
