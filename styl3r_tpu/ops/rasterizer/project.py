"""EWA projection of 3D Gaussians to screen space.

The per-gaussian preprocessing stage of the 3DGS rasterizer (the reference's
external `diff-gaussian-rasterization-w-pose` CUDA kernel does this in
`preprocessCUDA`): transform means to camera space, project the 3x3 covariance
through the local affine (EWA) approximation of the perspective map, add the
0.3-pixel anti-aliasing floor, invert to conic form, and bound the splat by a
3-sigma radius. All plain jnp — XLA vectorizes this across gaussians; the
dense part of the pipeline (tile compositing) lives in render.py / pallas.

Convention: pixel (i, j) has center (x=j, y=i) — the CUDA ndc2Pix convention —
so mean2d_x = fx_px * tx/tz + cx_px - 0.5.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
from jax import Array

from .camera import RasterCamera


class ProjectedGaussians(NamedTuple):
    """Screen-space gaussians as a structure of (g,)-shaped component vectors.

    Deliberately SoA: (g, 2)/(g, 3) arrays tile their minor dim onto the
    128-lane axis on TPU (2 -> 128 / 3 -> 128 padding, 42-64x wasted bytes
    whenever such an intermediate materializes between fusions — measured as
    most of a ~13 ms in-situ overhead on the full forward). Flat (g,) vectors
    pad nothing. Use the `means2d` / `conics` properties for AoS views in
    tests/debug code only."""

    mean_x: Array  # (g,) pixel x
    mean_y: Array  # (g,) pixel y
    depths: Array  # (g,) camera-space z
    con_a: Array  # (g,) inverse 2D covariance components (a, b, c)
    con_b: Array  # (g,)   for the quadratic a x^2 + 2 b x y + c y^2
    con_c: Array  # (g,)
    radii: Array  # (g,) 3-sigma screen radius in pixels (0 = culled)
    mask: Array  # (g,) bool, survives near-plane/deterministic culling

    @property
    def means2d(self) -> Array:  # (g, 2) AoS view (tests/debug)
        return jnp.stack([self.mean_x, self.mean_y], axis=-1)

    @property
    def conics(self) -> Array:  # (g, 3) AoS view (tests/debug)
        return jnp.stack([self.con_a, self.con_b, self.con_c], axis=-1)


NEAR_CULL = 0.2  # matches the CUDA rasterizer's hardcoded near threshold
COV_BLUR = 0.3  # low-pass floor added to the 2D covariance diagonal


def project_gaussians(
    camera: RasterCamera,
    means: Array,
    covariances: Optional[Array] = None,
    scales: Optional[Array] = None,
    rotations: Optional[Array] = None,
) -> ProjectedGaussians:
    """Project world-space gaussians into screen space for one camera.

    Args:
      camera: RasterCamera with unbatched fields (use vmap for view batches).
      means: (g, 3) world-space centers.
      covariances: (g, 3, 3) world-space covariances; OR
      scales/rotations: (g, 3) + (g, 4) xyzw — the covariance factors. Passing
        the factors lets the Σ components fuse into this projection, so the
        padded (g, 3, 3) tensor (3x3 minor tile pads to 8x128 on TPU) is never
        materialized; when only rendered outputs are consumed downstream, XLA
        dead-code-eliminates the adapter's (g, 3, 3) assembly entirely.
    """
    # All math runs on (g,)-shaped component vectors: (g, 3)/(g, 3, 3)
    # elementwise ops put the tiny minor dims on the 128-lane axis and waste
    # ~42x of every register (measured: the einsum formulation cost 4.7 ms
    # for 131k gaussians; this scalar form is bandwidth-bound).
    rot = camera.w2c[:3, :3]
    trans = camera.w2c[:3, 3]
    wx, wy, wz = means[:, 0], means[:, 1], means[:, 2]
    r = [[rot[i, j] for j in range(3)] for i in range(3)]
    tx = r[0][0] * wx + r[0][1] * wy + r[0][2] * wz + trans[0]
    ty = r[1][0] * wx + r[1][1] * wy + r[1][2] * wz + trans[1]
    tz = r[2][0] * wx + r[2][1] * wy + r[2][2] * wz + trans[2]

    fx, fy = camera.focal[0], camera.focal[1]
    tan_x, tan_y = camera.tan_fov[0], camera.tan_fov[1]

    # Clamp the camera-space x/y used for the Jacobian to 1.3x the frustum,
    # as the CUDA preprocessing does, to keep the EWA approximation sane for
    # off-screen gaussians.
    safe_z = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    lim_x, lim_y = 1.3 * tan_x, 1.3 * tan_y
    txz = jnp.clip(tx / safe_z, -lim_x, lim_x) * safe_z
    tyz = jnp.clip(ty / safe_z, -lim_y, lim_y) * safe_z

    inv_z = 1.0 / safe_z
    inv_z2 = inv_z * inv_z
    # J: local affine approximation of perspective projection; rows
    # [fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2].
    j00 = fx * inv_z
    j02 = -fx * txz * inv_z2
    j11 = fy * inv_z
    j12 = -fy * tyz * inv_z2

    # M = J @ R (2 x 3), expanded per component.
    m00 = j00 * r[0][0] + j02 * r[2][0]
    m01 = j00 * r[0][1] + j02 * r[2][1]
    m02 = j00 * r[0][2] + j02 * r[2][2]
    m10 = j11 * r[1][0] + j12 * r[2][0]
    m11 = j11 * r[1][1] + j12 * r[2][1]
    m12 = j11 * r[1][2] + j12 * r[2][2]

    # cov2d = M Sigma M^T with Sigma symmetric: pull the 6 unique components.
    if covariances is not None:
        s00 = covariances[:, 0, 0]
        s01 = covariances[:, 0, 1]
        s02 = covariances[:, 0, 2]
        s11 = covariances[:, 1, 1]
        s12 = covariances[:, 1, 2]
        s22 = covariances[:, 2, 2]
    else:
        from ...geometry.gaussians import covariance_components

        s00, s01, s02, s11, s12, s22 = covariance_components(scales, rotations)
    # u_i = (Sigma M^T)[:, i] for row i of M.
    u0x = s00 * m00 + s01 * m01 + s02 * m02
    u0y = s01 * m00 + s11 * m01 + s12 * m02
    u0z = s02 * m00 + s12 * m01 + s22 * m02
    a = m00 * u0x + m01 * u0y + m02 * u0z + COV_BLUR
    b = m10 * u0x + m11 * u0y + m12 * u0z
    u1x = s00 * m10 + s01 * m11 + s02 * m12
    u1y = s01 * m10 + s11 * m11 + s12 * m12
    u1z = s02 * m10 + s12 * m11 + s22 * m12
    c = m10 * u1x + m11 * u1y + m12 * u1z + COV_BLUR

    det = a * c - b * b
    det_safe = jnp.where(det <= 0, 1.0, det)

    # 3-sigma extent from the larger eigenvalue of cov2d.
    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    lambda1 = mid + disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)))

    # Screen-space center (pixel (i, j) has center (x=j, y=i), hence the -0.5).
    mean_x = fx * tx * inv_z + camera.principal[0] - 0.5
    mean_y = fy * ty * inv_z + camera.principal[1] - 0.5

    valid = (tz > NEAR_CULL) & (det > 0)
    radius = jnp.where(valid, radius, 0.0)
    return ProjectedGaussians(
        mean_x=mean_x,
        mean_y=mean_y,
        depths=tz,
        con_a=c / det_safe,
        con_b=-b / det_safe,
        con_c=a / det_safe,
        radii=radius,
        mask=valid,
    )


# --- Spherical harmonics -> view-dependent RGB -------------------------------

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def eval_sh(harmonics: Array, directions: Array) -> Array:
    """Evaluate SH color per gaussian: (g, 3, d_sh), (g, 3) -> (g, 3) RGB.

    Matches the CUDA `computeColorFromSH`: result + 0.5, clamped at 0.
    """
    d_sh = harmonics.shape[-1]
    result = SH_C0 * harmonics[..., 0]
    if d_sh > 1:
        x = directions[..., 0:1]
        y = directions[..., 1:2]
        z = directions[..., 2:3]
        result = (
            result
            - SH_C1 * y * harmonics[..., 1]
            + SH_C1 * z * harmonics[..., 2]
            - SH_C1 * x * harmonics[..., 3]
        )
        if d_sh > 4:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + SH_C2[0] * xy * harmonics[..., 4]
                + SH_C2[1] * yz * harmonics[..., 5]
                + SH_C2[2] * (2.0 * zz - xx - yy) * harmonics[..., 6]
                + SH_C2[3] * xz * harmonics[..., 7]
                + SH_C2[4] * (xx - yy) * harmonics[..., 8]
            )
            if d_sh > 9:
                result = (
                    result
                    + SH_C3[0] * y * (3.0 * xx - yy) * harmonics[..., 9]
                    + SH_C3[1] * xy * z * harmonics[..., 10]
                    + SH_C3[2] * y * (4.0 * zz - xx - yy) * harmonics[..., 11]
                    + SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * harmonics[..., 12]
                    + SH_C3[4] * x * (4.0 * zz - xx - yy) * harmonics[..., 13]
                    + SH_C3[5] * z * (xx - yy) * harmonics[..., 14]
                    + SH_C3[6] * x * (xx - 3.0 * yy) * harmonics[..., 15]
                )
    return jnp.maximum(result + 0.5, 0.0)
