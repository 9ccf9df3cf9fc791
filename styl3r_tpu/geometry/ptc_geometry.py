"""Point-cloud geometry utilities (reference src/geometry/ptc_geometry.py).

JAX ports of the DUSt3R point-map helpers the reference carries: general
geometric transforms (geotrf), depth-map unprojection, joint point-cloud
normalization in the reference's norm modes, and the COLMAP/OpenCV intrinsics
convention shims. Mask-weighted means/quantiles replace the reference's
NaN-based reductions (no nanmedian under jit; identical results on the valid
set). Round-1 carried only the Regr3D subset (losses/regr3d.py); this module
completes the surface.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array


def geotrf(trf: Array, pts: Array, ncol: Optional[int] = None, norm: float = 0.0) -> Array:
    """Apply a (batched) geometric transform to points
    (ptc_geometry.py:41-102): trf (..., d, d) or (..., d+1, d+1) acting on pts
    (..., d); `norm` != 0 projects onto the z=norm plane."""
    d = pts.shape[-1]
    if trf.shape[-1] == d:
        out = jnp.einsum("...ij,...j->...i", trf, pts)
    elif trf.shape[-1] == d + 1:
        out = (
            jnp.einsum("...ij,...j->...i", trf[..., :d, :d], pts)
            + trf[..., :d, d]
        )
    else:
        raise ValueError(f"transform {trf.shape} incompatible with points {pts.shape}")
    if norm:
        out = out / out[..., -1:]
        if norm != 1:
            out = out * norm
    if ncol is not None:
        out = out[..., :ncol]
    return out


def depthmap_to_camera_coordinates(
    depthmap: Array, intrinsics: Array
) -> Tuple[Array, Array]:
    """(h, w) depth + pixel-unit (3, 3) K -> camera-frame (h, w, 3) points +
    validity mask (ptc_geometry.py:166-198; pinhole, no distortion)."""
    h, w = depthmap.shape
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    u, v = jnp.meshgrid(jnp.arange(w), jnp.arange(h), indexing="xy")
    z = depthmap
    x = (u - cx) * z / fx
    y = (v - cy) * z / fy
    return jnp.stack([x, y, z], axis=-1), z > 0.0


def depthmap_to_absolute_camera_coordinates(
    depthmap: Array, intrinsics: Array, camera_pose: Array
) -> Tuple[Array, Array]:
    """Same, then into world coordinates with the (4, 4) c2w pose
    (ptc_geometry.py:201-218)."""
    pts_cam, valid = depthmap_to_camera_coordinates(depthmap, intrinsics)
    return geotrf(camera_pose, pts_cam), valid


def colmap_to_opencv_intrinsics(k: Array) -> Array:
    """COLMAP integer-corner origin -> OpenCV pixel-center origin
    (ptc_geometry.py:221-231)."""
    return k.at[..., :2, 2].add(-0.5)


def opencv_to_colmap_intrinsics(k: Array) -> Array:
    return k.at[..., :2, 2].add(0.5)


def _masked(pts: Array, valid: Optional[Array]) -> Array:
    if valid is None:
        return jnp.ones(pts.shape[:-1], jnp.float32)
    return valid.astype(jnp.float32)


def _masked_quantile(values: Array, weights: Array, q: float) -> Array:
    """Per-batch weighted quantile over flattened values (invalid entries get
    weight 0), matching nanquantile on the valid subset."""
    b = values.shape[0]
    v = values.reshape(b, -1)
    w = weights.reshape(b, -1)
    order = jnp.argsort(v, axis=1)
    v_sorted = jnp.take_along_axis(v, order, axis=1)
    w_sorted = jnp.take_along_axis(w, order, axis=1)
    cum = jnp.cumsum(w_sorted, axis=1)
    total = cum[:, -1:]
    # index where cumulative weight crosses q * total
    target = q * total
    idx = jnp.sum((cum < target).astype(jnp.int32), axis=1)
    idx = jnp.clip(idx, 0, v.shape[1] - 1)
    return jnp.take_along_axis(v_sorted, idx[:, None], axis=1)[:, 0]


def normalize_pointcloud(
    pts1: Array,
    pts2: Optional[Array] = None,
    norm_mode: str = "avg_dis",
    valid1: Optional[Array] = None,
    valid2: Optional[Array] = None,
):
    """Joint point-map normalization (ptc_geometry.py:270-329). Supported
    modes: avg_dis (Regr3D default), avg_log1p, median_dis, sqrt_dis."""
    mode, dis_mode = norm_mode.split("_")
    b = pts1.shape[0]
    d1 = jnp.linalg.norm(pts1, axis=-1)
    w1 = _masked(pts1, valid1)
    if pts2 is not None:
        d2 = jnp.linalg.norm(pts2, axis=-1)
        w2 = _masked(pts2, valid2)
        dis = jnp.concatenate([d1.reshape(b, -1), d2.reshape(b, -1)], axis=1)
        wts = jnp.concatenate([w1.reshape(b, -1), w2.reshape(b, -1)], axis=1)
    else:
        dis, wts = d1.reshape(b, -1), w1.reshape(b, -1)

    if mode == "avg":
        if dis_mode == "log1p":
            dis = jnp.log1p(dis)
        elif dis_mode != "dis":
            raise ValueError(f"unsupported dis mode: {dis_mode}")
        # avg over valid entries; invalid contribute 0 to the sum like the
        # reference's invalid_to_zeros + nnz denominator.
        norm_factor = jnp.sum(dis * wts, axis=1) / (jnp.sum(wts, axis=1) + 1e-8)
    elif mode == "median":
        # Reference detaches the median scale (nanmedian(...).values.detach(),
        # dust3r ptc geometry) — no gradient through the norm factor.
        norm_factor = jax.lax.stop_gradient(_masked_quantile(dis, wts, 0.5))
    elif mode == "sqrt":
        norm_factor = (
            jnp.sum(jnp.sqrt(dis) * wts, axis=1) / (jnp.sum(wts, axis=1) + 1e-8)
        ) ** 2
    else:
        raise ValueError(f"unsupported norm mode: {mode}")

    norm_factor = jnp.clip(norm_factor, 1e-8, None)
    shape = (b,) + (1,) * (pts1.ndim - 1)
    norm_factor = norm_factor.reshape(shape)
    if pts2 is not None:
        return pts1 / norm_factor, pts2 / norm_factor
    return pts1 / norm_factor


def get_joint_pointcloud_depth(
    z1: Array,
    z2: Optional[Array] = None,
    valid_mask1: Optional[Array] = None,
    valid_mask2: Optional[Array] = None,
    quantile: float = 0.5,
) -> Array:
    """Per-batch joint depth quantile over valid pixels
    (ptc_geometry.py:332-344)."""
    b = z1.shape[0]
    w1 = valid_mask1.astype(jnp.float32) if valid_mask1 is not None else jnp.ones_like(z1)
    z = z1.reshape(b, -1)
    w = w1.reshape(b, -1)
    if z2 is not None:
        w2 = valid_mask2.astype(jnp.float32) if valid_mask2 is not None else jnp.ones_like(z2)
        z = jnp.concatenate([z, z2.reshape(b, -1)], axis=1)
        w = jnp.concatenate([w, w2.reshape(b, -1)], axis=1)
    return _masked_quantile(z, w, quantile)


def get_joint_pointcloud_center_scale(
    pts1: Array,
    pts2: Optional[Array] = None,
    valid_mask1: Optional[Array] = None,
    valid_mask2: Optional[Array] = None,
    z_only: bool = False,
    center: bool = True,
) -> Tuple[Array, Array]:
    """Median center + median distance scale of the joint cloud
    (ptc_geometry.py:347-361). Returns (center (b,1,1,3), scale (b,1,1,1))."""
    b = pts1.shape[0]
    p = pts1.reshape(b, -1, 3)
    w = _masked(pts1, valid_mask1).reshape(b, -1)
    if pts2 is not None:
        p = jnp.concatenate([p, pts2.reshape(b, -1, 3)], axis=1)
        w = jnp.concatenate([w, _masked(pts2, valid_mask2).reshape(b, -1)], axis=1)
    c = jnp.stack(
        [_masked_quantile(p[..., i], w, 0.5) for i in range(3)], axis=-1
    )  # (b, 3)
    if z_only:
        c = c.at[..., :2].set(0.0)
    ref = p - c[:, None, :] if center else p
    scale = _masked_quantile(jnp.linalg.norm(ref, axis=-1), w, 0.5)
    return c[:, None, None, :], scale[:, None, None, None]
