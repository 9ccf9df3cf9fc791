"""Regr3D distillation loss.

Equivalent of `src/loss/loss_point.py:188-255` (Regr3D): L2 between predicted
and teacher point maps, with validity masking by per-batch distance quantiles
[0.002, 0.998] and teacher confidence >= 3, and average-distance point-cloud
normalization on both sides (`src/geometry/ptc_geometry.py` normalize_pointcloud
'avg_dis' mode). Applied with weight 0.1 (model_wrapper_style.py:234-242).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from jax import Array


def normalize_pointcloud_avg_dis(
    pts1: Array, pts2: Array, valid1: Array, valid2: Array, eps: float = 1e-8
) -> Tuple[Array, Array]:
    """Scale both views' points by the mean distance-to-origin over valid
    points (per batch element)."""
    d1 = jnp.linalg.norm(pts1, axis=-1)
    d2 = jnp.linalg.norm(pts2, axis=-1)
    total = jnp.sum(d1 * valid1, axis=(1, 2)) + jnp.sum(d2 * valid2, axis=(1, 2))
    count = jnp.sum(valid1, axis=(1, 2)) + jnp.sum(valid2, axis=(1, 2))
    norm = total / jnp.maximum(count, 1.0)
    norm = jnp.maximum(norm, eps)[:, None, None, None]
    return pts1 / norm, pts2 / norm


def _quantile_mask(pts: Array, lo: float = 0.002, hi: float = 0.998) -> Array:
    dis = jnp.linalg.norm(pts, axis=-1)  # (b, h, w)
    flat = dis.reshape(dis.shape[0], -1)
    qlo = jnp.quantile(flat, lo, axis=1)[:, None, None]
    qhi = jnp.quantile(flat, hi, axis=1)[:, None, None]
    return (dis >= qlo) & (dis <= qhi)


def regr3d_loss(
    gt_pts1: Array,  # (b, h, w, 3) teacher view-1 points
    gt_pts2: Array,
    pr_pts1: Array,
    pr_pts2: Array,
    conf1: Optional[Array] = None,  # (b, h, w) teacher confidences
    conf2: Optional[Array] = None,
    conf_threshold: float = 3.0,
    normalize: bool = True,
    disable_view1: bool = False,
) -> Array:
    valid1 = _quantile_mask(gt_pts1)
    valid2 = _quantile_mask(gt_pts2)
    if conf1 is not None:
        valid1 = valid1 & (conf1 >= conf_threshold)
    if conf2 is not None:
        valid2 = valid2 & (conf2 >= conf_threshold)
    v1 = valid1.astype(jnp.float32)
    v2 = valid2.astype(jnp.float32)

    if normalize:
        pr_pts1, pr_pts2 = normalize_pointcloud_avg_dis(pr_pts1, pr_pts2, v1, v2)
        gt_pts1, gt_pts2 = normalize_pointcloud_avg_dis(gt_pts1, gt_pts2, v1, v2)

    loss1 = jnp.linalg.norm(pr_pts1 - gt_pts1, axis=-1)
    loss2 = jnp.linalg.norm(pr_pts2 - gt_pts2, axis=-1)
    mean1 = jnp.sum(loss1 * v1) / jnp.maximum(jnp.sum(v1), 1.0)
    mean2 = jnp.sum(loss2 * v2) / jnp.maximum(jnp.sum(v2), 1.0)
    if disable_view1:
        return mean2
    return mean1 + mean2
