"""Pose estimation tests: PnP recovers a known camera from synthetic
correspondences (with outliers), error metrics, AUC."""

import numpy as np
import pytest

from styl3r_tpu.eval.pose import (
    pnp_pose_from_gaussians,
    pnp_ransac,
    pose_auc,
    pose_error_deg,
    rotation_angle_deg,
    translation_angle_deg,
)
from styl3r_tpu.geometry.se3 import se3_exp
import jax.numpy as jnp


def make_correspondences(rng, n, w2c, k, noise=0.0, outliers=0):
    pts3d = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(3, 8, n)], -1
    )
    # world points = c2w applied to camera points
    c2w = np.linalg.inv(w2c)
    world = (c2w[:3, :3] @ pts3d.T).T + c2w[:3, 3]
    cam = (w2c[:3, :3] @ world.T).T + w2c[:3, 3]
    proj = (k @ (cam / cam[:, 2:3]).T).T[:, :2]
    proj += rng.normal(0, noise, proj.shape)
    if outliers:
        idx = rng.choice(n, outliers, replace=False)
        proj[idx] += rng.uniform(30, 100, (outliers, 2))
    return world, proj


def test_pnp_ransac_exact():
    rng = np.random.default_rng(0)
    w2c = np.asarray(se3_exp(jnp.asarray([0.2, -0.1, 0.3, 0.1, -0.05, 0.2])))
    k = np.asarray([[300.0, 0, 128], [0, 300.0, 128], [0, 0, 1]])
    world, proj = make_correspondences(rng, 200, w2c, k)
    pose, inliers = pnp_ransac(world, proj, k, seed=1)
    gt_c2w = np.linalg.inv(w2c)
    r_err, t_err = pose_error_deg(pose, gt_c2w)
    assert r_err < 0.5 and np.linalg.norm(pose[:3, 3] - gt_c2w[:3, 3]) < 0.02
    assert inliers.mean() > 0.95


def test_pnp_ransac_with_outliers():
    rng = np.random.default_rng(2)
    w2c = np.asarray(se3_exp(jnp.asarray([0.1, 0.2, -0.1, -0.1, 0.15, 0.05])))
    k = np.asarray([[280.0, 0, 128], [0, 280.0, 128], [0, 0, 1]])
    world, proj = make_correspondences(rng, 300, w2c, k, noise=0.5, outliers=60)
    pose, inliers = pnp_ransac(world, proj, k, iterations=200, seed=3)
    gt_c2w = np.linalg.inv(w2c)
    r_err, _ = pose_error_deg(pose, gt_c2w)
    assert r_err < 2.0
    assert inliers.sum() >= 200


def test_pnp_pose_from_gaussians():
    """Per-pixel pts3d of a known camera -> recovered pose."""
    rng = np.random.default_rng(4)
    h = w = 32
    k_norm = np.asarray([[1.1, 0, 0.5], [0, 1.1, 0.5], [0, 0, 1.0]], np.float32)
    w2c = np.asarray(se3_exp(jnp.asarray([0.3, 0.0, -0.2, 0.05, 0.2, -0.1])))
    c2w = np.linalg.inv(w2c)
    # Build pts3d by unprojecting each pixel at random depth through the camera.
    k_px = k_norm.copy()
    k_px[0] *= w
    k_px[1] *= h
    ys, xs = np.mgrid[0:h, 0:w]
    depth = rng.uniform(2, 6, (h, w))
    pix_h = np.stack([xs, ys, np.ones_like(xs)], -1).reshape(-1, 3)
    cam_pts = (np.linalg.inv(k_px) @ pix_h.T).T * depth.reshape(-1, 1)
    world = (c2w[:3, :3] @ cam_pts.T).T + c2w[:3, 3]
    pts3d = world.reshape(h, w, 3).astype(np.float32)
    opacity = np.full((h, w), 0.9, np.float32)

    pose = pnp_pose_from_gaussians(pts3d, opacity, k_norm, seed=5)
    r_err, _ = pose_error_deg(pose, c2w)
    assert r_err < 1.0
    assert np.linalg.norm(pose[:3, 3] - c2w[:3, 3]) < 0.05


def test_pose_error_metrics():
    eye = np.eye(4)
    rot90 = np.asarray(se3_exp(jnp.asarray([0.0, 0, 0, 0, 0, np.pi / 2])))
    r_err, t_err = pose_error_deg(np.asarray(rot90), eye)
    np.testing.assert_allclose(r_err, 90.0, atol=1e-4)
    assert translation_angle_deg(np.array([1, 0, 0]), np.array([0, 1, 0])) == pytest.approx(90.0)
    # translation angle uses |cos| (sign-invariant, like the reference)
    assert translation_angle_deg(np.array([1, 0, 0]), np.array([-1, 0, 0])) == pytest.approx(0.0)


def test_pose_auc():
    errors = [1.0] * 50 + [100.0] * 50  # half perfect, half terrible
    aucs = pose_auc(errors, thresholds=(5, 10, 20))
    assert 0.35 < aucs[5] < 0.5
    assert aucs[5] < aucs[10] < aucs[20] or abs(aucs[20] - aucs[10]) < 0.2
    perfect = pose_auc([0.0] * 10, thresholds=(5,))
    np.testing.assert_allclose(perfect[5], 1.0, atol=1e-6)
