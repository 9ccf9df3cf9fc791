"""Inference pipeline tests: pose alignment recovers perturbed cameras,
trajectory interpolation properties, PLY export round trip."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from styl3r_tpu.geometry import Gaussians, build_covariance, se3_exp
from styl3r_tpu.infer import (
    align_target_poses,
    interpolate_extrinsics,
    interpolate_intrinsics,
    wobble_extrinsics,
)
from styl3r_tpu.models.decoder import render_gaussians
from styl3r_tpu.ops.rasterizer.project import SH_C0
from styl3r_tpu.utils.ply_export import export_ply, load_ply

H = W = 64


def make_scene(rng, g=512):
    means = np.stack(
        [rng.uniform(-1.5, 1.5, g), rng.uniform(-1.5, 1.5, g), rng.uniform(2, 6, g)],
        -1,
    ).astype(np.float32)
    scales = rng.uniform(0.02, 0.08, (g, 3)).astype(np.float32)
    quats = rng.normal(size=(g, 4)).astype(np.float32)
    cov = build_covariance(jnp.asarray(scales), jnp.asarray(quats))
    colors = rng.uniform(0, 1, (g, 3))
    sh = jnp.asarray((colors - 0.5)[..., None] / SH_C0, jnp.float32)
    op = jnp.asarray(rng.uniform(0.5, 1.0, g), jnp.float32)
    return Gaussians(
        means=jnp.asarray(means)[None],
        covariances=cov[None],
        harmonics=sh[None],
        opacities=op[None],
        scales=jnp.asarray(scales)[None],
        rotations=jnp.asarray(quats)[None],
    )


@pytest.mark.slow
def test_pose_alignment_recovers_perturbation():
    rng = np.random.default_rng(0)
    gaussians = make_scene(rng)
    k = jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], jnp.float32)
    true_ext = jnp.asarray(se3_exp(jnp.asarray([0.05, -0.03, 0.0, 0.0, 0.02, 0.0])))[None, None]
    intr = k[None, None]
    near = jnp.full((1, 1), 0.1)
    far = jnp.full((1, 1), 100.0)

    target = render_gaussians(
        gaussians, true_ext, intr, near, far, (H, W), max_per_tile=1024
    ).color

    start_ext = jnp.eye(4)[None, None]
    aligned = align_target_poses(
        gaussians, start_ext, intr, near, far, target, (H, W),
        steps=60, rot_lr=5e-3, trans_lr=5e-3, max_per_tile=1024,
    )
    err_before = float(jnp.abs(start_ext - true_ext).max())
    err_after = float(jnp.abs(aligned - true_ext).max())
    assert err_after < err_before * 0.3, (err_before, err_after)


def test_interpolate_extrinsics():
    e0 = np.eye(4, dtype=np.float32)
    e1 = np.asarray(se3_exp(jnp.asarray([1.0, 0.0, 0.0, 0.0, 0.0, np.pi / 2])))
    t = np.asarray([0.0, 0.5, 1.0])
    out = interpolate_extrinsics(e0, e1, t)
    np.testing.assert_allclose(out[0], e0, atol=1e-5)
    np.testing.assert_allclose(out[2], e1, atol=1e-5)
    # midpoint rotation is 45 degrees about z
    mid = out[1][:3, :3]
    np.testing.assert_allclose(mid[0, 0], np.cos(np.pi / 4), atol=1e-5)
    # orthonormality everywhere
    np.testing.assert_allclose(mid @ mid.T, np.eye(3), atol=1e-6)


def test_interpolate_intrinsics_and_wobble():
    k0 = np.eye(3, dtype=np.float32)
    k1 = 2 * np.eye(3, dtype=np.float32)
    out = interpolate_intrinsics(k0, k1, np.asarray([0.5]))
    np.testing.assert_allclose(out[0], 1.5 * np.eye(3), atol=1e-6)

    base = np.eye(4, dtype=np.float32)
    wob = wobble_extrinsics(base, n=8, radius=0.2)
    assert wob.shape == (8, 4, 4)
    np.testing.assert_allclose(wob[0, 0, 3], 0.2, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(wob[:, :2, 3], axis=1), 0.2, atol=1e-6)


def test_ply_export_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    g = 16
    means = rng.normal(size=(g, 3)).astype(np.float32)
    scales = np.abs(rng.normal(size=(g, 3))).astype(np.float32) + 0.01
    quats = rng.normal(size=(g, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    sh = rng.normal(size=(g, 3, 1)).astype(np.float32)
    op = rng.uniform(0, 1, g).astype(np.float32)

    path = tmp_path / "scene.ply"
    export_ply(means, scales, quats, sh, op, path)
    data = load_ply(path)
    np.testing.assert_allclose(data["x"], means[:, 0], rtol=1e-6)
    np.testing.assert_allclose(data["f_dc_0"], sh[:, 0, 0], rtol=1e-5)
    np.testing.assert_allclose(data["opacity"], op, rtol=1e-6)
    np.testing.assert_allclose(data["scale_0"], np.log(scales[:, 0]), rtol=1e-5)
    # wxyz ordering
    np.testing.assert_allclose(data["rot_0"], quats[:, 3], rtol=1e-5)
