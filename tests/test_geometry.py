import jax
import jax.numpy as jnp
import numpy as np
import pytest

from styl3r_tpu.geometry import (
    Gaussians,
    build_covariance,
    camera_normalization,
    get_fov,
    get_world_rays,
    project,
    quat_to_rotmat,
    sample_image_grid,
    se3_exp,
    so3_exp,
    unproject,
    update_pose,
)
from styl3r_tpu.geometry.gaussians import (
    covariance_to_upper_triangle,
    upper_triangle_to_covariance,
)
from styl3r_tpu.geometry.projection import invert_se3


def random_pose(rng, n=()):
    """Random c2w extrinsics via the exp map."""
    tau = rng.normal(size=(*n, 6)) * 0.5
    return se3_exp(jnp.asarray(tau, dtype=jnp.float32))


def test_quat_to_rotmat_identity_and_orthonormal():
    q = jnp.array([0.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(quat_to_rotmat(q), np.eye(3), atol=1e-6)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(32, 4)), dtype=jnp.float32)
    r = quat_to_rotmat(q)
    eye = jnp.einsum("...ij,...kj->...ik", r, r)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(r)), np.ones(32), atol=1e-5)


def test_quat_xyzw_ordering_matches_scipy_convention():
    # 90 degrees about z: xyzw = (0, 0, sin45, cos45)
    s = np.sin(np.pi / 4)
    q = jnp.array([0.0, 0.0, s, s])
    expected = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(quat_to_rotmat(q), expected, atol=1e-6)


def test_build_covariance_psd_and_eigenvalues():
    rng = np.random.default_rng(1)
    scales = jnp.asarray(np.abs(rng.normal(size=(16, 3))) + 0.1, dtype=jnp.float32)
    quats = jnp.asarray(rng.normal(size=(16, 4)), dtype=jnp.float32)
    cov = build_covariance(scales, quats)
    np.testing.assert_allclose(cov, np.swapaxes(np.asarray(cov), -1, -2), atol=1e-6)
    eig = np.linalg.eigvalsh(np.asarray(cov))
    np.testing.assert_allclose(
        np.sort(eig, axis=-1), np.sort(np.asarray(scales) ** 2, axis=-1), rtol=1e-4
    )


def test_covariance_triangle_roundtrip():
    rng = np.random.default_rng(2)
    scales = jnp.asarray(np.abs(rng.normal(size=(5, 3))) + 0.1, dtype=jnp.float32)
    quats = jnp.asarray(rng.normal(size=(5, 4)), dtype=jnp.float32)
    cov = build_covariance(scales, quats)
    tri = covariance_to_upper_triangle(cov)
    np.testing.assert_allclose(upper_triangle_to_covariance(tri), cov, atol=1e-6)


def test_invert_se3():
    rng = np.random.default_rng(3)
    pose = random_pose(rng, (8,))
    eye = pose @ invert_se3(pose)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5)


def test_project_unproject_roundtrip():
    rng = np.random.default_rng(4)
    extrinsics = random_pose(rng, (4,))
    k = jnp.asarray(
        [[1.2, 0.0, 0.5], [0.0, 1.2, 0.5], [0.0, 0.0, 1.0]], dtype=jnp.float32
    )
    intrinsics = jnp.broadcast_to(k, (4, 3, 3))

    coords = jnp.asarray(rng.uniform(0.1, 0.9, size=(4, 10, 2)), dtype=jnp.float32)
    depth = jnp.asarray(rng.uniform(1.0, 5.0, size=(4, 10)), dtype=jnp.float32)

    origins, dirs = get_world_rays(
        coords, extrinsics[:, None], intrinsics[:, None]
    )
    pts = origins + dirs * depth[..., None]
    xy, in_front = project(pts, extrinsics[:, None], intrinsics[:, None])
    assert bool(jnp.all(in_front))
    np.testing.assert_allclose(xy, coords, atol=1e-4)


def test_unproject_depth_along_z():
    # A centered pixel with identity-ish intrinsics unprojects along +z.
    k = jnp.asarray(
        [[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]], dtype=jnp.float32
    )
    pt = unproject(jnp.array([0.5, 0.5]), jnp.asarray(2.0), k)
    np.testing.assert_allclose(pt, [0.0, 0.0, 2.0], atol=1e-6)


def test_sample_image_grid():
    coords, indices = sample_image_grid((4, 8))
    assert coords.shape == (4, 8, 2)
    assert indices.shape == (4, 8, 2)
    # coords are (x, y) with half-pixel centers
    np.testing.assert_allclose(coords[0, 0], [0.5 / 8, 0.5 / 4], atol=1e-6)
    np.testing.assert_allclose(coords[3, 7], [7.5 / 8, 3.5 / 4], atol=1e-6)
    np.testing.assert_array_equal(indices[2, 5], [2, 5])


def test_get_fov_90_degrees():
    # fx = 0.5 in normalized units -> half-width 0.5/0.5 = 1 -> 90 degree fov
    k = jnp.asarray(
        [[[0.5, 0.0, 0.5], [0.0, 0.5, 0.5], [0.0, 0.0, 1.0]]], dtype=jnp.float32
    )
    fov = get_fov(k)
    np.testing.assert_allclose(fov, [[np.pi / 2, np.pi / 2]], atol=1e-5)


def test_so3_exp_small_angle_and_rodrigues():
    theta = jnp.array([1e-7, 0.0, 0.0])
    np.testing.assert_allclose(so3_exp(theta), np.eye(3), atol=1e-6)

    theta = jnp.array([0.0, 0.0, np.pi / 2])
    expected = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(so3_exp(theta), expected, atol=1e-6)


def test_se3_exp_pure_translation():
    tau = jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])
    t = se3_exp(tau)
    np.testing.assert_allclose(t[:3, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(t[:3, 3], [1.0, 2.0, 3.0], atol=1e-6)


def test_update_pose_zero_delta_is_identity():
    rng = np.random.default_rng(5)
    pose = random_pose(rng, (3,))
    zeros = jnp.zeros((3, 3))
    np.testing.assert_allclose(update_pose(zeros, zeros, pose), pose, atol=1e-5)


def test_update_pose_translation_shifts_w2c():
    pose = jnp.eye(4)[None]
    delta_t = jnp.array([[0.5, 0.0, 0.0]])
    new_pose = update_pose(delta_t, jnp.zeros((1, 3)), pose)
    # w2c translation +0.5 => c2w translation -0.5
    np.testing.assert_allclose(new_pose[0, :3, 3], [-0.5, 0.0, 0.0], atol=1e-6)


def test_camera_normalization():
    rng = np.random.default_rng(6)
    poses = random_pose(rng, (5,))
    normalized = camera_normalization(poses[:1], poses)
    np.testing.assert_allclose(normalized[0], np.eye(4), atol=1e-5)
    # Relative transforms are preserved.
    rel_before = invert_se3(poses[:1]) @ poses[3]
    rel_after = invert_se3(normalized[:1]) @ normalized[3]
    np.testing.assert_allclose(rel_before, rel_after, atol=1e-5)


def test_gaussians_is_pytree():
    g = Gaussians(
        means=jnp.zeros((2, 10, 3)),
        covariances=jnp.zeros((2, 10, 3, 3)),
        harmonics=jnp.zeros((2, 10, 3, 1)),
        opacities=jnp.zeros((2, 10)),
    )
    leaves = jax.tree_util.tree_leaves(g)
    assert len(leaves) == 4
    g2 = jax.tree.map(lambda x: x + 1, g)
    assert float(g2.opacities[0, 0]) == 1.0


def _load_ref_epipolar():
    """Execute the reference's epipolar_lines.py (with its own projection.py)
    as a real package so relative imports resolve."""
    import importlib.util
    import sys
    import types
    from pathlib import Path

    ref = Path("/root/reference/src/geometry")
    pkg = types.ModuleType("refgeo")
    pkg.__path__ = [str(ref)]
    sys.modules["refgeo"] = pkg
    for sub in ("projection", "epipolar_lines"):
        spec = importlib.util.spec_from_file_location(f"refgeo.{sub}", ref / f"{sub}.py")
        mod = importlib.util.module_from_spec(spec)
        mod.__package__ = "refgeo"
        sys.modules[f"refgeo.{sub}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["refgeo.epipolar_lines"]


def test_project_rays_matches_executed_reference():
    """styl3r_tpu project_rays vs the reference's own epipolar_lines.py run
    on random ray bundles and cameras, both with and without near/far."""
    import torch

    ref = _load_ref_epipolar()
    from styl3r_tpu.geometry.epipolar_lines import project_rays

    rng = np.random.default_rng(7)
    n = 256
    origins = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
    directions = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
    directions /= np.linalg.norm(directions, axis=-1, keepdims=True)

    # A generic camera near the origin looking roughly at the cloud.
    k = np.asarray([[0.9, 0, 0.5], [0, 1.1, 0.45], [0, 0, 1]], np.float32)
    ext = np.eye(4, dtype=np.float32)
    ext[:3, 3] = [0.2, -0.1, -2.5]

    for near, far in ((None, None), (0.5, 20.0)):
        got = project_rays(
            jnp.asarray(origins), jnp.asarray(directions),
            jnp.asarray(ext), jnp.asarray(k),
            near=None if near is None else jnp.full((n,), near, jnp.float32),
            far=None if far is None else jnp.full((n,), far, jnp.float32),
        )
        want = ref.project_rays(
            torch.from_numpy(origins), torch.from_numpy(directions),
            torch.from_numpy(ext), torch.from_numpy(k),
            near=None if near is None else torch.full((n,), near),
            far=None if far is None else torch.full((n,), far),
        )
        ov_got = np.asarray(got.overlaps_image)
        ov_want = want["overlaps_image"].numpy()
        np.testing.assert_array_equal(ov_got, ov_want)
        assert ov_got.any() and not ov_got.all()  # the case split is exercised
        m = ov_want
        for g, wkey in ((got.t_min, "t_min"), (got.t_max, "t_max"),
                        (got.xy_min, "xy_min"), (got.xy_max, "xy_max")):
            g = np.asarray(g)[m]
            w = want[wkey].numpy()[m]
            finite = np.isfinite(w)
            np.testing.assert_allclose(g[finite], w[finite], rtol=2e-4, atol=2e-4)
            assert np.array_equal(np.isfinite(g), finite)


def test_lift_to_3d_and_get_depth_roundtrip():
    """Points sampled on an epipolar segment lift back onto the source ray,
    and get_depth returns their distance from the ray origin."""
    from styl3r_tpu.geometry.epipolar_lines import get_depth, lift_to_3d, project_rays

    origins = jnp.asarray([[0.0, 0.0, 0.0]] * 8)
    directions = jnp.tile(
        jnp.asarray([[0.1, 0.05, 1.0]]) / np.linalg.norm([0.1, 0.05, 1.0]), (8, 1)
    )
    ext = jnp.asarray(
        np.array(
            [[1, 0, 0, 1.0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32
        )
    )
    k = jnp.asarray(np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32))
    seg = project_rays(origins, directions, ext, k)
    assert bool(seg.overlaps_image.any())

    # Sample interior points of each segment and lift them.
    ts = jnp.linspace(0.2, 0.8, 8)[:, None]
    xy = seg.xy_min + ts * (seg.xy_max - seg.xy_min)
    xyz = lift_to_3d(origins, directions, xy, ext, k)
    # Lifted points lie on the source ray: (xyz - o) parallel to d.
    rel = xyz - origins
    cross = jnp.linalg.norm(jnp.cross(rel, directions), axis=-1)
    ok = np.asarray(seg.overlaps_image)
    np.testing.assert_allclose(np.asarray(cross)[ok], 0.0, atol=1e-3)
    depth = get_depth(origins, directions, xy, ext, k)
    np.testing.assert_allclose(
        np.asarray(depth)[ok], np.linalg.norm(np.asarray(rel), axis=-1)[ok], rtol=1e-4
    )
