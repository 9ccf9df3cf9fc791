"""Tests for the tile-based Gaussian splatting renderer.

The key test compares the tiled renderer against a brute-force per-pixel
compositor that uses the same alpha model and the same 3-sigma tile-bbox
truncation (which the CUDA rasterizer also applies), so results must match to
float tolerance — no golden images needed.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from styl3r_tpu.geometry import build_covariance
from styl3r_tpu.ops.rasterizer import make_raster_camera, project_gaussians, render
from styl3r_tpu.ops.rasterizer.project import eval_sh, SH_C0
from styl3r_tpu.ops.rasterizer.render import TILE

H = W = 64


def default_camera(extrinsics=None):
    if extrinsics is None:
        extrinsics = jnp.eye(4)
    intrinsics = jnp.asarray(
        [[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]], dtype=jnp.float32
    )
    return make_raster_camera(
        extrinsics, intrinsics, jnp.asarray(0.1), jnp.asarray(100.0), (H, W)
    )


def isotropic_gaussians(centers, sigma, colors, opacities):
    centers = np.asarray(centers, np.float32)
    g = centers.shape[0]
    cov = jnp.broadcast_to(jnp.eye(3) * sigma**2, (g, 3, 3)).astype(jnp.float32)
    sh = (jnp.asarray(colors) - 0.5)[..., None] / SH_C0  # dc-only SH -> exact color
    return (
        jnp.asarray(centers, jnp.float32),
        cov,
        sh.astype(jnp.float32),
        jnp.asarray(opacities, jnp.float32),
    )


def test_projection_center_and_depth():
    cam = default_camera()
    means = jnp.asarray([[0.0, 0.0, 2.0]], jnp.float32)
    cov = jnp.broadcast_to(jnp.eye(3) * 1e-4, (1, 3, 3))
    proj = project_gaussians(cam, means, cov)
    # Center of a 64x64 image with cx=0.5: pixel coordinate 31.5
    np.testing.assert_allclose(proj.means2d[0], [31.5, 31.5], atol=1e-4)
    np.testing.assert_allclose(proj.depths[0], 2.0, atol=1e-6)
    assert bool(proj.mask[0])


def test_projection_culls_behind_camera():
    cam = default_camera()
    means = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, 0.1]], jnp.float32)
    cov = jnp.broadcast_to(jnp.eye(3) * 1e-4, (2, 3, 3))
    proj = project_gaussians(cam, means, cov)
    assert not bool(proj.mask[0])  # behind
    assert not bool(proj.mask[1])  # closer than 0.2 near threshold
    assert float(proj.radii[0]) == 0.0


def test_projection_cov2d_isotropic():
    # An isotropic gaussian on the optical axis: cov2d = (f*sigma/z)^2 + 0.3
    cam = default_camera()
    sigma, z = 0.05, 2.0
    means = jnp.asarray([[0.0, 0.0, z]], jnp.float32)
    cov = jnp.broadcast_to(jnp.eye(3) * sigma**2, (1, 3, 3))
    proj = project_gaussians(cam, means, cov)
    f = 1.0 * W  # fx = 1.0 normalized * 64 px
    expected_var = (f * sigma / z) ** 2 + 0.3
    # conic = inverse -> a = 1/var, b = 0
    np.testing.assert_allclose(proj.conics[0, 0], 1.0 / expected_var, rtol=1e-5)
    np.testing.assert_allclose(proj.conics[0, 1], 0.0, atol=1e-6)


def test_eval_sh_dc_only():
    sh = jnp.asarray([[[1.0], [0.0], [-2.0]]], jnp.float32)  # (1, 3, 1)
    dirs = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    out = eval_sh(sh, dirs)
    np.testing.assert_allclose(out[0, 0], SH_C0 * 1.0 + 0.5, atol=1e-6)
    np.testing.assert_allclose(out[0, 2], 0.0, atol=1e-6)  # clamped at 0


def test_render_empty_scene_is_background():
    cam = default_camera()
    means, cov, sh, op = isotropic_gaussians(
        np.zeros((1, 3)) + [[0, 0, -5]], 0.01, [[1, 0, 0]], [1.0]
    )
    bg = jnp.asarray([0.2, 0.4, 0.6], jnp.float32)
    out = render(cam, means, cov, sh, op, (H, W), bg)
    np.testing.assert_allclose(out.color, np.broadcast_to(bg, (H, W, 3)), atol=1e-6)
    np.testing.assert_allclose(out.alpha, 0.0, atol=1e-6)


def test_render_single_gaussian_blob():
    cam = default_camera()
    means, cov, sh, op = isotropic_gaussians([[0.0, 0.0, 2.0]], 0.08, [[1.0, 0.0, 0.0]], [1.0])
    out = render(cam, means, cov, sh, op, (H, W))
    img = np.asarray(out.color)
    # Blob is centered: the 4 central pixels are the brightest and red.
    assert img[31, 31, 0] > 0.9
    assert img[31, 31, 1] < 1e-3
    assert img[0, 0, 0] < 0.05
    # Symmetry about the center (31.5, 31.5)
    np.testing.assert_allclose(img[31, 31], img[32, 32], atol=1e-5)
    np.testing.assert_allclose(img[31, 32], img[32, 31], atol=1e-5)
    # Depth at center equals gaussian depth * alpha
    np.testing.assert_allclose(
        out.depth[31, 31], 2.0 * out.alpha[31, 31], rtol=1e-5
    )


def test_render_occlusion_order():
    centers = [[0.0, 0.0, 2.0], [0.0, 0.0, 4.0]]
    colors = [[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]  # red in front, blue behind
    cam = default_camera()
    means, cov, sh, op = isotropic_gaussians(centers, 0.1, colors, [0.9, 0.9])
    out = render(cam, means, cov, sh, op, (H, W))
    center = np.asarray(out.color[31, 31])
    assert center[0] > center[2] > 0  # mostly red, some blue bleeds through

    # Swap the colors: now blue is in front, red behind.
    out2 = render(cam, means, cov, sh[::-1], op, (H, W))
    center2 = np.asarray(out2.color[31, 31])
    assert center2[2] > center2[0] > 0
    # The scene is symmetric under the color swap: images are channel-mirrored.
    np.testing.assert_allclose(out.color, out2.color[..., ::-1], atol=1e-5)

    # Memory order must not matter, only depth: reverse both arrays (same scene).
    out3 = render(cam, means[::-1], cov, sh[::-1], op, (H, W))
    np.testing.assert_allclose(out.color, out3.color, atol=1e-5)


def brute_force_render(cam, means, cov, sh, op, image_shape, bg):
    """Per-pixel reference compositor with the same 3-sigma tile truncation."""
    h, w = image_shape
    proj = project_gaussians(cam, means, cov)
    dirs = means - cam.cam_pos
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    colors = eval_sh(sh, dirs)

    p = np.asarray(proj.means2d)
    con = np.asarray(proj.conics)
    dep = np.asarray(proj.depths)
    rad = np.asarray(proj.radii)
    msk = np.asarray(proj.mask)
    col = np.asarray(colors)
    opn = np.asarray(op)

    order = np.argsort(dep, kind="stable")
    img = np.zeros((h, w, 3), np.float32)
    depth = np.zeros((h, w), np.float32)
    trans = np.ones((h, w), np.float32)

    gx = w // TILE
    gy = h // TILE
    for gi in order:
        if not msk[gi] or rad[gi] <= 0:
            continue
        tx0 = int(np.clip(np.floor((p[gi, 0] - rad[gi]) / TILE), 0, gx - 1))
        tx1 = int(np.clip(np.floor((p[gi, 0] + rad[gi]) / TILE), 0, gx - 1))
        ty0 = int(np.clip(np.floor((p[gi, 1] - rad[gi]) / TILE), 0, gy - 1))
        ty1 = int(np.clip(np.floor((p[gi, 1] + rad[gi]) / TILE), 0, gy - 1))
        ys, xs = np.mgrid[0:h, 0:w]
        in_tiles = (
            (xs // TILE >= tx0)
            & (xs // TILE <= tx1)
            & (ys // TILE >= ty0)
            & (ys // TILE <= ty1)
        )
        dx = xs - p[gi, 0]
        dy = ys - p[gi, 1]
        power = -0.5 * (con[gi, 0] * dx**2 + con[gi, 2] * dy**2) - con[gi, 1] * dx * dy
        alpha = np.minimum(opn[gi] * np.exp(power), 0.99)
        alpha = np.where(power > 0, 0.0, alpha)
        alpha = np.where(alpha < 1 / 255.0, 0.0, alpha)
        alpha = np.where(in_tiles, alpha, 0.0)
        weight = alpha * trans
        img += weight[..., None] * col[gi]
        depth += weight * dep[gi]
        trans *= 1.0 - alpha
    img += trans[..., None] * np.asarray(bg)
    return img, depth, 1.0 - trans


def test_render_matches_brute_force():
    rng = np.random.default_rng(7)
    g = 120
    centers = np.stack(
        [
            rng.uniform(-1.5, 1.5, g),
            rng.uniform(-1.5, 1.5, g),
            rng.uniform(1.0, 6.0, g),
        ],
        axis=-1,
    )
    scales = rng.uniform(0.02, 0.15, (g, 3)).astype(np.float32)
    quats = rng.normal(size=(g, 4)).astype(np.float32)
    cov = build_covariance(jnp.asarray(scales), jnp.asarray(quats))
    colors = rng.uniform(0, 1, (g, 3))
    sh = jnp.asarray((colors - 0.5)[..., None] / SH_C0, jnp.float32)
    op = jnp.asarray(rng.uniform(0.2, 1.0, g), jnp.float32)
    means = jnp.asarray(centers, jnp.float32)

    cam = default_camera()
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    out = render(cam, means, cov, sh, op, (H, W), bg, max_tiles_per_gaussian=64)
    ref_img, ref_depth, ref_alpha = brute_force_render(
        cam, means, cov, sh, op, (H, W), bg
    )
    np.testing.assert_allclose(out.color, ref_img, atol=2e-4)
    np.testing.assert_allclose(out.depth, ref_depth, atol=2e-3)
    np.testing.assert_allclose(out.alpha, ref_alpha, atol=2e-4)


def test_render_gradients_flow():
    cam_ext = jnp.eye(4)
    intr = jnp.asarray(
        [[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]], jnp.float32
    )
    means, cov, sh, op = isotropic_gaussians(
        [[0.1, -0.1, 2.0], [0.3, 0.2, 3.0]], 0.1, [[1, 0, 0], [0, 1, 0]], [0.8, 0.8]
    )
    target = jnp.zeros((H, W, 3))

    def loss(means, sh, op, rot_delta, trans_delta):
        cam = make_raster_camera(
            cam_ext, intr, jnp.asarray(0.1), jnp.asarray(100.0), (H, W),
            cam_rot_delta=rot_delta, cam_trans_delta=trans_delta,
        )
        out = render(cam, means, cov, sh, op, (H, W))
        return jnp.mean((out.color - target) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        means, sh, op, jnp.zeros(3), jnp.zeros(3)
    )
    for g, name in zip(grads, ["means", "sh", "op", "rot", "trans"]):
        assert bool(jnp.all(jnp.isfinite(g))), name
        assert float(jnp.abs(g).max()) > 0, name


def test_render_pose_delta_shifts_image():
    cam_ext = jnp.eye(4)
    intr = jnp.asarray(
        [[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]], jnp.float32
    )
    means, cov, sh, op = isotropic_gaussians([[0.0, 0.0, 2.0]], 0.08, [[1, 1, 1]], [1.0])

    def render_with_delta(tx):
        cam = make_raster_camera(
            cam_ext, intr, jnp.asarray(0.1), jnp.asarray(100.0), (H, W),
            cam_trans_delta=jnp.asarray([tx, 0.0, 0.0]),
        )
        return render(cam, means, cov, sh, op, (H, W)).color

    base = render_with_delta(0.0)
    # +x w2c translation moves the camera -x in world => blob moves +x in image.
    shifted = render_with_delta(-0.125)  # camera moves +x by 0.125 => blob moves left
    base_cx = np.argmax(np.asarray(base[31, :, 0]))
    shifted_cx = np.argmax(np.asarray(shifted[31, :, 0]))
    assert shifted_cx < base_cx


@pytest.mark.slow
def test_pallas_backward_matches_autodiff():
    """The Pallas backward kernel (interpret mode) must match jnp autodiff."""
    rng = np.random.default_rng(11)
    g = 200
    means = jnp.asarray(
        np.stack([rng.uniform(-1.5, 1.5, g), rng.uniform(-1.5, 1.5, g), rng.uniform(1, 6, g)], -1),
        jnp.float32,
    )
    scales = jnp.asarray(rng.uniform(0.02, 0.12, (g, 3)), jnp.float32)
    quats = jnp.asarray(rng.normal(size=(g, 4)), jnp.float32)
    sh = jnp.asarray((rng.uniform(0, 1, (g, 3, 1)) - 0.5) / SH_C0, jnp.float32)
    op = jnp.asarray(rng.uniform(0.2, 0.9, g), jnp.float32)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    cam = default_camera()
    tgt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)

    def loss(impl, means, scales, quats, sh, op, bgc):
        cov = build_covariance(scales, quats)
        out = render(cam, means, cov, sh, op, (H, W), bgc, max_per_tile=512, impl=impl)
        return (
            jnp.mean((out.color - tgt) ** 2)
            + 0.1 * jnp.mean(out.depth)
            + 0.05 * jnp.mean(out.alpha)
        )

    args = (means, scales, quats, sh, op, bg)
    g_jnp = jax.grad(lambda *a: loss("jnp", *a), argnums=tuple(range(6)))(*args)
    g_pal = jax.grad(lambda *a: loss("pallas_interpret", *a), argnums=tuple(range(6)))(*args)
    for name, a, b in zip(["means", "scales", "quats", "sh", "op", "bg"], g_jnp, g_pal):
        scale = float(jnp.abs(a).max()) + 1e-12
        assert float(jnp.abs(a - b).max()) / scale < 1e-4, name


@pytest.mark.slow
def test_render_many_fused_matches_per_view():
    """The fused multi-view path (one sort + one kernel launch over all
    views' offset tile ids) must match per-view single renders, for both the
    jnp compositor and the interpret-mode Pallas kernel, including per-view
    backgrounds and gradients."""
    from styl3r_tpu.ops.rasterizer.render import render_many

    rng = np.random.default_rng(41)
    g = 120
    means, covs, shs, opas = isotropic_gaussians(
        np.stack(
            [rng.uniform(-1, 1, g), rng.uniform(-1, 1, g), rng.uniform(2, 5, g)], -1
        ),
        0.12,
        rng.uniform(0, 1, (g, 3)),
        rng.uniform(0.3, 0.9, g),
    )
    exts = []
    for dx in (-0.15, 0.0, 0.2):
        e = np.eye(4, dtype=np.float32)
        e[0, 3] = dx
        exts.append(e)
    cams = [default_camera(jnp.asarray(e)) for e in exts]
    cams_stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    bgs = jnp.asarray(
        [[0.0, 0.0, 0.0], [0.2, 0.1, 0.0], [0.0, 0.3, 0.5]], jnp.float32
    )
    kw = dict(max_per_tile=256, max_tiles_per_gaussian=8)

    mns = jnp.broadcast_to(means, (3, g, 3))
    cvs = jnp.broadcast_to(covs, (3, g, 3, 3))
    sh3 = jnp.broadcast_to(shs, (3,) + shs.shape)
    op3 = jnp.broadcast_to(opas, (3, g))

    for impl in ("jnp", "pallas_interpret"):
        fused = render_many(
            cams_stacked, mns, cvs, sh3, op3, (H, W), bgs, impl=impl, **kw
        )
        for i, cam in enumerate(cams):
            single = render(
                cam, means, covs, shs, opas, (H, W), bgs[i], impl="jnp", **kw
            )
            np.testing.assert_allclose(
                np.asarray(fused.color[i]), np.asarray(single.color),
                atol=3e-5, err_msg=f"{impl} view {i}",
            )
            np.testing.assert_allclose(
                np.asarray(fused.depth[i]), np.asarray(single.depth), atol=3e-4
            )

    # Gradients through the fused pallas path vs the fused jnp path.
    def loss(impl):
        def f(m):
            out = render_many(
                cams_stacked, m, cvs, sh3, op3, (H, W), bgs, impl=impl, **kw
            )
            return jnp.sum(out.color * jnp.linspace(0, 1, 3)[:, None, None, None])

        return f

    g_jnp = jax.grad(loss("jnp"))(mns)
    g_pal = jax.grad(loss("pallas_interpret"))(mns)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_jnp), atol=2e-3, rtol=1e-3)


def test_rotmat_to_quat_roundtrip():
    """rotmat_to_quat_xyzw inverts quat_to_rotmat up to sign, for random
    rotations including near-degenerate traces."""
    from styl3r_tpu.geometry.gaussians import quat_to_rotmat, rotmat_to_quat_xyzw

    rng = np.random.default_rng(5)
    q = rng.normal(size=(64, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    # Include axis-aligned 180-degree rotations (trace = -1 corner cases).
    q = np.concatenate(
        [q, np.eye(4, dtype=np.float32), -np.eye(4, dtype=np.float32)], 0
    )
    r = quat_to_rotmat(jnp.asarray(q))
    q2 = rotmat_to_quat_xyzw(r)
    r2 = quat_to_rotmat(q2)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r), atol=1e-5)


def test_render_factors_matches_covariances():
    """Rendering from (scales, rotations) covariance factors must match
    rendering from the assembled (g, 3, 3) covariances — the factor path is
    the decoder's default whenever the adapter provides factors."""
    from styl3r_tpu.geometry.gaussians import build_covariance

    rng = np.random.default_rng(11)
    g = 150
    means = jnp.asarray(
        np.stack(
            [rng.uniform(-1, 1, g), rng.uniform(-1, 1, g), rng.uniform(2, 5, g)], -1
        ),
        jnp.float32,
    )
    scales = jnp.asarray(rng.uniform(0.02, 0.25, (g, 3)), jnp.float32)
    quats = rng.normal(size=(g, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    rots = jnp.asarray(quats)
    covs = build_covariance(scales, rots)
    shs = jnp.asarray(rng.uniform(-0.5, 0.5, (g, 3, 1)), jnp.float32)
    opas = jnp.asarray(rng.uniform(0.3, 0.9, g), jnp.float32)
    cam = default_camera()
    kw = dict(max_per_tile=256, max_tiles_per_gaussian=8, impl="jnp")

    ref = render(cam, means, covs, shs, opas, (H, W), **kw)
    fac = render(cam, means, None, shs, opas, (H, W),
                 scales=scales, rotations=rots, **kw)
    np.testing.assert_allclose(np.asarray(fac.color), np.asarray(ref.color), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fac.depth), np.asarray(ref.depth), atol=1e-4)


def test_decoder_uses_factors_when_present():
    """render_gaussians must produce identical images whether the Gaussians
    pytree carries factors (scales/rotations set -> factor path) or only the
    assembled covariances, including under scale_invariant rescaling."""
    from styl3r_tpu.geometry.gaussians import Gaussians, build_covariance
    from styl3r_tpu.models.decoder import render_gaussians

    rng = np.random.default_rng(12)
    b, g = 2, 90
    means = jnp.asarray(
        np.stack(
            [rng.uniform(-1, 1, (b, g)), rng.uniform(-1, 1, (b, g)),
             rng.uniform(2, 5, (b, g))], -1
        ),
        jnp.float32,
    )
    scales = jnp.asarray(rng.uniform(0.02, 0.2, (b, g, 3)), jnp.float32)
    quats = rng.normal(size=(b, g, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    rots = jnp.asarray(quats)
    covs = build_covariance(scales, rots)
    shs = jnp.asarray(rng.uniform(-0.5, 0.5, (b, g, 3, 1)), jnp.float32)
    opas = jnp.asarray(rng.uniform(0.3, 0.9, (b, g)), jnp.float32)

    k = jnp.broadcast_to(
        jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]], jnp.float32),
        (b, 2, 3, 3),
    )
    ext = np.broadcast_to(np.eye(4, dtype=np.float32), (b, 2, 4, 4)).copy()
    ext[:, 1, 0, 3] = 0.2
    ext = jnp.asarray(ext)
    near = jnp.full((b, 2), 0.5)
    far = jnp.full((b, 2), 100.0)
    kw = dict(max_per_tile=256, max_tiles_per_gaussian=8, impl="jnp")

    with_factors = Gaussians(means, covs, shs, opas, scales=scales, rotations=rots)
    cov_only = Gaussians(means, covs, shs, opas)
    for si in (False, True):
        a = render_gaussians(with_factors, ext, k, near, far, (H, W),
                             scale_invariant=si, **kw)
        c = render_gaussians(cov_only, ext, k, near, far, (H, W),
                             scale_invariant=si, **kw)
        np.testing.assert_allclose(
            np.asarray(a.color), np.asarray(c.color), atol=1e-5,
            err_msg=f"scale_invariant={si}",
        )


@pytest.mark.parametrize("impl", ["jnp", "pallas_interpret"])
def test_render_pair_cap_lossless_with_headroom(impl):
    """pair_cap truncates the sorted pair list AFTER invalid slots were sorted
    to the end, so any cap >= the live pair count must be bit-identical to the
    uncapped render; an overflowing cap must still be finite (it degrades by
    dropping the highest tile ids first)."""
    rng = np.random.default_rng(13)
    g = 200
    means = jnp.asarray(
        np.stack(
            [rng.uniform(-1, 1, g), rng.uniform(-1, 1, g), rng.uniform(2, 5, g)], -1
        ),
        jnp.float32,
    )
    scales = jnp.asarray(rng.uniform(0.02, 0.2, (g, 3)), jnp.float32)
    quats = rng.normal(size=(g, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    shs = jnp.asarray(rng.uniform(-0.5, 0.5, (g, 3, 1)), jnp.float32)
    opas = jnp.asarray(rng.uniform(0.3, 0.9, g), jnp.float32)
    cam = default_camera()
    kw = dict(max_per_tile=256, max_tiles_per_gaussian=8, impl=impl,
              scales=scales, rotations=jnp.asarray(quats))

    # A cap that genuinely TRIGGERS the truncation branch (cap < total slots)
    # while provably above the live-pair count, so the result must be
    # bit-identical to the exact render.
    from styl3r_tpu.ops.rasterizer.project import project_gaussians
    from styl3r_tpu.ops.rasterizer.render import TILE, _build_pairs

    proj = project_gaussians(cam, means, scales=scales,
                             rotations=jnp.asarray(quats))
    pt, _, _ = _build_pairs(
        proj.mean_x, proj.mean_y, proj.radii, proj.depths, proj.mask,
        (H // TILE, W // TILE), 8, opacities=opas,
        con_a=proj.con_a, con_b=proj.con_b, con_c=proj.con_c,
    )
    live = int((pt < (H // TILE) * (W // TILE)).sum())
    total_slots = g * 8
    cap = live + 130  # not a multiple of 128: exercises the round-UP path
    assert live < cap < total_slots, (live, cap, total_slots)

    base = render(cam, means, None, shs, opas, (H, W), **kw)
    capped = render(cam, means, None, shs, opas, (H, W), pair_cap=cap, **kw)
    np.testing.assert_array_equal(np.asarray(base.color), np.asarray(capped.color))

    tiny = render(cam, means, None, shs, opas, (H, W), pair_cap=128, **kw)
    assert bool(jnp.isfinite(tiny.color).all())

    # Telemetry: live_pairs reports the fused sort's live count exactly, and
    # an overflowing cap is DETECTED (live_pairs > pair_slots), not silent.
    assert int(base.live_pairs) == live
    assert int(capped.live_pairs) == live
    assert int(capped.pair_slots) >= live  # lossless contract held
    assert live > 128
    assert int(tiny.live_pairs) > int(tiny.pair_slots)  # overflow detected
    assert int(tiny.pair_slots) == 128


def test_sort_pairs_two_key_fallback_matches_packed():
    """With a huge fused tile space (tile bits leave < MIN_DEPTH_KEY_BITS of
    depth), _sort_pairs switches to the exact 2-key sort; both paths must
    yield identical per-tile front-to-back gaussian order on data whose
    depth gaps are far above the packed-key quantum."""
    from styl3r_tpu.ops.rasterizer.render import MIN_DEPTH_KEY_BITS, _sort_pairs

    rng = np.random.default_rng(21)
    n = 4096
    small_tiles = jnp.asarray(rng.integers(0, 50, n), jnp.int32)
    # Well-separated depths (relative gaps >> the packed key's 2^-18 depth
    # quantum at 64 tiles) so the two paths cannot differ by legitimate
    # packed-key ties.
    depths = jnp.asarray(rng.permutation(np.linspace(1.0, 100.0, n)), jnp.float32)
    gidx = jnp.arange(n, dtype=jnp.int32)

    _, g_packed, s1, e1 = _sort_pairs(small_tiles, depths, gidx, 64)
    # Same pair data, but declared tile space so large the packed key would
    # keep < MIN_DEPTH_KEY_BITS depth bits -> exact 2-key path.
    huge = 1 << (33 - MIN_DEPTH_KEY_BITS)
    _, g_exact, s2, e2 = _sort_pairs(small_tiles, depths, gidx, huge)

    np.testing.assert_array_equal(np.asarray(g_packed), np.asarray(g_exact))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2[:64]))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2[:64]))


def test_gather_window_grads_matches_scatter():
    """gather_window_grads (the hot-path formulation) must equal the
    scatter-add oracle on window blocks with the kernel's zero-outside-range
    property, across empty tiles, duplicate starts, boundary-window overlap,
    max_per_tile truncation, and forward early exit (unwritten windows)."""
    from styl3r_tpu.ops.rasterizer.pallas_backward import (
        gather_window_grads,
        scatter_window_grads,
    )
    from styl3r_tpu.ops.rasterizer.pallas_kernel import ATTR_H, WINDOW

    rng = np.random.default_rng(7)
    n_pairs = 8 * WINDOW
    n_tiles = 12
    max_windows = 3

    # Nondecreasing starts with duplicates (empty tiles) + a trailing
    # empty-tile run at start == n_pairs.
    raw = np.sort(rng.integers(0, n_pairs, n_tiles - 3))
    starts = np.concatenate([[0], raw[:-1], [raw[-1], n_pairs, n_pairs]])
    nxt = np.append(starts[1:], n_pairs)
    counts = np.minimum(nxt - starts, 300)  # truncation below the raw range

    grads = rng.normal(size=(n_tiles, max_windows, ATTR_H, WINDOW)).astype(
        np.float32
    )
    # Enforce the kernel's output contract: lanes outside [start, end) are
    # exactly zero; windows beyond the tile's processed range (early exit /
    # dead windows) were never written and stay zero.
    ndone = rng.integers(1, max_windows + 1, n_tiles)
    for t in range(n_tiles):
        base = (starts[t] // WINDOW) * WINDOW
        for w in range(max_windows):
            if w >= ndone[t]:
                grads[t, w] = 0.0
                continue
            gidx = base + w * WINDOW + np.arange(WINDOW)
            live = (gidx >= starts[t]) & (gidx < starts[t] + counts[t])
            grads[t, w, :, ~live] = 0.0

    wg = jnp.asarray(grads)
    st = jnp.asarray(starts, jnp.int32)
    ct = jnp.asarray(counts, jnp.int32)
    ref = scatter_window_grads(wg, st, n_pairs)
    got = gather_window_grads(wg, st, ct, n_pairs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0, rtol=0)


@pytest.mark.parametrize("cap", [300, 180])
def test_take_rows_grouped_grad_matches_plain_take(cap):
    """take_rows_grouped's sort-based backward must equal the plain gather's
    autodiff scatter-add, for the full slot list and for a truncating cap
    (capped-out slots contribute zero), including a cotangent with zero
    rows (dead pairs)."""
    from styl3r_tpu.ops.rasterizer.pallas_kernel import take_rows_grouped

    rng = np.random.default_rng(13)
    n_rows, exact_dup, a = 50, 6, 16
    n_slots = n_rows * exact_dup
    # Every id exactly exact_dup times, in a random global order (the
    # pre-pair_cap sorted slot list's invariant).
    idx_full = jnp.asarray(
        rng.permutation(np.repeat(np.arange(n_rows), exact_dup)), jnp.int32
    )
    assert n_slots == idx_full.shape[0]
    table = jnp.asarray(rng.normal(size=(n_rows, a)), jnp.float32)
    cot = rng.normal(size=(cap, a)).astype(np.float32)
    cot[rng.uniform(size=cap) < 0.3] = 0.0
    cot = jnp.asarray(cot)

    def loss_plain(t):
        return jnp.vdot(jnp.take(t, idx_full[:cap], axis=0), cot)

    def loss_grouped(t):
        return jnp.vdot(take_rows_grouped(t, idx_full, cap, exact_dup), cot)

    g_plain = jax.grad(loss_plain)(table)
    g_grouped = jax.grad(loss_grouped)(table)
    np.testing.assert_allclose(
        np.asarray(g_grouped), np.asarray(g_plain), rtol=1e-6, atol=1e-6
    )


def test_render_many_dense_saturating_cloud_early_exit_parity():
    """Dense alpha-saturating cloud: every tile walks multiple 128-wide
    windows and the transmittance early exit fires mid-range. This is the
    regime that exposed the orphaned-DMA bug (pallas_kernel.py: body(w)
    prefetches window w+1's copy, so an early exit at w_done < n_windows
    used to leave that DMA in flight — non-zero semaphore at grid-step end,
    which faults the whole program on real TPUs with an INTERNAL backend
    error; training from scratch_init_heads hits exactly this distribution).
    Interpret mode cannot model the semaphore fault, but this pins the
    VALUE parity of the early-exit path against the jnp reference, and the
    TPU bring-up script (/tmp-style isolate harness) covered the hardware
    semantics: fwd+bwd on a 131k-gaussian all-live cloud, 1.1M live pairs."""
    from styl3r_tpu.ops.rasterizer.render import render_many

    rng = np.random.default_rng(7)
    n_views, g = 2, 4096
    xy = rng.uniform(-0.4, 0.4, (g, 2)).astype(np.float32)
    z = (1.0 + 0.05 * rng.normal(size=g)).astype(np.float32)
    means = jnp.asarray(np.concatenate([xy * z[:, None], z[:, None]], axis=1))
    scales = jnp.full((g, 3), 0.02)  # big footprints: multi-window tiles
    quats = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32), (g, 1))
    opac = jnp.full((g,), 0.95)  # saturating alphas: early exit fires
    sh = jnp.asarray(0.5 + 0.1 * rng.normal(size=(g, 3, 1)), jnp.float32)

    exts = [np.eye(4, dtype=np.float32) for _ in range(n_views)]
    for i, e in enumerate(exts):
        e[0, 3] = 0.02 * i
    cams = [default_camera(jnp.asarray(e)) for e in exts]
    cameras = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)

    def run(impl):
        return render_many(
            cameras,
            jnp.tile(means[None], (n_views, 1, 1)),
            None,
            jnp.tile(sh[None], (n_views, 1, 1, 1)),
            jnp.tile(opac[None], (n_views, 1)),
            (H, W),
            jnp.zeros((n_views, 3)),
            scales=jnp.tile(scales[None], (n_views, 1, 1)),
            rotations=jnp.tile(quats[None], (n_views, 1, 1)),
            impl=impl,
            max_tiles_per_gaussian=8,
            max_per_tile=512,
            pair_cap=4 * n_views * g,
        )

    a = jax.jit(lambda: run("pallas_interpret"))()
    b = jax.jit(lambda: run("jnp"))()
    assert int(a.live_pairs) > 8 * 128  # genuinely multi-window
    # Genuinely saturating where covered: the early exit fires there.
    assert float((a.alpha > 0.99).mean()) > 0.3
    np.testing.assert_allclose(
        np.asarray(a.color), np.asarray(b.color), rtol=2e-5, atol=2e-5
    )
