"""Distiller + Regr3D + visualization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from styl3r_tpu.losses.regr3d import normalize_pointcloud_avg_dis, regr3d_loss
from styl3r_tpu.models.distiller import Dust3RTeacher
from styl3r_tpu.utils.viz import (
    add_border,
    apply_color_map,
    annotate,
    color_map_depth,
    draw_cameras_topdown,
    draw_lines,
    draw_points,
    hcat,
    vcat,
)

TINY = dict(
    enc_depth=2, dec_depth=4, enc_dim=32, dec_dim=16, enc_heads=2, dec_heads=2,
    head_feature_dim=24, head_last_dim=12, head_layer_dims=(8, 12, 16, 20),
)


def test_dust3r_teacher_forward():
    rng = np.random.default_rng(0)
    model = Dust3RTeacher(**TINY)
    imgs = jnp.asarray(rng.uniform(-1, 1, (1, 2, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.key(0), imgs)
    out = model.apply(params, imgs)
    assert out["pts3d_1"].shape == (1, 32, 32, 3)
    assert out["conf_1"].shape == (1, 32, 32)
    assert float(out["conf_1"].min()) >= 1.0  # conf = 1 + exp(x)
    assert bool(jnp.isfinite(out["pts3d_2"]).all())


def test_regr3d_zero_when_equal():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.normal(size=(2, 8, 8, 3)), jnp.float32)
    pts2 = jnp.asarray(rng.normal(size=(2, 8, 8, 3)), jnp.float32)
    conf = jnp.full((2, 8, 8), 10.0)
    loss = regr3d_loss(pts, pts2, pts, pts2, conf, conf)
    np.testing.assert_allclose(loss, 0.0, atol=1e-6)
    loss2 = regr3d_loss(pts, pts2, pts + 0.1, pts2, conf, conf)
    assert float(loss2) > 0


def test_regr3d_scale_invariance():
    """avg-dis normalization makes the loss invariant to global scale."""
    rng = np.random.default_rng(2)
    gt1 = jnp.asarray(rng.normal(size=(1, 8, 8, 3)), jnp.float32)
    gt2 = jnp.asarray(rng.normal(size=(1, 8, 8, 3)), jnp.float32)
    pr1 = gt1 + 0.05
    pr2 = gt2 - 0.05
    conf = jnp.full((1, 8, 8), 10.0)
    l1 = regr3d_loss(gt1, gt2, pr1, pr2, conf, conf)
    l2 = regr3d_loss(gt1, gt2, 7.0 * pr1, 7.0 * pr2, conf, conf)
    np.testing.assert_allclose(l1, l2, rtol=1e-4)


def test_regr3d_conf_masking():
    gt = jnp.zeros((1, 4, 4, 3))
    pr = jnp.ones((1, 4, 4, 3))
    low_conf = jnp.full((1, 4, 4), 1.0)  # below threshold 3 -> all masked
    loss = regr3d_loss(gt, gt, pr, pr, low_conf, low_conf, normalize=False)
    np.testing.assert_allclose(loss, 0.0)


def test_normalize_pointcloud():
    pts1 = jnp.ones((1, 2, 2, 3)) * 2.0
    pts2 = jnp.ones((1, 2, 2, 3)) * 2.0
    valid = jnp.ones((1, 2, 2))
    n1, n2 = normalize_pointcloud_avg_dis(pts1, pts2, valid, valid)
    # mean distance = ||(2,2,2)|| = 2*sqrt(3); normalized distance = 1
    np.testing.assert_allclose(jnp.linalg.norm(n1, axis=-1), 1.0, rtol=1e-5)


def test_viz_layout_and_colormap():
    a = np.zeros((8, 10, 3), np.float32)
    b = np.ones((12, 6, 3), np.float32)
    h = hcat(a, b, gap=2)
    assert h.shape == (12, 18, 3)
    v = vcat(a, b, gap=0)
    assert v.shape == (20, 10, 3)
    bordered = add_border(a, 3)
    assert bordered.shape == (14, 16, 3)

    cm = apply_color_map(np.linspace(0, 1, 5))
    assert cm.shape == (5, 3)
    depth_img = color_map_depth(np.random.default_rng(0).uniform(1, 5, (8, 8)))
    assert depth_img.shape == (8, 8, 3)


def test_viz_drawing():
    img = np.zeros((32, 32, 3), np.float32)
    out = draw_points(img, [[5, 5], [20, 10]], color=(1, 0, 0), radius=1)
    assert out[5, 5, 0] == 1.0 and out[10, 20, 0] == 1.0
    out = draw_lines(img, [[0, 0]], [[31, 31]], color=(0, 1, 0))
    assert out[15, 15, 1] == 1.0  # diagonal passes through the center

    ext = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    ext[1, 0, 3] = 1.0
    k = np.tile(np.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32), (2, 1, 1))
    cam_img = draw_cameras_topdown(ext, k, image_size=64)
    assert cam_img.shape == (64, 64, 3)
    assert cam_img.min() < 1.0  # something was drawn

    labeled = annotate(img, "hello")
    assert labeled.shape[0] == 32 + 16
