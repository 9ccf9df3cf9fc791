"""End-to-end smoke/shape/gradient tests for the full encoder and model at
tiny trunk dims (the math is dim-independent; full dims are exercised by the
checkpoint-conversion tests and benchmarks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from styl3r_tpu.models.adapter import (
    map_pdf_to_opacity,
    raw_gaussian_channels,
    sh_degree_mask,
    unified_gaussian_adapter,
)
from styl3r_tpu.models.encoder import Styl3rEncoder
from styl3r_tpu.models.styl3r import Batch, Styl3rModel

TINY = dict(
    enc_depth=2, dec_depth=4, enc_dim=32, dec_dim=16, enc_heads=2, dec_heads=2
)
B, V, H, W = 1, 2, 32, 32


def tiny_batch(rng, t=2):
    k = np.asarray([[0.9, 0, 0.5], [0, 0.9, 0.5], [0, 0, 1.0]], np.float32)
    ext = np.broadcast_to(np.eye(4, dtype=np.float32), (B, t, 4, 4)).copy()
    ext[:, 1:, 0, 3] = 0.1
    return Batch(
        context_images=jnp.asarray(rng.uniform(0, 1, (B, V, H, W, 3)), jnp.float32),
        context_intrinsics=jnp.broadcast_to(jnp.asarray(k), (B, V, 3, 3)),
        target_extrinsics=jnp.asarray(ext),
        target_intrinsics=jnp.broadcast_to(jnp.asarray(k), (B, t, 3, 3)),
        target_near=jnp.full((B, t), 0.1),
        target_far=jnp.full((B, t), 100.0),
        style_image=jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32),
    )


def test_sh_degree_mask():
    mask = sh_degree_mask(2)
    np.testing.assert_allclose(mask[:1], [1.0])
    np.testing.assert_allclose(mask[1:4], [0.025] * 3)
    np.testing.assert_allclose(mask[4:9], [0.1 * 0.0625] * 5)


def test_map_pdf_to_opacity_identity_at_release_config():
    pdf = jnp.asarray([0.0, 0.3, 1.0])
    np.testing.assert_allclose(map_pdf_to_opacity(pdf, 0), pdf, atol=1e-6)
    np.testing.assert_allclose(map_pdf_to_opacity(pdf, 10_000), pdf, atol=1e-6)


def test_unified_adapter_properties():
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.normal(size=(10, raw_gaussian_channels(0))), jnp.float32)
    g = unified_gaussian_adapter(
        means=jnp.zeros((10, 3)), opacities=jnp.full((10,), 0.7), raw=raw, sh_degree=0
    )
    assert g.harmonics.shape == (10, 3, 1)
    assert float(g.scales.max()) <= 0.3
    assert float(g.scales.min()) > 0.0
    np.testing.assert_allclose(
        jnp.linalg.norm(g.rotations, axis=-1), np.ones(10), atol=1e-5
    )
    # covariance eigenvalues = scales^2
    eig = np.sort(np.linalg.eigvalsh(np.asarray(g.covariances)), axis=-1)
    np.testing.assert_allclose(eig, np.sort(np.asarray(g.scales) ** 2, -1), rtol=1e-3)


def test_adapter_gradient_finite_at_zero_quaternion():
    """Regression (round-5 overfit NaN): an EXACTLY-zero raw quaternion row
    (dead-relu pixel + zero bias in the gs head's final 1x1 conv) must not
    NaN the adapter backward — `x / (norm(x) + eps)` did, poisoning every
    param through clip_by_global_norm."""
    from styl3r_tpu.models.adapter import posed_gaussian_adapter

    raw = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, raw_gaussian_channels(0))),
        jnp.float32,
    )
    raw = raw.at[1, 3:7].set(0.0)  # zero quat row

    def loss(raw):
        g = unified_gaussian_adapter(
            means=jnp.zeros((4, 3)), opacities=jnp.full((4,), 0.7), raw=raw,
            sh_degree=0,
        )
        return sum(
            jnp.sum(jnp.square(x))
            for x in [g.covariances, g.rotations, g.scales, g.harmonics]
        )

    grads = jax.grad(loss)(raw)
    assert bool(jnp.isfinite(grads).all()), "unified adapter grad NaN at zero quat"

    def loss_posed(raw):
        ext = jnp.eye(4)[None]
        k = jnp.asarray([[[0.8, 0.0, 0.5], [0.0, 0.8, 0.5], [0.0, 0.0, 1.0]]])
        g = posed_gaussian_adapter(
            extrinsics=jnp.broadcast_to(ext, (4, 4, 4)),
            intrinsics=jnp.broadcast_to(k, (4, 3, 3)),
            coordinates=jnp.full((4, 2), 0.5),
            depths=jnp.ones((4,)),
            opacities=jnp.full((4,), 0.7),
            raw=raw,
            image_shape=(8, 8),
            sh_degree=0,
        )
        return sum(
            jnp.sum(jnp.square(x))
            for x in [g.covariances, g.rotations, g.scales, g.means]
        )

    grads = jax.grad(loss_posed)(raw)
    assert bool(jnp.isfinite(grads).all()), "posed adapter grad NaN at zero quat"


@pytest.mark.slow
def test_encoder_shapes_and_determinism():
    rng = np.random.default_rng(1)
    batch = tiny_batch(rng)
    enc = Styl3rEncoder(sh_degree=0, **TINY)
    imgs = batch.context_images * 2 - 1
    style = batch.style_image * 2 - 1
    params = enc.init(jax.random.key(0), imgs, batch.context_intrinsics, style)
    g, aux = enc.apply(
        params, imgs, batch.context_intrinsics, style, return_aux=True
    )
    n = V * H * W
    assert g.means.shape == (B, n, 3)
    assert g.covariances.shape == (B, n, 3, 3)
    assert g.harmonics.shape == (B, n, 3, 1)
    assert g.opacities.shape == (B, n)
    assert aux["pts3d"].shape == (B, V, H, W, 3)
    assert bool(jnp.isfinite(g.means).all())
    assert float(g.opacities.min()) >= 0.0 and float(g.opacities.max()) <= 1.0
    # Deterministic apply is reproducible.
    g2 = enc.apply(params, imgs, batch.context_intrinsics, style)
    np.testing.assert_allclose(g.means, g2.means, atol=0)


@pytest.mark.slow
def test_bf16_head_trunk_close_to_f32():
    """The bench/profile fast-inference config (bf16 DPT trunks + gs towers,
    f32 final projections) must stay numerically close to the default all-f32
    heads: same params, same inputs, small relative drift in the predicted
    gaussians."""
    rng = np.random.default_rng(7)
    batch = tiny_batch(rng)
    imgs = batch.context_images * 2 - 1
    style = batch.style_image * 2 - 1
    enc_f32 = Styl3rEncoder(sh_degree=0, **TINY)
    enc_bf16 = Styl3rEncoder(sh_degree=0, head_trunk_dtype=jnp.bfloat16, **TINY)
    params = enc_f32.init(jax.random.key(0), imgs, batch.context_intrinsics, style)
    g32 = enc_f32.apply(params, imgs, batch.context_intrinsics, style)
    g16 = enc_bf16.apply(params, imgs, batch.context_intrinsics, style)
    # Outputs are raw-f32 everywhere; bf16 trunk rounding should stay ~1e-2.
    for name in ("opacities", "harmonics"):
        a, b = np.asarray(getattr(g32, name)), np.asarray(getattr(g16, name))
        scale = np.abs(a).mean() + 1e-6
        assert np.abs(a - b).mean() / scale < 3e-2, name
    # pts3d means run the same trunk dtype but keep their last convs f32.
    a, b = np.asarray(g32.means), np.asarray(g16.means)
    assert np.abs(a - b).mean() / (np.abs(a).mean() + 1e-6) < 3e-2


@pytest.mark.slow
def test_model_forward_renders():
    rng = np.random.default_rng(2)
    model = Styl3rModel(sh_degree=0, **TINY)
    batch = tiny_batch(rng)
    params = model.init(jax.random.key(0), batch)
    gaussians, out = model.forward(
        params, batch, (H, W), max_per_tile=512, max_tiles_per_gaussian=8
    )
    assert out.color.shape == (B, 2, H, W, 3)
    assert out.depth.shape == (B, 2, H, W)
    assert bool(jnp.isfinite(out.color).all())


@pytest.mark.slow
def test_model_gradient_flows_to_params():
    rng = np.random.default_rng(3)
    model = Styl3rModel(sh_degree=0, **TINY)
    batch = tiny_batch(rng)
    params = model.init(jax.random.key(0), batch)
    target = jnp.zeros((B, 2, H, W, 3))

    def loss_fn(p):
        _, out = model.forward(
            p, batch, (H, W), max_per_tile=256, max_tiles_per_gaussian=8
        )
        return jnp.mean((out.color - target) ** 2)

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves_with_path(grads)
    finite = all(bool(jnp.isfinite(g).all()) for _, g in flat)
    assert finite
    # Both branches receive gradient: the stylizer (appearance) and the
    # backbone (structure).
    total = {
        "backbone": 0.0,
        "token_stylizer": 0.0,
        "gaussian_appearance_head": 0.0,
        "head1": 0.0,
    }
    for path, g in flat:
        key = path[1].key if hasattr(path[1], "key") else str(path[1])
        if key in total:
            total[key] += float(jnp.abs(g).sum())
    for name, s in total.items():
        assert s > 0, f"no gradient reached {name}"


def test_posed_gaussian_adapter():
    from styl3r_tpu.models.adapter import posed_gaussian_adapter
    from styl3r_tpu.geometry import se3_exp

    rng = np.random.default_rng(5)
    n = 16
    ext = jnp.asarray(se3_exp(jnp.asarray([0.2, 0.1, -0.1, 0.05, 0.0, 0.1])))
    k = jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]], jnp.float32)
    coords = jnp.asarray(rng.uniform(0.1, 0.9, (n, 2)), jnp.float32)
    depths = jnp.asarray(rng.uniform(1, 4, (n,)), jnp.float32)
    raw = jnp.asarray(rng.normal(size=(n, raw_gaussian_channels(0))), jnp.float32)

    g = posed_gaussian_adapter(
        ext, k, coords, depths, jnp.full((n,), 0.5), raw, (64, 64), sh_degree=0
    )
    # Means are at the given depth along the rays: reprojecting returns coords.
    from styl3r_tpu.geometry import project

    xy, front = project(g.means, ext, k)
    assert bool(front.all())
    np.testing.assert_allclose(xy, coords, atol=1e-4)
    # Scales bounded by max * depth * multiplier, positive.
    assert float(g.scales.min()) > 0
    # World covariance stays PSD after the camera rotation.
    eig = np.linalg.eigvalsh(np.asarray(g.covariances))
    assert eig.min() > 0


def test_render_orthographic():
    from styl3r_tpu.geometry import Gaussians, build_covariance
    from styl3r_tpu.models.decoder import render_orthographic

    rng = np.random.default_rng(6)
    g = 64
    means = jnp.asarray(
        np.stack([rng.uniform(-1, 1, g), rng.uniform(-1, 1, g), rng.uniform(1, 2, g)], -1),
        jnp.float32,
    )[None]
    cov = build_covariance(jnp.full((g, 3), 0.05), jnp.tile(jnp.asarray([0.0, 0, 0, 1]), (g, 1)))[None]
    sh = jnp.asarray((rng.uniform(0, 1, (1, g, 3, 1)) - 0.5) / 0.2821, jnp.float32)
    gaussians = Gaussians(means, cov, sh, jnp.full((1, g), 0.9))
    out = render_orthographic(
        gaussians, jnp.eye(4)[None, None], jnp.full((1, 1), 3.0), jnp.full((1, 1), 3.0),
        jnp.full((1, 1), 0.1), jnp.full((1, 1), 100.0), (64, 64),
        max_per_tile=512, max_tiles_per_gaussian=8,
    )
    assert out.color.shape == (1, 1, 64, 64, 3)
    assert bool(jnp.isfinite(out.color).all())
    assert float(out.alpha.mean()) > 0.01  # splats visible


def test_render_orthographic_depth_invariance():
    """Orthographic golden (reference render_cuda_orthographic,
    cuda_splatting.py:136-227): with the far-camera/tiny-fov trick, a splat's
    screen position and extent must be (near-)independent of its depth —
    unlike the perspective render of the same scene."""
    from styl3r_tpu.geometry import Gaussians, build_covariance
    from styl3r_tpu.models.decoder import render_gaussians, render_orthographic

    def one_gaussian_at(z):
        means = jnp.asarray([[[0.4, 0.0, z]]], jnp.float32)
        cov = build_covariance(
            jnp.full((1, 3), 0.08), jnp.asarray([[0.0, 0, 0, 1.0]])
        )[None]
        sh = jnp.full((1, 1, 3, 1), 1.0 / 0.2821, jnp.float32)
        return Gaussians(means, cov, sh, jnp.full((1, 1), 0.95))

    kw = dict(max_per_tile=64, max_tiles_per_gaussian=8)
    ortho = [
        render_orthographic(
            one_gaussian_at(z), jnp.eye(4)[None, None], jnp.full((1, 1), 3.0),
            jnp.full((1, 1), 3.0), jnp.full((1, 1), 0.1), jnp.full((1, 1), 100.0),
            (64, 64), **kw,
        )
        for z in (1.0, 2.0)
    ]

    def centroid_and_mass(out):
        a = np.asarray(out.alpha[0, 0])
        ys, xs = np.mgrid[0:64, 0:64]
        m = a.sum()
        return np.array([(a * xs).sum() / m, (a * ys).sum() / m]), m

    c1, m1 = centroid_and_mass(ortho[0])
    c2, m2 = centroid_and_mass(ortho[1])
    np.testing.assert_allclose(c1, c2, atol=0.5)       # same screen position
    np.testing.assert_allclose(m1, m2, rtol=0.05)      # same splat extent

    # Perspective control: the same depth change shifts/shrinks the splat.
    k = jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])[None, None]
    persp = [
        render_gaussians(
            one_gaussian_at(z), jnp.eye(4)[None, None], k,
            jnp.full((1, 1), 0.1), jnp.full((1, 1), 100.0), (64, 64), **kw,
        )
        for z in (1.0, 2.0)
    ]
    p1, pm1 = centroid_and_mass(persp[0])
    p2, pm2 = centroid_and_mass(persp[1])
    assert np.abs(p1 - p2).max() > 2.0   # parallax shift
    assert pm1 > 1.5 * pm2               # perspective shrink


@pytest.mark.slow
def test_portrait_mode_matches_transposed_landscape():
    """ManyAR portrait handling (reference transpose_to_landscape,
    croco/misc.py:71-117): feeding the transposed batch with portrait=True
    must reproduce the landscape run's dense maps, spatially transposed, and
    a portrait (48x32) scene must render end-to-end."""
    rng = np.random.default_rng(9)
    model = Styl3rModel(
        sh_degree=0, enc_depth=1, dec_depth=2, enc_dim=32, dec_dim=16,
        enc_heads=2, dec_heads=2, head_feature_dim=16, head_last_dim=16,
        head_layer_dims=(8, 8, 16, 16),
    )
    k = np.asarray([[0.9, 0, 0.5], [0, 1.2, 0.4], [0, 0, 1.0]], np.float32)
    b, v, h, w = 1, 2, 32, 32  # square: portrait path must match exactly
    batch = Batch(
        context_images=jnp.asarray(rng.uniform(0, 1, (b, v, h, w, 3)), jnp.float32),
        context_intrinsics=jnp.broadcast_to(jnp.asarray(k), (b, v, 3, 3)),
        target_extrinsics=jnp.eye(4)[None, None],
        target_intrinsics=jnp.asarray(k)[None, None],
        target_near=jnp.full((b, 1), 0.5),
        target_far=jnp.full((b, 1), 100.0),
        style_image=jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)), jnp.float32),
    )
    params = jax.jit(model.init)(jax.random.key(0), batch)

    g_land, aux_land = model.predict_gaussians(params, batch, return_aux=True)
    from styl3r_tpu.models.styl3r import transpose_intrinsics

    batch_t = batch._replace(
        context_images=jnp.swapaxes(batch.context_images, 2, 3),
        style_image=jnp.swapaxes(batch.style_image, 1, 2),
        context_intrinsics=transpose_intrinsics(batch.context_intrinsics),
    )
    g_port, aux_port = model.predict_gaussians(
        params, batch_t, return_aux=True, portrait=True
    )
    np.testing.assert_allclose(
        np.asarray(aux_port["pts3d"]),
        np.asarray(jnp.swapaxes(aux_land["pts3d"], 2, 3)),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(g_port.opacities).reshape(b, v, w, h),
        np.asarray(jnp.swapaxes(np.asarray(g_land.opacities).reshape(b, v, h, w), 2, 3)),
        atol=1e-5,
    )

    # Non-square portrait scene renders end-to-end with true portrait cameras.
    hp, wp = 48, 32
    batch_p = Batch(
        context_images=jnp.asarray(rng.uniform(0, 1, (b, v, hp, wp, 3)), jnp.float32),
        context_intrinsics=jnp.broadcast_to(jnp.asarray(k), (b, v, 3, 3)),
        target_extrinsics=jnp.eye(4)[None, None],
        target_intrinsics=jnp.asarray(k)[None, None],
        target_near=jnp.full((b, 1), 0.5),
        target_far=jnp.full((b, 1), 100.0),
        style_image=jnp.asarray(rng.uniform(0, 1, (b, hp, wp, 3)), jnp.float32),
    )
    params_p = jax.jit(model.init)(jax.random.key(1), batch_p._replace(
        context_images=jnp.swapaxes(batch_p.context_images, 2, 3),
        style_image=jnp.swapaxes(batch_p.style_image, 1, 2),
    ))
    g, out = model.forward(
        params_p, batch_p, (hp, wp), portrait=True,
        max_per_tile=64, max_tiles_per_gaussian=4,
    )
    assert out.color.shape == (b, 1, hp, wp, 3)
    assert bool(jnp.isfinite(out.color).all())
    assert g.means.shape == (b, v * hp * wp, 3)
