"""scratch_init_heads: scratch training must be able to start (VERDICT r5 #4).

Without it, expm1 pts3d + 0.001*softplus scales leave a freshly-initialized
model rendering (near-)empty images with starved color gradients — observed
as held-out PSNR frozen for 750 TPU steps on the bundled COLMAP scene."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from styl3r_tpu.models.styl3r import Batch, Styl3rModel

TINY = dict(enc_depth=2, dec_depth=4, enc_dim=32, dec_dim=16, enc_heads=2,
            dec_heads=2, head_feature_dim=16, head_last_dim=16,
            head_layer_dims=(8, 8, 16, 16))
B, V, H, W = 1, 2, 32, 32


def _batch(rng):
    k = np.asarray([[0.9, 0, 0.5], [0, 0.9, 0.5], [0, 0, 1.0]], np.float32)
    ext = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 2, 4, 4)).copy()
    ext[:, 1, 0, 3] = 0.1
    return Batch(
        context_images=jnp.asarray(rng.uniform(0, 1, (B, V, H, W, 3)), jnp.float32),
        context_intrinsics=jnp.broadcast_to(jnp.asarray(k), (B, V, 3, 3)),
        target_extrinsics=jnp.asarray(ext),
        target_intrinsics=jnp.broadcast_to(jnp.asarray(k), (B, 2, 3, 3)),
        target_near=jnp.full((B, 2), 0.1),
        target_far=jnp.full((B, 2), 100.0),
        style_image=jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32),
        target_images=jnp.asarray(rng.uniform(0.4, 0.6, (B, 2, H, W, 3)), jnp.float32),
    )


def test_scratch_init_sets_biases_and_wakes_gradients():
    from styl3r_tpu.train.scratch_init import scratch_init_heads

    rng = np.random.default_rng(0)
    model = Styl3rModel(sh_degree=0, **TINY)
    batch = _batch(rng)
    p0 = jax.jit(model.init)(jax.random.key(0), batch)
    p1 = scratch_init_heads(p0, depth0=1.0, scale0=0.01)

    # Only the targeted biases change; everything else is untouched.
    np.testing.assert_allclose(
        np.asarray(p1["params"]["head1"]["head_conv3"]["bias"]),
        [0.0, 0.0, math.log1p(1.0)],
    )
    gs_bias = np.asarray(
        p1["params"]["gaussian_param_head"]["head"]["head_conv2"]["bias"]
    )
    assert gs_bias[0] == 0.0  # opacity raw untouched (sigmoid -> 0.5)
    np.testing.assert_allclose(
        0.001 * np.logaddexp(gs_bias[1:4], 0.0), 0.01, rtol=1e-5
    )  # adapter softplus recovers scale0
    np.testing.assert_allclose(gs_bias[4:8], [0, 0, 0, 1.0])
    np.testing.assert_allclose(
        np.asarray(p1["params"]["head1"]["head_conv1"]["bias"]),
        np.asarray(p0["params"]["head1"]["head_conv1"]["bias"]),
    )

    def loss(p):
        _, out = model.forward(
            p, batch, (H, W), max_per_tile=256, max_tiles_per_gaussian=8,
            impl="jnp",
        )
        return jnp.mean((out.color - batch.target_images) ** 2), out

    (l1, o1), g1 = jax.value_and_grad(loss, has_aux=True)(p1)

    def sqnorm(g):
        return sum(float(jnp.sum(x.astype(jnp.float32) ** 2))
                   for x in jax.tree.leaves(g))

    # The scratch init must produce a non-empty render with live gradients
    # all the way back to the pts3d head and the backbone. (The 5-10x
    # render/grad advantage over the default init shows on real scenes —
    # scripts/overfit_colmap.py — but is batch-dependent, so assert the
    # guarantees, not the margin.)
    assert np.isfinite(float(l1))
    assert float(o1.color.std()) > 0.05
    assert sqnorm(g1) > 0.0
    assert sqnorm(g1["params"]["head1"]) > 0.0
    assert sqnorm(g1["params"]["backbone"]) > 0.0


def test_pts3d_bound_clamps_and_matches_reference_when_off():
    from styl3r_tpu.models.dpt import reg_dense_pts3d

    raw = jnp.asarray(np.random.default_rng(1).normal(0, 4, (64, 3)), jnp.float32)
    ref = reg_dense_pts3d(raw)
    # Off (None) is bitwise the reference-exact expm1 postprocess.
    np.testing.assert_array_equal(np.asarray(reg_dense_pts3d(raw, None)), np.asarray(ref))
    # On: radial distance lives in [d_min, bound]; direction is preserved.
    pts = reg_dense_pts3d(raw, bound=20.0, d_min=0.1)
    dist = np.linalg.norm(np.asarray(pts), axis=-1)
    assert dist.min() >= 0.1 - 1e-5 and dist.max() <= 20.0 + 1e-5
    dirs = np.asarray(pts) / dist[:, None]
    ref_dirs = np.asarray(ref) / np.linalg.norm(np.asarray(ref), axis=-1, keepdims=True)
    np.testing.assert_allclose(dirs, ref_dirs, atol=1e-5)
    # Near-identity-plus-floor in the mid-scene regime (the training
    # distribution): dist = d_min + span*tanh(raw/span) ~= d_min + raw there.
    mid = jnp.asarray([[0.0, 0.0, math.log1p(1.5)]], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(reg_dense_pts3d(mid, bound=20.0, d_min=0.1)),
        np.asarray(reg_dense_pts3d(mid)) + np.asarray([0.0, 0.0, 0.1]),
        rtol=0.01, atol=0.02,
    )


def test_scratch_stabilizer_zero_when_healthy_pulls_when_degenerate():
    from styl3r_tpu.geometry.gaussians import Gaussians
    from styl3r_tpu.train.losses import scratch_stabilizer

    def gs(z, op):
        g = 8
        means = jnp.concatenate(
            [jnp.zeros((1, g, 2)), jnp.full((1, g, 1), z)], axis=-1)
        return Gaussians(
            means=means, covariances=jnp.zeros((1, g, 3, 3)),
            harmonics=jnp.zeros((1, g, 3, 1)), opacities=jnp.full((1, g), op),
        )

    healthy, _ = scratch_stabilizer(gs(1.0, 0.5))
    assert float(healthy) == 0.0
    # Degenerate (behind camera, transparent): non-zero loss AND non-zero
    # gradient on the means/opacities directly (the render path is dead here).
    bad = gs(-0.5, 0.01)
    val, metrics = scratch_stabilizer(bad)
    assert float(val) > 0.0 and float(metrics["stab_z"]) > 0.0
    grad = jax.grad(lambda g: scratch_stabilizer(g)[0])(bad)
    assert float(jnp.abs(grad.means).sum()) > 0.0
    assert float(jnp.abs(grad.opacities).sum()) > 0.0
    # Outward escape (points far beyond the scene, sub-pixel splats): the
    # distance ceiling fires with a restoring gradient on the means.
    far = gs(15.0, 0.5)
    val_far, m_far = scratch_stabilizer(far)
    assert float(m_far["stab_dist"]) > 0.0
    g_far = jax.grad(lambda g: scratch_stabilizer(g)[0])(far)
    assert float(g_far.means[0, 0, 2]) > 0.0  # pulls z back toward the scene


def test_encoder_pts3d_bound_threads_to_heads():
    rng = np.random.default_rng(2)
    batch = _batch(rng)
    model = Styl3rModel(sh_degree=0, pts3d_bound=5.0, **TINY)
    p = jax.jit(model.init)(jax.random.key(0), batch)
    gs = model.predict_gaussians(p, batch)
    dist = np.linalg.norm(np.asarray(gs.means), axis=-1)
    assert dist.max() <= 5.0 + 1e-4
