"""Tests for auxiliary components: legacy stylizers, SH camera embedding,
evaluation index generator."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import torch

from styl3r_tpu.geometry.camera_emb import get_intrinsic_embedding, rsh_cart
from styl3r_tpu.models.stylizers import (
    AdaIN2D,
    adain,
    adain_pointcloud,
    linear_stylizer,
)
from styl3r_tpu.eval.index_generator import generate_scene_entry, view_overlap


def test_adain_transfers_statistics():
    rng = np.random.default_rng(0)
    content = jnp.asarray(rng.normal(2.0, 3.0, (2, 8, 8, 4)), jnp.float32)
    style = jnp.asarray(rng.normal(-1.0, 0.5, (2, 8, 8, 4)), jnp.float32)
    out = adain(content, style)
    np.testing.assert_allclose(
        out.mean(axis=(1, 2)), style.mean(axis=(1, 2)), atol=1e-4
    )
    np.testing.assert_allclose(
        out.std(axis=(1, 2)), style.std(axis=(1, 2)), atol=1e-3
    )


def test_adain_pointcloud():
    rng = np.random.default_rng(1)
    content = jnp.asarray(rng.normal(0, 1, (1, 100, 8)), jnp.float32)
    style = jnp.asarray(rng.normal(3, 2, (1, 4, 4, 8)), jnp.float32)
    out = adain_pointcloud(content, style)
    np.testing.assert_allclose(
        out.mean(axis=1), style.reshape(1, -1, 8).mean(axis=1), atol=1e-3
    )


def test_linear_stylizer_matches_style_covariance():
    rng = np.random.default_rng(2)
    content = jnp.asarray(rng.normal(size=(1, 500, 6)), jnp.float32)
    style = jnp.asarray(rng.normal(size=(1, 10, 10, 6)) @ np.diag([3, 1, 1, 1, 1, 0.5]).astype(np.float32), jnp.float32)
    out = np.asarray(linear_stylizer(content, style))
    cov_out = np.cov(out[0].T)
    cov_sty = np.cov(np.asarray(style).reshape(-1, 6).T)
    # Covariances should be close (up to sampling error of the whitening).
    assert np.abs(cov_out - cov_sty).max() < 0.5


@pytest.mark.slow
def test_adain2d_shapes():
    model = AdaIN2D()
    rng = np.random.default_rng(3)
    content = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    style = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    params = model.init(jax.random.key(0), content, style)
    out = model.apply(params, content, style)
    assert out.shape == (1, 64, 64, 3)
    assert bool(jnp.isfinite(out).all())


def test_rsh_cart_orthonormal():
    rng = np.random.default_rng(4)
    d = rng.normal(size=(100_000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    basis = np.asarray(rsh_cart(jnp.asarray(d, jnp.float32), 4))
    gram = basis.T @ basis / len(d) * 4 * np.pi
    assert np.abs(gram - np.eye(25)).max() < 0.05


def test_intrinsic_embedding_shapes():
    k = jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]], jnp.float32)
    for degree, ch in [(0, 3), (2, 9), (4, 25)]:
        emb = get_intrinsic_embedding(k, (8, 8), degree=degree)
        assert emb.shape == (8, 8, ch)


def test_view_overlap_monotonic():
    n = 50
    ext = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    ext[:, 0, 3] = np.linspace(0, 2, n)
    k = np.tile(
        np.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32), (n, 1, 1)
    )
    ov = [view_overlap(ext[0], ext[i], k[0], k[i]) for i in [0, 10, 49]]
    assert ov[0] == 1.0
    assert ov[0] > ov[1] > ov[2]

    entry = generate_scene_entry(ext, k, min_gap=5, max_gap=40)
    assert entry is not None
    left, right = entry["context"]
    assert all(left < t < right for t in entry["target"])


def test_depth_smoothness_loss():
    from styl3r_tpu.losses.depth import depth_smoothness_loss

    flat = jnp.ones((1, 8, 8))
    assert float(depth_smoothness_loss(flat)) == 0.0
    ramp = jnp.broadcast_to(jnp.arange(8.0), (1, 8, 8))
    assert float(depth_smoothness_loss(ramp)) > 0
    # Bilateral weighting suppresses the penalty at image edges.
    img = jnp.broadcast_to((jnp.arange(8.0) > 3)[None, :, None], (1, 8, 8, 3)).astype(jnp.float32)
    step_depth = jnp.broadcast_to((jnp.arange(8.0) > 3), (1, 8, 8)).astype(jnp.float32)
    plain = float(depth_smoothness_loss(step_depth))
    weighted = float(depth_smoothness_loss(step_depth, img))
    assert weighted < plain


def test_resample_patch_embed_kernel():
    from styl3r_tpu.utils.checkpoint import resample_patch_embed_kernel

    rng = np.random.default_rng(9)
    kernel = rng.normal(size=(8, 8, 3, 8)).astype(np.float32)
    resized = resample_patch_embed_kernel(kernel, (16, 16))
    assert resized.shape == (16, 16, 3, 8)
    # FlexiViT property (exact for upsampling, where the resize operator is
    # injective): the resampled kernel's response on an upsampled patch equals
    # the old kernel's response on the original patch.
    from styl3r_tpu.utils.checkpoint import _resize_bilinear_half_pixel

    patch = rng.normal(size=(8, 8, 3)).astype(np.float32)
    big = np.stack(
        [_resize_bilinear_half_pixel(patch[..., c], 16, 16) for c in range(3)], -1
    )
    r_old = np.einsum("hwc,hwco->o", patch, kernel)
    r_new = np.einsum("hwc,hwco->o", big, resized)
    np.testing.assert_allclose(r_new, r_old, rtol=1e-3, atol=1e-3)
    # downsampling still produces the right shape (lossy, least-squares)
    down = resample_patch_embed_kernel(resized, (8, 8))
    assert down.shape == (8, 8, 3, 8)
    # identity when sizes match
    same = resample_patch_embed_kernel(kernel, (8, 8))
    np.testing.assert_array_equal(same, kernel)


def test_compute_metrics_cli(tmp_path):
    """Offline metric CLI smoke (reference src/scripts/compute_metrics.py):
    matched file trees -> per-method PSNR/SSIM table."""
    import sys
    from pathlib import Path as _P

    sys.path.insert(0, str(_P(__file__).resolve().parent.parent))
    import compute_metrics
    from PIL import Image

    rng = np.random.default_rng(0)
    gt = tmp_path / "gt"; pred = tmp_path / "pred"
    for d in (gt / "scene_a", pred / "scene_a"):
        d.mkdir(parents=True)
    img = (rng.uniform(0, 1, (32, 32, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(gt / "scene_a" / "0000.png")
    noisy = np.clip(img.astype(np.int16) + 10, 0, 255).astype(np.uint8)
    Image.fromarray(noisy).save(pred / "scene_a" / "0000.png")

    results = compute_metrics.main(
        ["--gt-dir", str(gt), "--pred-dir", str(pred), "--cpu"]
    )
    ((method, metrics),) = results.items()
    assert np.isfinite(metrics["psnr/all"]) and metrics["psnr/all"] > 20
    assert 0.9 < metrics["ssim/all"] <= 1.0


def test_wandb_checkpoint_path_resolution():
    """update_checkpoint_path (reference misc/wandb_tools.py:44-62): plain
    paths pass through; wandb:// specs parse run/version (download mocked)."""
    from pathlib import Path
    from unittest import mock

    from styl3r_tpu.utils import wandb_tools

    assert wandb_tools.update_checkpoint_path(None, {}) is None
    assert wandb_tools.update_checkpoint_path("/a/b.ckpt", {}) == Path("/a/b.ckpt")

    calls = []

    def fake_download(run_id, download_dir, version):
        calls.append((run_id, version))
        return Path("checkpoints") / run_id / "model.ckpt"

    with mock.patch.object(wandb_tools, "download_checkpoint", fake_download):
        out = wandb_tools.update_checkpoint_path(
            "wandb://abc123:v7", {"project": "styl3r"}
        )
        assert calls == [("styl3r/abc123", "v7")]
        assert out.name == "model.ckpt"
        wandb_tools.update_checkpoint_path("wandb://xyz", {"project": "p"})
        assert calls[-1] == ("p/xyz", None)
    try:
        wandb_tools.update_checkpoint_path("wandb://a:b:c", {"project": "p"})
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
