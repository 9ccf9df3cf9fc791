"""Loss-stack tests: VGG/LPIPS architecture parity vs torchvision (random
weights — the converter and math are under test, not the pretrained features),
style/identity loss behavior, SSIM parity properties."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
from torch import nn

from styl3r_tpu.losses import (
    LPIPSVgg16,
    VGG19Features,
    calc_mean_std,
    convert_lpips_state,
    convert_torchvision_vgg19,
    identity_loss,
    imagenet_normalize,
    mse_loss,
    ssim,
    style_loss,
)

torch.manual_seed(9)


def make_vgg19_features():
    """torchvision vgg19.features layout (conv indices 0,2,5,7,10,12,14,16,18?...)
    rebuilt inline (torchvision is not installed in this env)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            in_ch = v
    return nn.Sequential(*layers[:-1][: 37])


def make_vgg16_features():
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            in_ch = v
    return nn.Sequential(*layers)


def features_state_dict(features):
    return {f"features.{i}.{k}": v for i, m in enumerate(features)
            for k, v in m.state_dict().items()}


def test_vgg19_features_match_torchvision_slices():
    feats = make_vgg19_features().eval()
    x = np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        h1 = feats[:2](xt)
        h2 = feats[2:7](h1)
        h3 = feats[7:12](h2)
        h4 = feats[12:21](h3)
    params = convert_torchvision_vgg19(features_state_dict(feats))
    model = VGG19Features()
    outs = model.apply(jax.tree.map(jnp.asarray, params), jnp.asarray(x))
    for ours, theirs, name in zip(outs, [h1, h2, h3, h4], "1234"):
        np.testing.assert_allclose(
            ours, theirs.permute(0, 2, 3, 1).numpy(), atol=2e-4,
        ), name


def test_calc_mean_std_matches_torch_std():
    x = np.random.default_rng(1).normal(size=(2, 4, 4, 8)).astype(np.float32)
    mean, std = calc_mean_std(jnp.asarray(x))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2).flatten(2)
    np.testing.assert_allclose(mean, xt.mean(-1).numpy(), atol=1e-5)
    np.testing.assert_allclose(std, (xt.std(-1) + 1e-8).numpy(), atol=1e-5)


def _random_vgg():
    feats = make_vgg19_features()
    params = jax.tree.map(
        jnp.asarray, convert_torchvision_vgg19(features_state_dict(feats))
    )
    model = VGG19Features()
    return lambda x: model.apply(params, x)


def test_style_loss_zero_content_when_identical():
    vgg = _random_vgg()
    rng = np.random.default_rng(2)
    pred = jnp.asarray(rng.uniform(0, 1, (1, 2, 32, 32, 3)), jnp.float32)
    style = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)
    loss, metrics = style_loss(vgg, pred, pred, style)
    np.testing.assert_allclose(metrics["style_content"], 0.0, atol=1e-8)
    assert float(metrics["style_stats"]) > 0

    # Style stats are zero when the "style" is one of the rendered views.
    loss2, metrics2 = style_loss(vgg, pred, pred, pred[:, 0])
    assert float(metrics2["style_stats"]) < float(metrics["style_stats"])


def test_identity_loss_zero_for_identical():
    vgg = _random_vgg()
    rng = np.random.default_rng(3)
    pred = jnp.asarray(rng.uniform(0, 1, (1, 2, 32, 32, 3)), jnp.float32)
    np.testing.assert_allclose(identity_loss(vgg, pred, pred), 0.0, atol=1e-7)
    other = jnp.asarray(rng.uniform(0, 1, (1, 2, 32, 32, 3)), jnp.float32)
    assert float(identity_loss(vgg, pred, other)) > 0


def test_mse_loss():
    a = jnp.ones((2, 3))
    b = jnp.zeros((2, 3))
    np.testing.assert_allclose(mse_loss(a, b, weight=0.5), 0.5)


def test_ssim_properties():
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
    np.testing.assert_allclose(ssim(img, img), np.ones(2), atol=1e-5)
    noisy = jnp.clip(img + 0.3 * rng.normal(size=img.shape).astype(np.float32), 0, 1)
    vals = ssim(img, noisy)
    assert float(vals.max()) < 0.95
    assert float(vals.min()) > -1.0


def test_ssim_matches_torch_reference():
    """Compare against a direct torch implementation of gaussian SSIM."""
    rng = np.random.default_rng(5)
    x = rng.uniform(0, 1, (1, 24, 24, 1)).astype(np.float32)
    y = rng.uniform(0, 1, (1, 24, 24, 1)).astype(np.float32)

    # torch version (standard formulation, VALID padding)
    coords = torch.arange(11, dtype=torch.float64) - 5
    g = torch.exp(-(coords**2) / (2 * 1.5**2))
    g /= g.sum()
    kernel = (g[:, None] @ g[None, :]).float()[None, None]
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    yt = torch.from_numpy(y).permute(0, 3, 1, 2)

    def filt(i):
        return F.conv2d(i, kernel)

    mu1, mu2 = filt(xt), filt(yt)
    s1 = filt(xt * xt) - mu1 * mu1
    s2 = filt(yt * yt) - mu2 * mu2
    s12 = filt(xt * yt) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    expected = (
        ((2 * mu1 * mu2 + c1) * (2 * s12 + c2))
        / ((mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2))
    ).mean()

    np.testing.assert_allclose(
        float(ssim(jnp.asarray(x), jnp.asarray(y))[0]), float(expected), atol=1e-5
    )


def test_lpips_converter_and_properties():
    feats = make_vgg16_features()
    # Synthesize lin weights with the lpips package's key layout.
    lin_state = {
        f"lin{i}.model.1.weight": torch.rand(1, c, 1, 1)
        for i, c in enumerate([64, 128, 256, 512, 512])
    }
    params = jax.tree.map(
        jnp.asarray, convert_lpips_state(lin_state, features_state_dict(feats))
    )
    model = LPIPSVgg16()
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
    d_same = model.apply(params, x, x)
    d_diff = model.apply(params, x, y)
    np.testing.assert_allclose(d_same, np.zeros(2), atol=1e-6)
    assert float(d_diff.min()) > 0


def test_adaattn_loss():
    from styl3r_tpu.losses.adaattn import adaattn_loss, adaattn_transform, gram_matrix

    vgg = _random_vgg()
    rng = np.random.default_rng(8)
    pred = jnp.asarray(rng.uniform(0, 1, (1, 2, 32, 32, 3)), jnp.float32)
    style = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)

    # Content term vanishes when pred equals the style-normalized target and
    # the style stats match (pred == target == "style views").
    loss, metrics = adaattn_loss(vgg, pred, pred, style, norm="adain")
    assert float(loss) > 0  # stats differ from the style image
    loss2, metrics2 = adaattn_loss(vgg, pred, pred, pred[:, 0], norm="adain")
    assert float(metrics2["adaattn_style"]) < float(metrics["adaattn_style"])

    # adaattn transform preserves shape and is finite.
    feat = jnp.asarray(rng.normal(size=(1, 8, 8, 16)), jnp.float32)
    sty = jnp.asarray(rng.normal(2, 3, size=(1, 6, 6, 16)), jnp.float32)
    out = adaattn_transform(feat, sty, feat, sty)
    assert out.shape == feat.shape and bool(jnp.isfinite(out).all())

    g = gram_matrix(feat)
    assert g.shape == (1, 16, 16)
    np.testing.assert_allclose(g, jnp.swapaxes(g, 1, 2), atol=1e-6)
