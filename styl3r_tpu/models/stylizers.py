"""Legacy stylization baselines.

Equivalents of `src/model/encoder/stylizer/stylizer.py` + `src/test/vgg_model.py`
(AdaIN2D and the point-cloud stylizers from "3D photo stylization"): these are
not on the production path — the reference uses them as the 2D baseline logged
during validation (AdaIN2D, model_wrapper_style.py:260-308) and in research
scratch (`src/test`). Provided for parity and for baseline comparisons.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..losses.vgg import VGG19Features


def adain(content: Array, style: Array, eps: float = 1e-8) -> Array:
    """Adaptive instance normalization over NHWC features
    (vgg_model.py:28-56): re-normalize content channel statistics to the
    style's."""
    c_mean = jnp.mean(content, axis=(1, 2), keepdims=True)
    c_std = jnp.std(content, axis=(1, 2), keepdims=True) + eps
    s_mean = jnp.mean(style, axis=(1, 2), keepdims=True)
    s_std = jnp.std(style, axis=(1, 2), keepdims=True) + eps
    return s_std * (content - c_mean) / c_std + s_mean


def adain_pointcloud(content: Array, style: Array, eps: float = 1e-8) -> Array:
    """AdaIN over a whole point cloud's features: content (b, n, c) normalized
    to the channel stats of style (b, h, w, c) (vgg_model.py:58-86)."""
    c_mean = jnp.mean(content, axis=1, keepdims=True)
    c_std = jnp.std(content, axis=1, keepdims=True) + eps
    s_flat = style.reshape(style.shape[0], -1, style.shape[-1])
    s_mean = jnp.mean(s_flat, axis=1, keepdims=True)
    s_std = jnp.std(s_flat, axis=1, keepdims=True) + eps
    return s_std * (content - c_mean) / c_std + s_mean


def linear_stylizer(content: Array, style: Array, eps: float = 1e-6) -> Array:
    """WCT-style linear feature transform (the 'linear'/'lst' baseline):
    whiten content features and color them with the style covariance."""
    b, n, c = content.shape
    s_flat = style.reshape(b, -1, c)

    def whiten_color(cf, sf):
        cm = cf.mean(axis=0, keepdims=True)
        sm = sf.mean(axis=0, keepdims=True)
        cc = (cf - cm).T @ (cf - cm) / cf.shape[0] + eps * jnp.eye(c)
        sc = (sf - sm).T @ (sf - sm) / sf.shape[0] + eps * jnp.eye(c)
        cw, cv = jnp.linalg.eigh(cc)
        sw, sv = jnp.linalg.eigh(sc)
        cw = jnp.maximum(cw, eps)
        sw = jnp.maximum(sw, eps)
        whiten = cv @ jnp.diag(cw**-0.5) @ cv.T
        color = sv @ jnp.diag(sw**0.5) @ sv.T
        return (cf - cm) @ whiten.T @ color.T + sm

    import jax

    return jax.vmap(whiten_color)(content, s_flat)


class AdaInDecoder(nn.Module):
    """VGG-feature decoder of the AdaIN2D baseline
    (vgg_model.py Decoder: 9 reflection-padded convs with 3 upsamples)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        def rc(x, ch, name, act=True):
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
            x = nn.Conv(ch, (3, 3), padding="VALID", dtype=self.dtype, name=name)(x)
            return nn.relu(x) if act else x

        def up2(x):
            b, h, w, c = x.shape
            return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)

        x = rc(x, 256, "rc1")
        x = up2(x)
        x = rc(x, 256, "rc2")
        x = rc(x, 256, "rc3")
        x = rc(x, 256, "rc4")
        x = rc(x, 128, "rc5")
        x = up2(x)
        x = rc(x, 128, "rc6")
        x = rc(x, 64, "rc7")
        x = up2(x)
        x = rc(x, 64, "rc8")
        x = rc(x, 3, "rc9", act=False)
        return x


class AdaIN2D(nn.Module):
    """The 2D AdaIN stylization baseline (vgg_model.py AdaIN2D): VGG19
    relu4_1 features -> AdaIN -> decoder. Used for the validation-time 2D
    baseline images."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, content: Array, style: Array, alpha: float = 1.0) -> Array:
        vgg = VGG19Features(dtype=self.dtype, name="vgg_encoder")
        # Run both through one batched pass; relu4_1 is the last slice.
        n = content.shape[0]
        feats = vgg(jnp.concatenate([content, style], axis=0))[-1]
        cf, sf = feats[:n], feats[n:]
        t = adain(cf, sf)
        t = alpha * t + (1 - alpha) * cf
        return AdaInDecoder(dtype=self.dtype, name="decoder")(t)


def convert_adain2d_checkpoint(state_dict) -> dict:
    """Convert the reference AdaIN2D baseline weights (ckpts/model_state.pth:
    vgg_encoder.* + decoder.rc{1..9}.conv.*) to AdaIN2D params."""
    from ..losses.vgg import convert_torchvision_vgg19

    def _np(t):
        return t if isinstance(t, np.ndarray) else t.detach().cpu().numpy()

    # Slice-local indices map back to torchvision features indices:
    # slice1 = features[:2], slice2 = [2:7], slice3 = [7:12], slice4 = [12:21].
    slice_offsets = {"slice1": 0, "slice2": 2, "slice3": 7, "slice4": 12}
    vgg_sd = {}
    for k, v in state_dict.items():
        if not k.startswith("vgg_encoder."):
            continue
        _, slice_name, idx, param = k.split(".")
        vgg_sd[f"features.{slice_offsets[slice_name] + int(idx)}.{param}"] = v
    params = {"vgg_encoder": convert_torchvision_vgg19(vgg_sd)["params"]}
    decoder = {}
    for i in range(1, 10):
        w = _np(state_dict[f"decoder.rc{i}.conv.weight"]).transpose(2, 3, 1, 0)
        b = _np(state_dict[f"decoder.rc{i}.conv.bias"])
        decoder[f"rc{i}"] = {"kernel": w, "bias": b}
    params["decoder"] = decoder
    return {"params": params}
