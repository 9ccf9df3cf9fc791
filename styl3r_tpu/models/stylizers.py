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


# ---------------------------------------------------------------------------
# "3D photo stylization" legacy stylizer family (stylizer/stylizer.py:11-357)
# + its normalised VGG feature net (stylizer/vgg.py:5-94). Channel-last:
# style images are (b, h, w, 3) in [0, 1]; point features are (b, n, c).
# ---------------------------------------------------------------------------


class NormalizedVGG(nn.Module):
    """The 'vgg_normalised' feature net (stylizer/vgg.py make_vgg +
    NormalizedVGG): 1x1 input remap then reflection-padded 3x3 convs, slices
    ending at relu{1..5}_1. `layer` selects a single slice output; None
    returns all five."""

    layer: Any = None  # 1..5 or None
    pool: str = "max"
    dtype: Any = jnp.float32

    # (sequential conv index in make_vgg, out_channels); pools sit between.
    _CONVS = (
        (0, 3), (2, 64), (5, 64),  # slice1 ends after relu1_1
        (9, 128), (12, 128),
        (16, 256), (19, 256), (22, 256), (25, 256),
        (29, 512), (32, 512), (35, 512), (38, 512),
        (42, 512), (45, 512), (48, 512), (51, 512),
    )
    # conv indices at which each slice's output is taken (after relu):
    # relu1_1 = conv idx 2, relu2_1 = 9, relu3_1 = 16, relu4_1 = 29, relu5_1 = 42.
    _SLICE_END = (2, 9, 16, 29, 42)
    # pools occur before convs at indices 9, 16, 29, 42.
    _POOL_BEFORE = (9, 16, 29, 42)

    @nn.compact
    def __call__(self, x: Array):
        outs = []
        for idx, ch in self._CONVS:
            if idx in self._POOL_BEFORE:
                if self.pool == "max":
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                else:
                    x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            if idx == 0:
                x = nn.Conv(ch, (1, 1), dtype=self.dtype, name=f"conv{idx}")(x)
            else:
                x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
                x = nn.Conv(
                    ch, (3, 3), padding="VALID", dtype=self.dtype, name=f"conv{idx}"
                )(x)
                x = nn.relu(x)
            if idx in self._SLICE_END:
                outs.append(x)
                if self.layer == len(outs):
                    return x
            if self.layer is None and len(outs) == 5:
                break
        return outs


def convert_normalized_vgg(state_dict) -> dict:
    """torch make_vgg state dict ('<seq_idx>.weight'/'.bias', e.g. the
    released ckpts/vgg_normalised.pth) -> NormalizedVGG params."""

    def _np(t):
        return t if isinstance(t, np.ndarray) else t.detach().cpu().numpy()

    params = {}
    for idx, _ in NormalizedVGG._CONVS:
        w = _np(state_dict[f"{idx}.weight"]).transpose(2, 3, 1, 0)
        params[f"conv{idx}"] = {"kernel": w, "bias": _np(state_dict[f"{idx}.bias"])}
    return {"params": params}


def _instance_norm(x: Array, axis: int, eps: float = 1e-5) -> Array:
    """torch F.instance_norm semantics (biased variance)."""
    mean = jnp.mean(x, axis=axis, keepdims=True)
    var = jnp.var(x, axis=axis, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


def adain_cs(content: Array, style_map: Array) -> Array:
    """Reference AdaIN module (stylizer.py:11-21): instance-normalize content
    (b, n, c) and rescale by the style feature map's (b, h, w, c) spatial
    mean/std (torch .std = unbiased)."""
    s_flat = style_map.reshape(style_map.shape[0], -1, style_map.shape[-1])
    n = s_flat.shape[1]
    s_mean = jnp.mean(s_flat, axis=1, keepdims=True)
    s_var = jnp.var(s_flat, axis=1, keepdims=True) * (n / max(n - 1, 1))
    return _instance_norm(content, axis=1) * jnp.sqrt(s_var) + s_mean


class MLP1d(nn.Module):
    """Stack of 1x1 'convs' over (b, n, c) features (torch Conv1d chains)."""

    dims: Tuple[int, ...]
    act: str = "relu"  # applied between layers
    act_first: bool = False  # unzipper variants interleave act before convs

    @nn.compact
    def __call__(self, x: Array) -> Array:
        def activate(v):
            return nn.leaky_relu(v, 0.2) if self.act == "leaky" else nn.relu(v)

        for i, d in enumerate(self.dims):
            if i > 0:
                x = activate(x)
            x = nn.Dense(d, name=f"fc{i}")(x)
        return x


class LST(nn.Module):
    """Learned linear style transfer (stylizer.py:136-202): embed content and
    style into a low-dim space, predict a (embed, embed) transform from their
    covariances, apply to zipped content features."""

    in_dim: int
    embed_dim: int = 32
    n_layers: int = 3

    @nn.compact
    def __call__(self, content: Array, style_map: Array) -> Array:
        # content (b, n, c); style_map (b, h, w, c)
        b, n, c = content.shape
        s = style_map.reshape(b, -1, c)

        c_mean = jnp.mean(content, axis=1, keepdims=True)
        s_mean = jnp.mean(s, axis=1, keepdims=True)
        cc = content - c_mean
        sc = s - s_mean

        dims = []
        d = self.in_dim
        for _ in range(self.n_layers - 1):
            d = max(self.embed_dim, d // 2)
            dims.append(d)
        dims.append(self.embed_dim)
        c_embed = MLP1d(tuple(dims), name="c_net")(cc)
        s_embed = MLP1d(tuple(dims), name="s_net")(sc)

        def cov_vec(x):  # (b, m, e) -> (b, e*e)
            cov = jnp.einsum("bme,bmf->bef", x, x) / x.shape[1]
            return cov.reshape(x.shape[0], -1)

        e = self.embed_dim
        c_mat = nn.Dense(e * e, name="c_fc")(cov_vec(c_embed)).reshape(b, e, e)
        s_mat = nn.Dense(e * e, name="s_fc")(cov_vec(s_embed)).reshape(b, e, e)
        mat = jnp.einsum("bij,bjk->bik", s_mat, c_mat)

        z = nn.Dense(e, name="c_zipper")(cc)
        # torch: c = bmm(mat, c) with c (b, e, n) -> rows transform channels.
        z = jnp.einsum("bij,bnj->bni", mat, z)
        out = nn.Dense(self.in_dim, name="c_unzipper")(z)
        return out + s_mean


class Linear3DStylizer(nn.Module):
    """LST on VGG-layer style stats (stylizer.py:203-233)."""

    vgg_layer: int = 3

    @nn.compact
    def __call__(self, style_image: Array, feats_in: Array) -> Array:
        vgg_dims = (64, 128, 256, 512, 512)
        style = NormalizedVGG(layer=self.vgg_layer, name="vgg")(style_image)
        return LST(in_dim=vgg_dims[self.vgg_layer - 1], name="lst")(feats_in, style)


class AdaIN3DStylizer(nn.Module):
    """Learned AdaIN on point features (stylizer.py:235-284)."""

    vgg_layer: int = 3
    n_zip_layers: int = 2

    @nn.compact
    def __call__(self, style_image: Array, feats_in: Array) -> Array:
        vgg_dims = (64, 128, 256, 512, 512)
        d = vgg_dims[self.vgg_layer - 1]
        style = NormalizedVGG(layer=self.vgg_layer, name="vgg")(style_image)
        z = MLP1d((d,) * self.n_zip_layers, act="leaky", name="zipper")(feats_in)
        cs = adain_cs(z, style)
        return MLP1d((d,) * self.n_zip_layers, act="leaky", name="unzipper")(cs)


class AdaAttN3DStylizer(nn.Module):
    """Attention-weighted AdaIN stylizer (stylizer.py:75-134 + AdaAttN
    :23-73): per-point attention over style positions produces per-point
    style statistics."""

    feats_in_dim: int
    vgg_layer: int = 3
    n_zip_layers: int = 2

    @nn.compact
    def __call__(self, style_image: Array, feats_in: Array) -> Array:
        vgg_dims = (64, 128, 256, 512, 512)
        v_dim = vgg_dims[self.vgg_layer - 1]
        qk_dim = v_dim
        style = NormalizedVGG(layer=self.vgg_layer, name="vgg")(style_image)
        s = style.reshape(style.shape[0], -1, style.shape[-1])  # (b, m, v)

        q = MLP1d((qk_dim,) * self.n_zip_layers, act="leaky", name="q_zipper")(feats_in)
        c = MLP1d((v_dim,) * self.n_zip_layers, act="leaky", name="v_zipper")(feats_in)
        k = s

        # AdaAttN(project=True): 1x1 embeds on instance-normalized q/k, raw s.
        qe = nn.Dense(qk_dim, name="q_embed")(_instance_norm(q, axis=1))
        ke = nn.Dense(qk_dim, name="k_embed")(_instance_norm(k, axis=1))
        se = nn.Dense(v_dim, name="s_embed")(s)

        attn = nn.softmax(jnp.einsum("bnq,bmq->bnm", qe, ke), axis=-1)
        mean = jnp.einsum("bnm,bmv->bnv", attn, se)
        sq_mean = jnp.einsum("bnm,bmv->bnv", attn, se * se)
        std = jnp.sqrt(jnp.maximum(sq_mean - mean * mean, 0.0))
        cs = _instance_norm(c, axis=1) * std + mean
        return MLP1d((v_dim,) * self.n_zip_layers, act="leaky", name="v_unzipper")(cs)


def _convert_conv1d_chain(state_dict, torch_prefix, n_layers, reverse=False) -> dict:
    """torch nn.Sequential of Conv1d(+activations) -> MLP1d params. Conv
    layers sit at even sequential indices (activations between)."""

    def _np(t):
        return t if isinstance(t, np.ndarray) else t.detach().cpu().numpy()

    params = {}
    conv_indices = [i * 2 for i in range(n_layers)]
    for out_i, seq_i in enumerate(conv_indices):
        w = _np(state_dict[f"{torch_prefix}.{seq_i}.weight"])  # (out, in, 1)
        params[f"fc{out_i}"] = {
            "kernel": w[:, :, 0].T,
            "bias": _np(state_dict[f"{torch_prefix}.{seq_i}.bias"]),
        }
    return params


def convert_lst(state_dict, prefix="lst") -> dict:
    """torch LST state dict -> LST params."""

    def _np(t):
        return t if isinstance(t, np.ndarray) else t.detach().cpu().numpy()

    def dense(name):
        w = _np(state_dict[f"{prefix}.{name}.weight"])
        if w.ndim == 3:  # conv1d
            w = w[:, :, 0]
        return {"kernel": w.T, "bias": _np(state_dict[f"{prefix}.{name}.bias"])}

    n_layers = 3
    params = {
        "c_zipper": dense("c_zipper"),
        "c_unzipper": dense("c_unzipper"),
        "c_fc": dense("c_fc"),
        "s_fc": dense("s_fc"),
    }
    for net in ("c_net", "s_net"):
        sub = {}
        # torch: (n_layers-1) Sequential(Conv1d, ReLU) entries + final Conv1d.
        for i in range(n_layers - 1):
            w = _np(state_dict[f"{prefix}.{net}.{i}.0.weight"])[:, :, 0]
            sub[f"fc{i}"] = {
                "kernel": w.T,
                "bias": _np(state_dict[f"{prefix}.{net}.{i}.0.bias"]),
            }
        w = _np(state_dict[f"{prefix}.{net}.{n_layers - 1}.weight"])[:, :, 0]
        sub[f"fc{n_layers - 1}"] = {
            "kernel": w.T,
            "bias": _np(state_dict[f"{prefix}.{net}.{n_layers - 1}.bias"]),
        }
        params[net] = sub
    return params
