"""Legacy NoPoSplat backbones: ResNet feature pyramid + DINO ViT.

Ports of `src/model/encoder/backbone/backbone_resnet.py` and
`backbone_dino.py` (kept from NoPoSplat; no Styl3R release config uses them,
but they are part of the registry surface). Channel-last NHWC throughout.

Faithfulness notes:
  * torchvision resnets are constructed with
    `norm_layer=InstanceNorm2d(affine=False, track_running_stats=False)`
    (backbone_resnet.py:36-45) — i.e. param-free instance norm, so the only
    weights are convs + the 1x1 output projections; `dino_resnet50` (torch
    hub) keeps real BatchNorm, converted here to folded scale/bias
    ("frozen_bn").
  * feature upsampling uses bilinear align_corners=True; implemented as two
    separable interpolation matmuls (MXU-friendly, exact align-corners
    semantics).
  * the DINO ViT is the standard timm-style ViT (cls token, learned pos
    embed, pre-norm blocks, qkv-bias attention); get_intermediate_layers
    returns the final-normed last block output (dino vision_transformer.py).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

Dtype = Any

RESNET_LAYERS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
    "dino_resnet50": ("bottleneck", (3, 4, 6, 3)),
}


def instance_norm(x: Array, eps: float = 1e-5) -> Array:
    """torch InstanceNorm2d(affine=False): per-sample, per-channel spatial
    normalization with biased variance."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


def resize_bilinear_align_corners(x: Array, out_hw: Tuple[int, int]) -> Array:
    """Bilinear resize with torch align_corners=True semantics, as two
    separable interpolation matmuls (NHWC)."""

    def axis_weights(n_in: int, n_out: int) -> Array:
        if n_in == n_out:
            return jnp.eye(n_in, dtype=jnp.float32)
        if n_out == 1:
            pos = jnp.zeros((1,))
        else:
            pos = jnp.arange(n_out) * ((n_in - 1) / (n_out - 1))
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
        hi = jnp.clip(lo + 1, 0, n_in - 1)
        frac = (pos - lo).astype(jnp.float32)
        w = jnp.zeros((n_out, n_in), jnp.float32)
        w = w.at[jnp.arange(n_out), lo].add(1.0 - frac)
        w = w.at[jnp.arange(n_out), hi].add(frac)
        return w

    h_out, w_out = out_hw
    wh = axis_weights(x.shape[1], h_out)
    ww = axis_weights(x.shape[2], w_out)
    x = jnp.einsum("oh,bhwc->bowc", wh, x)
    return jnp.einsum("ow,bhwc->bhoc", ww, x)


class FrozenNorm(nn.Module):
    """Per-channel scale/bias (BatchNorm folded at conversion) or param-free
    instance norm."""

    features: int
    kind: str = "instance"  # instance | frozen_bn

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.kind == "instance":
            return instance_norm(x)
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale + bias


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    norm: str = "instance"
    downsample: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        identity = x
        out = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, name="conv1",
        )(x)
        out = FrozenNorm(self.features, self.norm, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, name="conv2")(out)
        out = FrozenNorm(self.features, self.norm, name="bn2")(out)
        if self.downsample:
            identity = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv",
            )(x)
            identity = FrozenNorm(self.features, self.norm, name="downsample_norm")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output = 4x
    stride: int = 1
    norm: str = "instance"
    downsample: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        identity = x
        out = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(FrozenNorm(self.features, self.norm, name="bn1")(out))
        out = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, name="conv2",
        )(out)
        out = nn.relu(FrozenNorm(self.features, self.norm, name="bn2")(out))
        out = nn.Conv(self.features * 4, (1, 1), use_bias=False, name="conv3")(out)
        out = FrozenNorm(self.features * 4, self.norm, name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(
                self.features * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv",
            )(x)
            identity = FrozenNorm(self.features * 4, self.norm, name="downsample_norm")(identity)
        return nn.relu(out + identity)


class ResNetTrunk(nn.Module):
    """torchvision-layout ResNet trunk (conv1/bn1/relu + layer1..4)."""

    model: str = "resnet50"
    norm: str = "instance"

    @nn.compact
    def __call__(self, x: Array, num_layers: int = 4, use_first_pool: bool = True):
        """Returns [stem_features, layer1, ..., layer{num_layers-1}] like the
        reference's forward (backbone_resnet.py:66-90: stem, then layers with
        the optional maxpool folded the same — note the reference's
        `index == 0` pool condition never fires inside its loop, so the pool
        effectively applies before layer1 only when use_first_pool is set by
        torchvision semantics; we pool before layer1 when requested)."""
        block_kind, depths = RESNET_LAYERS[self.model]
        block_cls = BasicBlock if block_kind == "basic" else Bottleneck
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False, name="conv1")(x)
        x = nn.relu(FrozenNorm(64, self.norm, name="bn1")(x))
        feats = [x]
        if use_first_pool:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        width = 64
        for li in range(1, num_layers):
            stride = 1 if li == 1 else 2
            for bi in range(depths[li - 1]):
                expansion = 1 if block_kind == "basic" else 4
                needs_down = bi == 0 and (
                    stride != 1 or x.shape[-1] != width * expansion
                )
                x = block_cls(
                    features=width,
                    stride=stride if bi == 0 else 1,
                    norm=self.norm,
                    downsample=needs_down,
                    name=f"layer{li}_{bi}",
                )(x)
            feats.append(x)
            width *= 2
        return feats


class BackboneResnet(nn.Module):
    """ResNet multi-scale feature backbone (backbone_resnet.py:28-101):
    per-layer 1x1 projections to d_out, align-corners bilinear upsample to the
    input resolution, summed."""

    model: str = "resnet50"
    num_layers: int = 4
    use_first_pool: bool = True
    d_out: int = 128

    @nn.compact
    def __call__(self, images: Array) -> Array:
        """images: (b, v, h, w, 3) -> (b, v, h, w, d_out)."""
        b, v, h, w, _ = images.shape
        x = images.reshape(b * v, h, w, 3)
        norm = "frozen_bn" if self.model == "dino_resnet50" else "instance"
        feats = ResNetTrunk(model=self.model, norm=norm, name="model")(
            x, num_layers=self.num_layers, use_first_pool=self.use_first_pool
        )
        out = 0.0
        for i, f in enumerate(feats):
            p = nn.Conv(self.d_out, (1, 1), name=f"projection{i}")(f)
            out = out + resize_bilinear_align_corners(p, (h, w))
        return out.reshape(b, v, h, w, self.d_out)


class DinoViT(nn.Module):
    """Standard DINO/timm ViT (cls token + learned pos embed + pre-norm
    blocks); returns the final-normed token sequence incl. cls."""

    patch_size: int = 8
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: Array) -> Array:
        n, h, w, _ = images.shape
        x = nn.Conv(
            self.dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), name="patch_embed",
            dtype=self.dtype,
        )(images)
        gh, gw = x.shape[1:3]
        x = x.reshape(n, gh * gw, self.dim)
        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.dim)
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, 1 + gh * gw, self.dim),
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (n, 1, self.dim)), x], axis=1)
        x = x + pos
        for i in range(self.depth):
            y = nn.LayerNorm(epsilon=1e-6, name=f"blocks_{i}_norm1", dtype=self.dtype)(x)
            qkv = nn.Dense(self.dim * 3, name=f"blocks_{i}_qkv", dtype=self.dtype)(y)
            q, k, vv = jnp.split(qkv, 3, axis=-1)
            hd = self.dim // self.num_heads

            def heads(t):
                return t.reshape(n, -1, self.num_heads, hd)

            att = jax.nn.dot_product_attention(heads(q), heads(k), heads(vv))
            att = att.reshape(n, -1, self.dim)
            x = x + nn.Dense(self.dim, name=f"blocks_{i}_proj", dtype=self.dtype)(att)
            y = nn.LayerNorm(epsilon=1e-6, name=f"blocks_{i}_norm2", dtype=self.dtype)(x)
            y = nn.Dense(self.dim * 4, name=f"blocks_{i}_fc1", dtype=self.dtype)(y)
            y = nn.Dense(self.dim, name=f"blocks_{i}_fc2", dtype=self.dtype)(
                nn.gelu(y, approximate=False)
            )
            x = x + y
        return nn.LayerNorm(epsilon=1e-6, name="norm", dtype=self.dtype)(x)


class BackboneDino(nn.Module):
    """DINO backbone (backbone_dino.py:21-72): dino ViT tokens (global cls +
    local patch tokens through separate MLPs) + a dino_resnet50 pyramid,
    summed at full resolution."""

    model: str = "dino_vitb8"
    d_out: int = 128

    @property
    def patch_size(self) -> int:
        return int("".join(c for c in self.model if c.isdigit()))

    @nn.compact
    def __call__(self, images: Array) -> Array:
        b, v, h, w, _ = images.shape
        ps = self.patch_size
        if h % ps or w % ps:
            raise ValueError(f"image size must be divisible by patch size {ps}")
        dim = 384 if "vits" in self.model else 768
        resnet_features = BackboneResnet(
            model="dino_resnet50", num_layers=4, use_first_pool=False,
            d_out=self.d_out, name="resnet_backbone",
        )(images)

        tokens = DinoViT(
            patch_size=ps, dim=dim,
            depth=12, num_heads=6 if dim == 384 else 12, name="dino",
        )(images.reshape(b * v, h, w, 3))

        def mlp(name, t):
            t = nn.Dense(768, name=f"{name}_fc1")(t)
            return nn.Dense(self.d_out, name=f"{name}_fc2")(nn.relu(t))

        global_token = mlp("global_token_mlp", tokens[:, 0])  # (bv, d_out)
        local_tokens = mlp("local_token_mlp", tokens[:, 1:])  # (bv, l, d_out)

        global_map = global_token[:, None, None, :]
        gh, gw = h // ps, w // ps
        local_map = local_tokens.reshape(b * v, gh, gw, self.d_out)
        local_map = jnp.repeat(jnp.repeat(local_map, ps, axis=1), ps, axis=2)

        vit_maps = (local_map + global_map).reshape(b, v, h, w, self.d_out)
        return resnet_features + vit_maps


# -- torch-layout converters -------------------------------------------------


def _np(t):
    return t if isinstance(t, np.ndarray) else t.detach().cpu().numpy()


def _conv_p(sd, key):
    return {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}


def _fold_bn(sd, key, eps=1e-5):
    """Eval-mode BatchNorm -> scale/bias (dino_resnet50 conversion)."""
    gamma = _np(sd[f"{key}.weight"])
    beta = _np(sd[f"{key}.bias"])
    mean = _np(sd[f"{key}.running_mean"])
    var = _np(sd[f"{key}.running_var"])
    scale = gamma / np.sqrt(var + eps)
    return {"scale": scale, "bias": beta - mean * scale}


def convert_resnet_trunk(sd, model: str, frozen_bn: bool) -> dict:
    """torchvision/dino-hub resnet state dict -> ResNetTrunk params."""
    block_kind, depths = RESNET_LAYERS[model]
    out = {"conv1": _conv_p(sd, "conv1")}
    if frozen_bn:
        out["bn1"] = _fold_bn(sd, "bn1")
    n_convs = 2 if block_kind == "basic" else 3
    for li in range(1, 5):
        for bi in range(depths[li - 1]):
            p = f"layer{li}.{bi}"
            if f"{p}.conv1.weight" not in sd:
                continue
            blk = {}
            for ci in range(1, n_convs + 1):
                blk[f"conv{ci}"] = _conv_p(sd, f"{p}.conv{ci}")
                if frozen_bn:
                    blk[f"bn{ci}"] = _fold_bn(sd, f"{p}.bn{ci}")
            if f"{p}.downsample.0.weight" in sd:
                blk["downsample_conv"] = _conv_p(sd, f"{p}.downsample.0")
                if frozen_bn:
                    blk["downsample_norm"] = _fold_bn(sd, f"{p}.downsample.1")
            out[f"layer{li}_{bi}"] = blk
    return out


def convert_backbone_resnet(state_dict, model: str, num_layers: int) -> dict:
    """Reference BackboneResnet state dict (model.* + projections.*) ->
    BackboneResnet params."""
    sd = {k[len("model."):]: v for k, v in state_dict.items() if k.startswith("model.")}
    frozen = model == "dino_resnet50"
    params = {"model": convert_resnet_trunk(sd, model, frozen)}
    for i in range(num_layers):
        key = f"projections.layer{i}"
        params[f"projection{i}"] = {
            "kernel": _np(state_dict[f"{key}.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(state_dict[f"{key}.bias"]),
        }
    return {"params": params}


def convert_dino_vit(sd, prefix: str = "") -> dict:
    """facebookresearch/dino ViT state dict -> DinoViT params."""
    g = lambda k: _np(sd[prefix + k])
    params = {
        "cls_token": g("cls_token"),
        "pos_embed": g("pos_embed"),
        "patch_embed": {
            "kernel": g("patch_embed.proj.weight").transpose(2, 3, 1, 0),
            "bias": g("patch_embed.proj.bias"),
        },
        "norm": {"scale": g("norm.weight"), "bias": g("norm.bias")},
    }
    i = 0
    while prefix + f"blocks.{i}.norm1.weight" in sd:
        b = f"blocks.{i}."
        params[f"blocks_{i}_norm1"] = {"scale": g(b + "norm1.weight"), "bias": g(b + "norm1.bias")}
        params[f"blocks_{i}_qkv"] = {"kernel": g(b + "attn.qkv.weight").T, "bias": g(b + "attn.qkv.bias")}
        params[f"blocks_{i}_proj"] = {"kernel": g(b + "attn.proj.weight").T, "bias": g(b + "attn.proj.bias")}
        params[f"blocks_{i}_norm2"] = {"scale": g(b + "norm2.weight"), "bias": g(b + "norm2.bias")}
        params[f"blocks_{i}_fc1"] = {"kernel": g(b + "mlp.fc1.weight").T, "bias": g(b + "mlp.fc1.bias")}
        params[f"blocks_{i}_fc2"] = {"kernel": g(b + "mlp.fc2.weight").T, "bias": g(b + "mlp.fc2.bias")}
        i += 1
    return params
