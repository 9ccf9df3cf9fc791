"""DPT feature-pyramid heads for dense prediction from ViT tokens.

TPU-first equivalents of the reference's three DPT head variants:
  * `dpt` (pts3d regression)   — heads/dpt_head.py + postprocess 'exp';
  * `dpt_gs` (opacity/scale/rot) — heads/dpt_gs_head.py, adds a conv7x7 image
    merger on the raw image and a 2x feature upsample before the head;
  * `dpt_gs_sh` (SH appearance) — heads/dpt_gs_sh_head.py, 2x upsample only.

All share the DPTOutputAdapter trunk (heads/dpt_block.py:264-459): hook 4 of
the 13 decoder levels ([0, 6, 9, 12] for a 12-deep decoder), spatialize,
per-level reassembly to [96, 192, 384, 768] channels at strides [4, 8, 16, 32],
project to 256, then fuse coarse-to-fine with residual conv units and 2x
bilinear (align_corners=True) upsampling.

TPU notes:
  * everything is NHWC so convs map onto the MXU directly;
  * align_corners bilinear resize is two small matmuls (precomputed
    interpolation matrices) instead of a gather — faster on the MXU and exact;
  * the k=s transposed convs in the reassembly are expressed as a per-token
    linear + pixel shuffle (mathematically identical, avoids backend-dependent
    transposed-conv semantics and converts trivially from torch weights).
"""

from __future__ import annotations

import functools
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import Array

Dtype = Any


@functools.lru_cache(maxsize=64)
def _interp_matrix_np(n_in: int, n_out: int) -> np.ndarray:
    """Row-stochastic (n_out, n_in) bilinear interpolation matrix with
    align_corners=True semantics (torch F.interpolate align_corners=True)."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1:
        m[:, 0] = 1.0
        return m
    coords = np.linspace(0.0, n_in - 1.0, n_out)
    lo = np.floor(coords).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    w = (coords - lo).astype(np.float32)
    rows = np.arange(n_out)
    np.add.at(m, (rows, lo), 1.0 - w)
    np.add.at(m, (rows, hi), w)
    return m


def resize_bilinear_ac(x: Array, out_h: int, out_w: int) -> Array:
    """(b, h, w, c) -> (b, out_h, out_w, c), align_corners=True bilinear,
    as two matmuls (MXU-friendly)."""
    _, h, w, _ = x.shape
    my = jnp.asarray(_interp_matrix_np(h, out_h), x.dtype)
    mx = jnp.asarray(_interp_matrix_np(w, out_w), x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", my, x)
    return jnp.einsum("pw,bowc->bopc", mx, x)


def upsample2x(x: Array) -> Array:
    return resize_bilinear_ac(x, x.shape[1] * 2, x.shape[2] * 2)


class PatchExpand(nn.Module):
    """k=s transposed conv as linear + pixel shuffle: each input token expands
    to a k x k block of `features` channels. Equivalent to torch
    ConvTranspose2d(in, out, k, stride=k)."""

    features: int
    factor: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, _ = x.shape
        k = self.factor
        y = nn.Dense(self.features * k * k, dtype=self.dtype, name="expand")(x)
        y = y.reshape(b, h, w, k, k, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(b, h * k, w * k, self.features)


class ResidualConvUnit(nn.Module):
    """relu-conv-relu-conv with skip (heads/dpt_block.py:79-142, no BN)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv2")(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    """Fuse a coarser path with a skip, upsample 2x, project
    (heads/dpt_block.py:144-218)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, res: Optional[Array] = None) -> Array:
        if res is not None:
            x = x + ResidualConvUnit(self.features, dtype=self.dtype, name="resConfUnit1")(res)
        x = ResidualConvUnit(self.features, dtype=self.dtype, name="resConfUnit2")(x)
        x = upsample2x(x)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype, name="out_conv")(x)


class DPTTrunk(nn.Module):
    """Hook + reassemble + fuse; returns the 256-channel path at stride 2."""

    hooks: Sequence[int] = (0, 6, 9, 12)
    layer_dims: Sequence[int] = (96, 192, 384, 768)
    feature_dim: int = 256
    patch_size: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: List[Array], image_size: Tuple[int, int]) -> Array:
        h, w = image_size
        nh, nw = h // self.patch_size, w // self.patch_size
        layers = []
        for i, hook in enumerate(self.hooks):
            t = tokens[hook]
            b, l, c = t.shape
            layers.append(t.reshape(b, nh, nw, c))

        # Reassembly: strides [4, 8, 16, 32] relative to the image.
        l0 = nn.Conv(self.layer_dims[0], (1, 1), dtype=self.dtype, name="act_0_proj")(layers[0])
        l0 = PatchExpand(self.layer_dims[0], 4, dtype=self.dtype, name="act_0_up")(l0)
        l1 = nn.Conv(self.layer_dims[1], (1, 1), dtype=self.dtype, name="act_1_proj")(layers[1])
        l1 = PatchExpand(self.layer_dims[1], 2, dtype=self.dtype, name="act_1_up")(l1)
        l2 = nn.Conv(self.layer_dims[2], (1, 1), dtype=self.dtype, name="act_2_proj")(layers[2])
        l3 = nn.Conv(self.layer_dims[3], (1, 1), dtype=self.dtype, name="act_3_proj")(layers[3])
        l3 = nn.Conv(
            self.layer_dims[3], (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
            name="act_3_down",
        )(l3)

        rn = [
            nn.Conv(
                self.feature_dim, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                name=f"layer{i+1}_rn",
            )(l)
            for i, l in enumerate([l0, l1, l2, l3])
        ]

        path4 = FeatureFusionBlock(self.feature_dim, dtype=self.dtype, name="refinenet4")(rn[3])
        path4 = path4[:, : rn[2].shape[1], : rn[2].shape[2]]
        path3 = FeatureFusionBlock(self.feature_dim, dtype=self.dtype, name="refinenet3")(path4, rn[2])
        path2 = FeatureFusionBlock(self.feature_dim, dtype=self.dtype, name="refinenet2")(path3, rn[1])
        path1 = FeatureFusionBlock(self.feature_dim, dtype=self.dtype, name="refinenet1")(path2, rn[0])
        return path1  # (b, h/2, w/2, 256)


def reg_dense_pts3d(
    raw: Array,
    bound: Optional[float] = None,
    d_min: float = 0.1,
) -> Array:
    """'exp' postprocess (heads/postprocess.py:46-61): direction * expm1(norm).

    With `bound` (scratch-training mode, no reference analog — the reference
    always warm-starts from MASt3R and never needs this), the radial distance
    is smoothly clamped to [d_min, bound]:

        dist = d_min + (bound - d_min) * tanh(expm1(norm) / (bound - d_min))

    which is ~identity for mid-scene depths but caps the expm1 blow-up that
    kills from-scratch optimization: an unbounded head lets |means| explode
    (measured 2.9 -> 1863 in 30 steps), every gaussian leaves every frustum,
    color gradients become exactly zero, and training is dead. The floor stops
    the dual failure mode (all points collapsing onto the camera origin).
    Default None is the reference-exact path.
    """
    norm = jnp.linalg.norm(raw, axis=-1, keepdims=True)
    direction = raw / jnp.clip(norm, 1e-8, None)
    dist = jnp.expm1(norm)
    if bound is not None:
        span = bound - d_min
        dist = d_min + span * jnp.tanh(dist / span)
    return direction * dist


class DPTPts3dHead(nn.Module):
    """'dpt' head: regression tower -> (b, h, w, 3) pts3d via exp postprocess
    (heads/dpt_head.py:101-119 + dpt_block.py:316-324). With `with_conf`
    (the DUSt3R teacher configuration) a 4th channel becomes a confidence
    map, conf = 1 + exp(x) (postprocess.py:66-77, 'exp' mode, vmin=1)."""

    feature_dim: int = 256
    last_dim: int = 128
    hooks: Sequence[int] = (0, 6, 9, 12)
    layer_dims: Sequence[int] = (96, 192, 384, 768)
    patch_size: int = 16
    with_conf: bool = False
    dtype: Dtype = jnp.float32
    # Optional bf16 compute for the conv trunk (params stay f32); the final
    # two convs + exp postprocess always run f32 — pts3d positions are
    # expm1-sensitive (the reference keeps whole heads f32 via no-autocast).
    trunk_dtype: Optional[Dtype] = None
    # Scratch-training radial clamp (see reg_dense_pts3d); None = reference.
    pts3d_bound: Optional[float] = None

    @nn.compact
    def __call__(self, tokens: List[Array], image_size: Tuple[int, int]):
        tdt = self.trunk_dtype or self.dtype
        path1 = DPTTrunk(
            hooks=self.hooks, layer_dims=self.layer_dims, feature_dim=self.feature_dim,
            patch_size=self.patch_size, dtype=tdt, name="trunk",
        )(tokens, image_size)
        x = nn.Conv(self.feature_dim // 2, (3, 3), padding=1, dtype=tdt, name="head_conv1")(path1)
        x = upsample2x(x)
        x = x.astype(jnp.float32)
        x = nn.Conv(self.last_dim, (3, 3), padding=1, dtype=jnp.float32, name="head_conv2")(x)
        x = nn.relu(x)
        out_ch = 4 if self.with_conf else 3
        x = nn.Conv(out_ch, (1, 1), dtype=jnp.float32, name="head_conv3")(x)
        pts = reg_dense_pts3d(x[..., :3], bound=self.pts3d_bound)
        if self.with_conf:
            conf = 1.0 + jnp.exp(jnp.minimum(x[..., 3], 20.0))
            return pts, conf
        return pts


def _pixel_shuffle_tokens(feat: Array, nh: int, nw: int, p: int) -> Array:
    """(b, nh*nw, c*p*p) token features -> (b, nh*p, nw*p, c), matching torch
    `view(B, c*p*p, nh, nw)` + `F.pixel_shuffle(p)` channel ordering
    (channel index = c*p*p with f = c_out*p^2 + dy*p + dx)."""
    b, l, f = feat.shape
    c = f // (p * p)
    x = feat.reshape(b, nh, nw, c, p, p)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (b, nh, p, nw, p, c)
    return x.reshape(b, nh * p, nw * p, c)


class LinearPts3dHead(nn.Module):
    """'linear' pts3d head (heads/linear_head.py:12-40): one Dense from the
    last decoder level to 16x16 x (3[+conf]) per token, pixel-shuffled to full
    resolution, exp postprocess. No release config uses it; kept for parity
    with the reference head registry."""

    patch_size: int = 16
    with_conf: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: List[Array], image_size: Tuple[int, int]):
        h, w = image_size
        p = self.patch_size
        x = tokens[-1]  # (b, l, d)
        out_ch = 3 + int(self.with_conf)
        feat = nn.Dense(out_ch * p * p, dtype=self.dtype, name="proj")(x)
        img = _pixel_shuffle_tokens(feat, h // p, w // p, p)
        pts = reg_dense_pts3d(img[..., :3])
        if self.with_conf:
            conf = 1.0 + jnp.exp(jnp.minimum(img[..., 3], 20.0))
            return pts, conf
        return pts


class LinearGSHead(nn.Module):
    """'linear' gs-params head (heads/linear_head.py:43-76): Dense to
    (2 xy-offset + 1 opacity + d_in raw gaussian channels) x 16x16 per token,
    pixel-shuffled; raw output (the adapter applies activations)."""

    out_channels: int  # 2 + 1 + d_in in the reference
    patch_size: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: List[Array], image_size: Tuple[int, int]) -> Array:
        h, w = image_size
        p = self.patch_size
        feat = nn.Dense(self.out_channels * p * p, dtype=self.dtype, name="proj")(
            tokens[-1]
        )
        return _pixel_shuffle_tokens(feat, h // p, w // p, p)


class GSParamsTower(nn.Module):
    """'gs_params' output tower (dpt_block.py:335-343): conv3x3 -> relu ->
    dropout -> conv1x1.

    `conv_dtype` optionally runs the full-resolution conv3x3 (the single most
    expensive conv in the whole model, ~77 GFLOP at 256^2) in reduced
    precision; the final 1x1 projection always runs f32 so raw gaussian
    channels come out f32."""

    out_channels: int
    feature_dim: int = 256
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    conv_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        cdt = self.conv_dtype or self.dtype
        x = nn.Conv(
            self.feature_dim, (3, 3), padding=1, use_bias=False, dtype=cdt,
            name="head_conv1",
        )(x.astype(cdt))
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = x.astype(jnp.float32)
        return nn.Conv(self.out_channels, (1, 1), dtype=jnp.float32, name="head_conv2")(x)


class DPTGSHead(nn.Module):
    """'dpt_gs' head: structure params (opacity+scale+rot) with a direct
    image-feature merge (heads/dpt_gs_head.py:98-157)."""

    out_channels: int
    feature_dim: int = 256
    hooks: Sequence[int] = (0, 6, 9, 12)
    layer_dims: Sequence[int] = (96, 192, 384, 768)
    patch_size: int = 16
    dtype: Dtype = jnp.float32
    trunk_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        tokens: List[Array],
        images: Array,
        image_size: Tuple[int, int],
        deterministic: bool = True,
    ) -> Array:
        tdt = self.trunk_dtype or self.dtype
        path1 = DPTTrunk(
            hooks=self.hooks, layer_dims=self.layer_dims, feature_dim=self.feature_dim,
            patch_size=self.patch_size, dtype=tdt, name="trunk",
        )(tokens, image_size)
        img_feat = nn.Conv(
            self.feature_dim, (7, 7), padding=3, dtype=tdt, name="input_merger"
        )(images.astype(tdt))
        img_feat = nn.relu(img_feat)
        x = upsample2x(path1).astype(tdt) + img_feat
        return GSParamsTower(
            self.out_channels, self.feature_dim, dtype=self.dtype, conv_dtype=tdt,
            name="head",
        )(x, deterministic)


class DPTGSSHHead(nn.Module):
    """'dpt_gs_sh' head: SH appearance (or generic gs params) at full
    resolution (heads/dpt_gs_sh_head.py:21-74)."""

    out_channels: int
    feature_dim: int = 256
    hooks: Sequence[int] = (0, 6, 9, 12)
    layer_dims: Sequence[int] = (96, 192, 384, 768)
    patch_size: int = 16
    dtype: Dtype = jnp.float32
    trunk_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        tokens: List[Array],
        image_size: Tuple[int, int],
        deterministic: bool = True,
    ) -> Array:
        tdt = self.trunk_dtype or self.dtype
        path1 = DPTTrunk(
            hooks=self.hooks, layer_dims=self.layer_dims, feature_dim=self.feature_dim,
            patch_size=self.patch_size, dtype=tdt, name="trunk",
        )(tokens, image_size)
        x = upsample2x(path1)
        return GSParamsTower(
            self.out_channels, self.feature_dim, dtype=self.dtype, conv_dtype=tdt,
            name="head",
        )(x, deterministic)
