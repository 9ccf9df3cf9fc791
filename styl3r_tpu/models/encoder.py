"""The production encoder: unposed context images + style image -> 3D Gaussians.

Equivalent of `EncoderNoPoSplatMultiTokenStyle`
(`src/model/encoder/encoder_noposplat_multi_token_style.py:46-263`), assembled
as one Flax module so the whole path (backbone -> stylizer -> heads ->
adapter) is a single jitted graph.

TPU-first deviations from the reference:
  * per-view Python loops with separate head calls for view 0 vs views 1..V-1
    become two batched head applications (the reference's `head1`/`head2` and
    `gaussian_param_head`/`gaussian_param_head2` are distinct weights — kept —
    but each is applied to its views folded into the batch dim);
  * the `.cpu().tolist()` device syncs on shapes are gone (shapes are static);
  * heads run in float32 regardless of trunk compute dtype (the reference
    wraps heads in autocast(enabled=False)).
"""

from __future__ import annotations

from dataclasses import field
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from ..geometry.gaussians import Gaussians
from .adapter import (
    d_sh,
    map_pdf_to_opacity,
    raw_gaussian_channels,
    unified_gaussian_adapter,
)
from .croco import MultiViewCrocoBackbone, TokenStylizer
from .dpt import DPTGSHead, DPTGSSHHead, DPTPts3dHead

Dtype = Any


class Styl3rEncoder(nn.Module):
    """Dual-branch feed-forward stylized-3DGS encoder.

    Structure branch: multiview CroCo backbone -> per-view pts3d heads
    (head1 for view 0, head2 for the rest) + dpt_gs heads (opacity/scale/rot).
    Appearance branch: token stylizer -> dpt_gs_sh head (3*d_sh SH channels).
    The two channel groups concat into the unified Gaussian adapter.
    """

    sh_degree: int = 0
    patch_size: int = 16
    opacity_initial: float = 0.0
    opacity_final: float = 0.0
    opacity_warm_up: int = 1
    backbone_dtype: Dtype = jnp.float32
    # Optional bf16 compute for the DPT conv trunks (params + final convs stay
    # f32); default None keeps the reference's all-f32 heads.
    head_trunk_dtype: Dtype = None
    # Trunk dims (ViT-L defaults; overridable for small-scale tests).
    enc_depth: int = 24
    dec_depth: int = 12
    enc_dim: int = 1024
    dec_dim: int = 768
    enc_heads: int = 16
    dec_heads: int = 12
    head_feature_dim: int = 256
    head_last_dim: int = 128
    head_layer_dims: tuple = (96, 192, 384, 768)
    # Scratch-training radial pts3d clamp (dpt.reg_dense_pts3d): None keeps
    # the reference-exact unbounded expm1 postprocess (the reference always
    # warm-starts from MASt3R and never trains from random init; see
    # styl3r_tpu/train/scratch_init.py for why scratch needs the clamp).
    pts3d_bound: Optional[float] = None

    def setup(self):
        dims = dict(
            enc_depth=self.enc_depth,
            dec_depth=self.dec_depth,
            enc_dim=self.enc_dim,
            dec_dim=self.dec_dim,
            enc_heads=self.enc_heads,
            dec_heads=self.dec_heads,
        )
        self.backbone = MultiViewCrocoBackbone(
            patch_size=self.patch_size, dtype=self.backbone_dtype, **dims
        )
        self.token_stylizer = TokenStylizer(
            patch_size=self.patch_size, dtype=self.backbone_dtype, **dims
        )
        # DPT hook pattern [0, l/2, 3l/4, l] over the (dec_depth+1)-level pyramid
        # (heads/dpt_gs_head.py:201) -> [0, 6, 9, 12] at dec_depth=12.
        l2 = self.dec_depth
        hooks = (0, l2 * 2 // 4, l2 * 3 // 4, l2)
        # Heads always run f32 (reference: autocast disabled around heads).
        head_dims = dict(
            patch_size=self.patch_size,
            hooks=hooks,
            feature_dim=self.head_feature_dim,
            layer_dims=self.head_layer_dims,
            trunk_dtype=self.head_trunk_dtype,
        )
        self.head1 = DPTPts3dHead(last_dim=self.head_last_dim, pts3d_bound=self.pts3d_bound, **head_dims)
        self.head2 = DPTPts3dHead(last_dim=self.head_last_dim, pts3d_bound=self.pts3d_bound, **head_dims)
        structure_channels = 1 + raw_gaussian_channels(self.sh_degree) - 3 * d_sh(self.sh_degree)
        self.gaussian_param_head = DPTGSHead(out_channels=structure_channels, **head_dims)
        self.gaussian_param_head2 = DPTGSHead(out_channels=structure_channels, **head_dims)
        self.gaussian_appearance_head = DPTGSSHHead(
            out_channels=3 * d_sh(self.sh_degree), **head_dims
        )

    def __call__(
        self,
        context_images: Array,
        context_intrinsics: Array,
        style_image: Array,
        global_step: Array | int = 0,
        deterministic: bool = True,
        return_aux: bool = False,
        transpose_maps: bool = False,
    ) -> Gaussians | Tuple[Gaussians, Dict[str, Array]]:
        """Args:
          context_images: (b, v, h, w, 3) in [-1, 1].
          context_intrinsics: (b, v, 3, 3) normalized.
          style_image: (b, hs, ws, 3) in [-1, 1].
          transpose_maps: portrait mode (reference transpose_to_landscape,
            croco/misc.py:71-110): the caller feeds transposed-to-landscape
            images + swapped intrinsics; the dense per-pixel maps are
            transposed back to the true portrait orientation before the
            adapter, so gaussians land in the true camera frame.
        Returns Gaussians with g = v*h*w per batch element (+ aux dict with
        per-view pts3d/depths when return_aux).
        """
        b, v, h, w, _ = context_images.shape

        enc_feat, enc_pos, dec_feat = self.backbone(context_images, context_intrinsics)
        sty_feat = self.token_stylizer(style_image, enc_feat, enc_pos)

        # Fold views into batch per head. View 0 -> head1, views 1.. -> head2.
        f32 = jnp.float32
        dec0 = [t[:, 0].astype(f32) for t in dec_feat]
        decr = [t[:, 1:].reshape(b * (v - 1), *t.shape[2:]).astype(f32) for t in dec_feat]

        pts0 = self.head1(dec0, (h, w))  # (b, h, w, 3)
        ptsr = self.head2(decr, (h, w)).reshape(b, v - 1, h, w, 3)
        pts_all = jnp.concatenate([pts0[:, None], ptsr], axis=1)  # (b, v, h, w, 3)

        imgs = context_images.astype(f32)
        gs0 = self.gaussian_param_head(dec0, imgs[:, 0], (h, w), deterministic)
        gsr = self.gaussian_param_head2(
            decr, imgs[:, 1:].reshape(b * (v - 1), h, w, 3), (h, w), deterministic
        )
        gs_struct = jnp.concatenate(
            [gs0[:, None], gsr.reshape(b, v - 1, h, w, -1)], axis=1
        )  # (b, v, h, w, 1+7)

        sty_flat = [t.reshape(b * v, *t.shape[2:]).astype(f32) for t in sty_feat]
        gs_appear = self.gaussian_appearance_head(sty_flat, (h, w), deterministic)
        gs_appear = gs_appear.reshape(b, v, h, w, -1)  # (b, v, h, w, 3*d_sh)

        raw = jnp.concatenate([gs_struct, gs_appear], axis=-1)
        if transpose_maps:
            # Back to the true (portrait) orientation: spatial h/w swap only,
            # exactly the reference's `transposed` (croco/misc.py:116-117) —
            # value channels are untouched (the reference trains under this
            # wrapper, so heads predict in the true camera frame).
            pts_all = jnp.swapaxes(pts_all, 2, 3)
            raw = jnp.swapaxes(raw, 2, 3)
            h, w = w, h
        densities = nn.sigmoid(raw[..., 0])
        opacities = map_pdf_to_opacity(
            densities, global_step, self.opacity_initial, self.opacity_final,
            self.opacity_warm_up,
        )

        gaussians = unified_gaussian_adapter(
            means=pts_all.reshape(b, v * h * w, 3),
            opacities=opacities.reshape(b, v * h * w),
            raw=raw[..., 1:].reshape(b, v * h * w, -1),
            sh_degree=self.sh_degree,
        )
        if return_aux:
            aux = {
                "pts3d": pts_all,  # (b, v, h, w, 3)
                "depths": pts_all[..., 2],
                "densities": densities,
            }
            return gaussians, aux
        return gaussians


class Styl3rTokenStyleEncoder2View(nn.Module):
    """The 2-view `noposplat_token_style` encoder, architecture-faithful
    (encoder_noposplat_token_style.py:150-283): encoder-only `croco_enc`
    backbone -> StructureBuilder (12 self-attn blocks over both views'
    concatenated tokens) for structure, TokenStylizer for appearance; ONE
    shared pts3d head + ONE shared dpt_gs_sh structure head applied to both
    views; dpt_gs_sh appearance head on the stylized tokens.

    Reference's latent bug, documented: its forward calls
    `self.token_stylizer(style, feat1, pos1, feat2, pos2)` but
    TokenStylizer.forward takes (style, content_feat, content_pos) — the
    shipped 2-view style path crashes. We use the working multi-view stylizer
    interface with the two views stacked, which is the evident intent.
    """

    sh_degree: int = 0
    patch_size: int = 16
    opacity_initial: float = 0.0
    opacity_final: float = 0.0
    opacity_warm_up: int = 1
    backbone_dtype: Dtype = jnp.float32
    head_trunk_dtype: Dtype = None
    enc_depth: int = 24
    dec_depth: int = 12
    enc_dim: int = 1024
    dec_dim: int = 768
    enc_heads: int = 16
    dec_heads: int = 12
    head_feature_dim: int = 256
    head_last_dim: int = 128
    head_layer_dims: tuple = (96, 192, 384, 768)
    # Scratch-training radial pts3d clamp (dpt.reg_dense_pts3d): None keeps
    # the reference-exact unbounded expm1 postprocess (the reference always
    # warm-starts from MASt3R and never trains from random init; see
    # styl3r_tpu/train/scratch_init.py for why scratch needs the clamp).
    pts3d_bound: Optional[float] = None

    def setup(self):
        from .croco import CrocoEncBackbone, StructureBuilder, TokenStylizer

        dims = dict(
            enc_depth=self.enc_depth,
            enc_dim=self.enc_dim,
            enc_heads=self.enc_heads,
        )
        self.backbone = CrocoEncBackbone(
            patch_size=self.patch_size, dtype=self.backbone_dtype, **dims
        )
        self.structure_builder = StructureBuilder(
            enc_dim=self.enc_dim, dec_dim=self.dec_dim,
            dec_depth=self.dec_depth, dec_heads=self.dec_heads,
            dtype=self.backbone_dtype,
        )
        self.token_stylizer = TokenStylizer(
            patch_size=self.patch_size, dtype=self.backbone_dtype,
            dec_depth=self.dec_depth, dec_dim=self.dec_dim,
            dec_heads=self.dec_heads, enc_depth=self.enc_depth,
            enc_dim=self.enc_dim, enc_heads=self.enc_heads,
        )
        l2 = self.dec_depth
        hooks = (0, l2 * 2 // 4, l2 * 3 // 4, l2)
        head_dims = dict(
            patch_size=self.patch_size,
            hooks=hooks,
            feature_dim=self.head_feature_dim,
            layer_dims=self.head_layer_dims,
            trunk_dtype=self.head_trunk_dtype,
        )
        self.head1 = DPTPts3dHead(last_dim=self.head_last_dim, pts3d_bound=self.pts3d_bound, **head_dims)
        structure_channels = (
            1 + raw_gaussian_channels(self.sh_degree) - 3 * d_sh(self.sh_degree)
        )
        # dpt_gs_sh (no image merger) for BOTH structure and appearance, as
        # the reference's head_factory calls specify.
        self.gaussian_structure_head = DPTGSSHHead(
            out_channels=structure_channels, **head_dims
        )
        self.gaussian_appearance_head = DPTGSSHHead(
            out_channels=3 * d_sh(self.sh_degree), **head_dims
        )

    def __call__(
        self,
        context_images: Array,  # (b, 2, h, w, 3) in [-1, 1]
        context_intrinsics: Array,  # (b, 2, 3, 3)
        style_image: Array,  # (b, hs, ws, 3) in [-1, 1]
        global_step: Array | int = 0,
        deterministic: bool = True,
        return_aux: bool = False,
        distill_only: bool = False,
    ):
        b, v, h, w, _ = context_images.shape
        if v != 2:
            raise ValueError("the token_style encoder is strictly 2-view")

        feats, pos = self.backbone(context_images, context_intrinsics)
        structure = self.structure_builder(feats, pos)

        f32 = jnp.float32
        struct_flat = [
            t.reshape(b * v, *t.shape[2:]).astype(f32) for t in structure
        ]
        pts = self.head1(struct_flat, (h, w)).reshape(b, v, h, w, 3)
        if distill_only:
            # Stage-0 distillation path: pts3d only, no stylization/render
            # (encoder_noposplat_token_style.py:164-183).
            return {"pts3d": pts, "depths": pts[..., 2]}

        sty = self.token_stylizer(style_image, feats, pos)
        sty_flat = [t.reshape(b * v, *t.shape[2:]).astype(f32) for t in sty]

        gs_struct = self.gaussian_structure_head(
            struct_flat, (h, w), deterministic
        ).reshape(b, v, h, w, -1)
        gs_appear = self.gaussian_appearance_head(
            sty_flat, (h, w), deterministic
        ).reshape(b, v, h, w, -1)

        raw = jnp.concatenate([gs_struct, gs_appear], axis=-1)
        densities = nn.sigmoid(raw[..., 0])
        opacities = map_pdf_to_opacity(
            densities, global_step, self.opacity_initial, self.opacity_final,
            self.opacity_warm_up,
        )
        gaussians = unified_gaussian_adapter(
            means=pts.reshape(b, v * h * w, 3),
            opacities=opacities.reshape(b, v * h * w),
            raw=raw[..., 1:].reshape(b, v * h * w, -1),
            sh_degree=self.sh_degree,
        )
        if return_aux:
            return gaussians, {
                "pts3d": pts,
                "depths": pts[..., 2],
                "densities": densities,
            }
        return gaussians


class NoPoSplatMultiEncoder(nn.Module):
    """The style-free NoPoSplat N-view encoder, architecture-faithful
    (encoder_noposplat_multi.py:126-233): multiview CroCo backbone ->
    per-view pts3d heads + dpt_gs heads that emit the FULL raw gaussian
    channels (opacity + scale/rot + 3*d_sh SH) — no token stylizer /
    appearance branch. Registry names `noposplat` / `noposplat_multi`."""

    sh_degree: int = 0
    patch_size: int = 16
    opacity_initial: float = 0.0
    opacity_final: float = 0.0
    opacity_warm_up: int = 1
    backbone_dtype: Dtype = jnp.float32
    head_trunk_dtype: Dtype = None
    enc_depth: int = 24
    dec_depth: int = 12
    enc_dim: int = 1024
    dec_dim: int = 768
    enc_heads: int = 16
    dec_heads: int = 12
    head_feature_dim: int = 256
    head_last_dim: int = 128
    head_layer_dims: tuple = (96, 192, 384, 768)
    # Scratch-training radial pts3d clamp (dpt.reg_dense_pts3d): None keeps
    # the reference-exact unbounded expm1 postprocess (the reference always
    # warm-starts from MASt3R and never trains from random init; see
    # styl3r_tpu/train/scratch_init.py for why scratch needs the clamp).
    pts3d_bound: Optional[float] = None

    def setup(self):
        dims = dict(
            enc_depth=self.enc_depth,
            dec_depth=self.dec_depth,
            enc_dim=self.enc_dim,
            dec_dim=self.dec_dim,
            enc_heads=self.enc_heads,
            dec_heads=self.dec_heads,
        )
        self.backbone = MultiViewCrocoBackbone(
            patch_size=self.patch_size, dtype=self.backbone_dtype, **dims
        )
        l2 = self.dec_depth
        hooks = (0, l2 * 2 // 4, l2 * 3 // 4, l2)
        head_dims = dict(
            patch_size=self.patch_size,
            hooks=hooks,
            feature_dim=self.head_feature_dim,
            layer_dims=self.head_layer_dims,
            trunk_dtype=self.head_trunk_dtype,
        )
        self.head1 = DPTPts3dHead(last_dim=self.head_last_dim, pts3d_bound=self.pts3d_bound, **head_dims)
        self.head2 = DPTPts3dHead(last_dim=self.head_last_dim, pts3d_bound=self.pts3d_bound, **head_dims)
        full_channels = 1 + raw_gaussian_channels(self.sh_degree)
        self.gaussian_param_head = DPTGSHead(out_channels=full_channels, **head_dims)
        self.gaussian_param_head2 = DPTGSHead(out_channels=full_channels, **head_dims)

    def __call__(
        self,
        context_images: Array,
        context_intrinsics: Array,
        style_image: Array = None,  # accepted and ignored (uniform interface)
        global_step: Array | int = 0,
        deterministic: bool = True,
        return_aux: bool = False,
    ):
        b, v, h, w, _ = context_images.shape
        _, _, dec_feat = self.backbone(context_images, context_intrinsics)

        f32 = jnp.float32
        dec0 = [t[:, 0].astype(f32) for t in dec_feat]
        decr = [t[:, 1:].reshape(b * (v - 1), *t.shape[2:]).astype(f32) for t in dec_feat]
        pts0 = self.head1(dec0, (h, w))
        ptsr = self.head2(decr, (h, w)).reshape(b, v - 1, h, w, 3)
        pts_all = jnp.concatenate([pts0[:, None], ptsr], axis=1)

        imgs = context_images.astype(f32)
        gs0 = self.gaussian_param_head(dec0, imgs[:, 0], (h, w), deterministic)
        gsr = self.gaussian_param_head2(
            decr, imgs[:, 1:].reshape(b * (v - 1), h, w, 3), (h, w), deterministic
        )
        raw = jnp.concatenate(
            [gs0[:, None], gsr.reshape(b, v - 1, h, w, -1)], axis=1
        )
        densities = nn.sigmoid(raw[..., 0])
        opacities = map_pdf_to_opacity(
            densities, global_step, self.opacity_initial, self.opacity_final,
            self.opacity_warm_up,
        )
        gaussians = unified_gaussian_adapter(
            means=pts_all.reshape(b, v * h * w, 3),
            opacities=opacities.reshape(b, v * h * w),
            raw=raw[..., 1:].reshape(b, v * h * w, -1),
            sh_degree=self.sh_degree,
        )
        if return_aux:
            return gaussians, {
                "pts3d": pts_all,
                "depths": pts_all[..., 2],
                "densities": densities,
            }
        return gaussians
