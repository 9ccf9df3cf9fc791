"""CroCo ViT-L encoder stacks: the multiview geometry backbone and the token
stylizer, as Flax modules.

TPU-first equivalents of:
  * `src/model/encoder/backbone/backbone_croco_multiview.py` (AsymmetricCroCoMulti):
    a shared ViT-L encoder over all context views, then 12 dual decoder blocks
    where view 0 cross-attends (dec_blocks) to the concat of all other views'
    tokens and views 1..V-1 (dec_blocks2) attend to their complements;
  * `src/model/encoder/token_stylizer/token_stylizer.py` (TokenStylizer):
    a second ViT-L encoder over the style image plus 12 cross-attention decoder
    blocks with all content tokens (flattened over views) as queries and style
    tokens as memory.

Differences from the reference (by design, not oversight):
  * batch/view dims are folded with reshapes under one jit (no per-view Python
    loops at trace level beyond static unrolls);
  * the intrinsics conditioning token (Linear(9 -> 1024), appended with
    synthetic grid position (H/p, 0) — reference backbone_croco_multiview.py:
    127-135) is toggled by `use_intrinsics_token`;
  * compute dtype is configurable (bf16 on TPU), params stay f32.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from .vit import Block, DecoderBlock, PatchEmbed

Dtype = Any

# ViT-L encoder / Base decoder — reference croco_params['ViTLarge_BaseDecoder']
# (backbone_croco_multiview.py:21-32).
ENC_DEPTH = 24
DEC_DEPTH = 12
ENC_DIM = 1024
DEC_DIM = 768
ENC_HEADS = 16
DEC_HEADS = 12
ROPE_BASE = 100.0


def generate_ctx_views(x: Array) -> Array:
    """(b, v, l, c) -> (b, v, (v-1)*l, c): for each view, the concat of every
    *other* view's tokens, in view order (backbone_croco_multiview.py:159-165)."""
    b, v, l, c = x.shape
    idx = jnp.asarray(
        [[j for j in range(v) if j != i] for i in range(v)], dtype=jnp.int32
    )
    ctx = x[:, idx]  # (b, v, v-1, l, c)
    return ctx.reshape(b, v, (v - 1) * l, c)


class CrocoVitEncoder(nn.Module):
    """Patch embed + 24 RoPE2D self-attention blocks + final norm."""

    depth: int = ENC_DEPTH
    dim: int = ENC_DIM
    num_heads: int = ENC_HEADS
    patch_size: int = 16
    dtype: Dtype = jnp.float32

    def setup(self):
        self.patch_embed = PatchEmbed(
            patch_size=self.patch_size, embed_dim=self.dim, dtype=self.dtype
        )
        self.enc_blocks = [
            Block(
                dim=self.dim,
                num_heads=self.num_heads,
                rope_base=ROPE_BASE,
                dtype=self.dtype,
            )
            for _ in range(self.depth)
        ]
        self.enc_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)

    def __call__(
        self, images: Array, extra_token: Optional[Array] = None
    ) -> Tuple[Array, Array]:
        """images: (n, h, w, 3). extra_token: optional (n, 1, dim) conditioning
        token appended with synthetic position (h/p, 0). Returns (tokens, pos)."""
        x, pos = self.patch_embed(images)
        if extra_token is not None:
            n_h = images.shape[1] // self.patch_size
            x = jnp.concatenate([x, extra_token.astype(x.dtype)], axis=1)
            extra_pos = jnp.broadcast_to(
                jnp.asarray([[n_h, 0]], dtype=pos.dtype)[None], (x.shape[0], 1, 2)
            )
            pos = jnp.concatenate([pos, extra_pos], axis=1)
        for blk in self.enc_blocks:
            x = blk(x, pos)
        return self.enc_norm(x), pos


class MultiViewCrocoBackbone(nn.Module):
    """AsymmetricCroCoMulti: shared encoder over V views + dual decoder stacks.

    Returns (enc_feat, enc_pos, dec_feats) where dec_feats is the 13-level
    pyramid [encoder tokens (1024-d), 12 decoder outputs (768-d, last normed)],
    each (b, v, l, c) with the intrinsics token already trimmed
    (backbone_croco_multiview.py:147-227). enc_feat/enc_pos keep the intrinsics
    token — the token stylizer consumes them untrimmed.
    """

    patch_size: int = 16
    use_intrinsics_token: bool = True
    enc_depth: int = ENC_DEPTH
    dec_depth: int = DEC_DEPTH
    enc_dim: int = ENC_DIM
    dec_dim: int = DEC_DIM
    enc_heads: int = ENC_HEADS
    dec_heads: int = DEC_HEADS
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = CrocoVitEncoder(
            depth=self.enc_depth,
            dim=self.enc_dim,
            num_heads=self.enc_heads,
            patch_size=self.patch_size,
            dtype=self.dtype,
        )
        if self.use_intrinsics_token:
            self.intrinsic_encoder = nn.Dense(self.enc_dim, dtype=self.dtype)
        self.decoder_embed = nn.Dense(self.dec_dim, dtype=self.dtype)
        self.dec_blocks = [
            DecoderBlock(
                dim=self.dec_dim, num_heads=self.dec_heads, rope_base=ROPE_BASE, dtype=self.dtype
            )
            for _ in range(self.dec_depth)
        ]
        self.dec_blocks2 = [
            DecoderBlock(
                dim=self.dec_dim, num_heads=self.dec_heads, rope_base=ROPE_BASE, dtype=self.dtype
            )
            for _ in range(self.dec_depth)
        ]
        self.dec_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)

    def __call__(
        self, images: Array, intrinsics: Optional[Array] = None
    ) -> Tuple[Array, Array, List[Array]]:
        """images: (b, v, h, w, 3) in [-1, 1]; intrinsics: (b, v, 3, 3) normalized."""
        b, v, h, w, _ = images.shape
        flat_images = images.reshape(b * v, h, w, 3)

        extra = None
        if self.use_intrinsics_token:
            if intrinsics is None:
                raise ValueError("backbone configured with intrinsics token; pass intrinsics")
            emb = self.intrinsic_encoder(intrinsics.reshape(b * v, 9))
            extra = emb[:, None, :]

        feat, pos = self.encoder(flat_images, extra)
        l = feat.shape[1]
        feat = feat.reshape(b, v, l, self.enc_dim)
        pos = pos.reshape(b, v, l, 2)

        dec_feats = self._decode(feat, pos)

        if self.use_intrinsics_token:
            dec_feats = [t[:, :, :-1] for t in dec_feats]

        return feat, pos, dec_feats

    def _decode(self, feat: Array, pos: Array) -> List[Array]:
        b, v, l, _ = feat.shape
        outputs: List[Array] = [feat]
        x = self.decoder_embed(feat)
        pos_ctx = generate_ctx_views(pos)
        pos0, posr = pos[:, 0], pos[:, 1:].reshape(b * (v - 1), l, 2)
        pos_ctx0 = pos_ctx[:, 0]
        pos_ctxr = pos_ctx[:, 1:].reshape(b * (v - 1), (v - 1) * l, 2)

        for blk1, blk2 in zip(self.dec_blocks, self.dec_blocks2):
            ctx = generate_ctx_views(x)
            f0, _ = blk1(x[:, 0], ctx[:, 0], pos0, pos_ctx0)
            fr, _ = blk2(
                x[:, 1:].reshape(b * (v - 1), l, self.dec_dim),
                ctx[:, 1:].reshape(b * (v - 1), (v - 1) * l, self.dec_dim),
                posr,
                pos_ctxr,
            )
            x = jnp.concatenate(
                [f0[:, None], fr.reshape(b, v - 1, l, self.dec_dim)], axis=1
            )
            outputs.append(x)

        outputs[-1] = self.dec_norm(outputs[-1])
        return outputs


class CrocoEncBackbone(nn.Module):
    """Encoder-only CroCo backbone (AsymmetricCroCoEnc,
    backbone_croco_enc.py:61-226): the shared ViT encoder runs per view with
    the optional intrinsics token; no cross-view decoder. Used by the
    reference distillation experiment (`override /model/encoder/backbone:
    croco_enc`). Returns (feat, pos) with shapes (b, v, l, c) / (b, v, l, 2),
    intrinsics token kept (callers trim like the multiview backbone does)."""

    patch_size: int = 16
    use_intrinsics_token: bool = True
    enc_depth: int = ENC_DEPTH
    enc_dim: int = ENC_DIM
    enc_heads: int = ENC_HEADS
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = CrocoVitEncoder(
            depth=self.enc_depth, dim=self.enc_dim, num_heads=self.enc_heads,
            patch_size=self.patch_size, dtype=self.dtype,
        )
        if self.use_intrinsics_token:
            self.intrinsic_encoder = nn.Dense(self.enc_dim, dtype=self.dtype)

    def __call__(
        self, images: Array, intrinsics: Optional[Array] = None
    ) -> Tuple[Array, Array]:
        b, v, h, w, _ = images.shape
        flat = images.reshape(b * v, h, w, 3)
        extra = None
        if self.use_intrinsics_token:
            if intrinsics is None:
                raise ValueError("backbone configured with intrinsics token; pass intrinsics")
            extra = self.intrinsic_encoder(intrinsics.reshape(b * v, 9))[:, None, :]
        feat, pos = self.encoder(flat, extra)
        l = feat.shape[1]
        return feat.reshape(b, v, l, self.enc_dim), pos.reshape(b, v, l, 2)


class TokenStylizer(nn.Module):
    """Style-image ViT-L encoder + 12 cross-attention decoder blocks where the
    flattened content tokens of all views query the style tokens
    (token_stylizer.py:36-154). Returns the 13-level pyramid (b, v, l-1, c)
    with the per-view intrinsics token trimmed."""

    patch_size: int = 16
    trim_last_token: bool = True
    enc_depth: int = ENC_DEPTH
    dec_depth: int = DEC_DEPTH
    enc_dim: int = ENC_DIM
    dec_dim: int = DEC_DIM
    enc_heads: int = ENC_HEADS
    dec_heads: int = DEC_HEADS
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = CrocoVitEncoder(
            depth=self.enc_depth,
            dim=self.enc_dim,
            num_heads=self.enc_heads,
            patch_size=self.patch_size,
            dtype=self.dtype,
        )
        self.decoder_embed = nn.Dense(self.dec_dim, dtype=self.dtype)
        self.dec_blocks = [
            DecoderBlock(
                dim=self.dec_dim, num_heads=self.dec_heads, rope_base=ROPE_BASE, dtype=self.dtype
            )
            for _ in range(self.dec_depth)
        ]
        self.dec_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)

    def __call__(
        self, style_image: Array, content_feat: Array, content_pos: Array
    ) -> List[Array]:
        """style_image: (b, hs, ws, 3); content_feat/pos: (b, v, l, 1024)/(b, v, l, 2)."""
        b, v, l, _ = content_feat.shape
        style_feat, style_pos = self.encoder(style_image)

        outputs: List[Array] = [content_feat]
        x = self.decoder_embed(content_feat.reshape(b, v * l, self.enc_dim))
        xpos = content_pos.reshape(b, v * l, 2)
        y = self.decoder_embed(style_feat)

        for blk in self.dec_blocks:
            x, _ = blk(x, y, xpos, style_pos)
            outputs.append(x.reshape(b, v, l, self.dec_dim))

        outputs[-1] = self.dec_norm(x).reshape(b, v, l, self.dec_dim)

        if self.trim_last_token:
            outputs = [t[:, :, :-1] for t in outputs]
        return outputs


class StructureBuilder(nn.Module):
    """Decoder-only structure branch of the 2-view token-style encoder
    (structure_builder.py:36-142): project both views' encoder tokens to the
    decoder dim and run 12 RoPE self-attention Blocks over their
    concatenation. Returns the 13-level per-view pyramid [(enc tokens), 12
    block outputs (last normed)], each (b, 2, l-1, c) with the trailing
    intrinsics token trimmed (the reference trims in its encoder's forward,
    structure_builder.py:131-142)."""

    enc_dim: int = ENC_DIM
    dec_dim: int = DEC_DIM
    dec_depth: int = DEC_DEPTH
    dec_heads: int = DEC_HEADS
    trim_last_token: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.decoder_embed = nn.Dense(self.dec_dim, dtype=self.dtype)
        self.dec_blocks = [
            Block(
                dim=self.dec_dim, num_heads=self.dec_heads,
                rope_base=ROPE_BASE, dtype=self.dtype,
            )
            for _ in range(self.dec_depth)
        ]
        self.dec_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)

    def __call__(self, feats: Array, pos: Array) -> List[Array]:
        """feats: (b, 2, l, enc_dim); pos: (b, 2, l, 2)."""
        b, v, l, _ = feats.shape
        outputs: List[Array] = [feats]
        x = self.decoder_embed(feats).reshape(b, v * l, self.dec_dim)
        xpos = pos.reshape(b, v * l, 2)
        for blk in self.dec_blocks:
            x = blk(x, xpos)
            outputs.append(x.reshape(b, v, l, self.dec_dim))
        outputs[-1] = self.dec_norm(x).reshape(b, v, l, self.dec_dim)
        if self.trim_last_token:
            outputs = [t[:, :, :-1] for t in outputs]
        return outputs
