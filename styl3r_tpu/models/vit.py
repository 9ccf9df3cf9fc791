"""CroCo/DUSt3R-style ViT building blocks in Flax.

Functional equivalents of `src/model/encoder/backbone/croco/blocks.py`
(Mlp/Attention/Block/CrossAttention/DecoderBlock/PatchEmbed), designed
TPU-first:
  * images and features are channel-last (NHWC) so convs hit the MXU natively;
  * RoPE2D is inlined jnp math (see styl3r_tpu.ops.rope) instead of a kernel;
  * attention uses jax.nn.dot_product_attention (fused under XLA);
  * submodule names mirror the torch module tree (qkv/proj/fc1/norm1/...) so
    checkpoint conversion is a pure name/layout mapping.

Parity notes: LayerNorm eps=1e-6, exact (erf) GELU, qkv_bias=True.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from ..ops.attention import dot_product_attention
from ..ops.rope import apply_rope2d

Dtype = Any


class Mlp(nn.Module):
    """Transformer MLP: fc1 -> GELU -> fc2 (blocks.py:61-82)."""

    hidden_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        return x


class Attention(nn.Module):
    """Self-attention with optional RoPE2D on q/k (blocks.py:84-134)."""

    dim: int
    num_heads: int
    rope_base: Optional[float] = None
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, pos: Optional[Array]) -> Array:
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.rope_base is not None:
            q = apply_rope2d(q, pos, self.rope_base)
            k = apply_rope2d(k, pos, self.rope_base)
        out = dot_product_attention(q, k, v, scale=head_dim**-0.5)
        out = out.reshape(b, n, c)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class CrossAttention(nn.Module):
    """Cross-attention with optional RoPE2D on q/k (blocks.py:154-200)."""

    dim: int
    num_heads: int
    rope_base: Optional[float] = None
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: Array,
        key: Array,
        value: Array,
        qpos: Optional[Array],
        kpos: Optional[Array],
    ) -> Array:
        b, nq, c = query.shape
        head_dim = self.dim // self.num_heads
        q = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="projq")(query)
        k = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="projk")(key)
        v = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="projv")(value)
        q = q.reshape(b, nq, self.num_heads, head_dim)
        k = k.reshape(b, key.shape[1], self.num_heads, head_dim)
        v = v.reshape(b, value.shape[1], self.num_heads, head_dim)
        if self.rope_base is not None:
            if qpos is not None:
                q = apply_rope2d(q, qpos, self.rope_base)
            if kpos is not None:
                k = apply_rope2d(k, kpos, self.rope_base)
        out = dot_product_attention(q, k, v, scale=head_dim**-0.5)
        out = out.reshape(b, nq, c)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class Block(nn.Module):
    """Pre-norm encoder block: x + attn(ln(x)), x + mlp(ln(x)) (blocks.py:136-152)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    rope_base: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, pos: Optional[Array]) -> Array:
        attn = Attention(
            self.dim, self.num_heads, rope_base=self.rope_base, dtype=self.dtype, name="attn"
        )
        mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype, name="mlp")
        x = x + attn(nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x), pos)
        x = x + mlp(nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x))
        return x


class DecoderBlock(nn.Module):
    """Pre-norm decoder block: self-attn + cross-attn(memory y) + MLP
    (blocks.py:202-222). `norm_mem` layer-norms the memory once per block."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    rope_base: Optional[float] = None
    norm_mem: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        y: Array,
        xpos: Optional[Array],
        ypos: Optional[Array],
    ) -> Tuple[Array, Array]:
        attn = Attention(
            self.dim, self.num_heads, rope_base=self.rope_base, dtype=self.dtype, name="attn"
        )
        cross = CrossAttention(
            self.dim, self.num_heads, rope_base=self.rope_base, dtype=self.dtype, name="cross_attn"
        )
        mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype, name="mlp")
        x = x + attn(nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x), xpos)
        if self.norm_mem:
            y_ = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_y")(y)
        else:
            y_ = y
        x = x + cross(
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x), y_, y_, xpos, ypos
        )
        x = x + mlp(nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm3")(x))
        return x, y


def token_grid_positions(h: int, w: int) -> Array:
    """Integer (y, x) positions of an h*w token grid, row-major — the
    PositionGetter contract (blocks.py:226-238)."""
    ys = jnp.arange(h, dtype=jnp.int32)
    xs = jnp.arange(w, dtype=jnp.int32)
    grid = jnp.stack(jnp.meshgrid(ys, xs, indexing="ij"), axis=-1)
    return grid.reshape(h * w, 2)


class PatchEmbed(nn.Module):
    """16x16 conv patchifier over NHWC images; returns tokens + (y,x) positions
    (blocks.py:240-267, patch_embed.py:19-30 'PatchEmbedDust3R')."""

    patch_size: int = 16
    embed_dim: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: Array) -> Tuple[Array, Array]:
        b, h, w, _ = images.shape
        p = self.patch_size
        if h % p or w % p:
            raise ValueError(f"image size {(h, w)} not divisible by patch size {p}")
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            dtype=self.dtype,
            name="proj",
        )(images)
        tokens = x.reshape(b, (h // p) * (w // p), self.embed_dim)
        pos = jnp.broadcast_to(
            token_grid_positions(h // p, w // p)[None], (b, tokens.shape[1], 2)
        )
        return tokens, pos


def random_token_mask(
    rng_key, batch: int, num_tokens: int, mask_ratio: float
) -> Array:
    """CroCo's RandomMask (croco/masking.py:12-25): boolean (b, n) with
    round(n * ratio) True entries per row. Retained for pretraining parity;
    the downstream models never mask."""
    import jax

    num_masked = int(round(num_tokens * mask_ratio))
    noise = jax.random.uniform(rng_key, (batch, num_tokens))
    ranks = jnp.argsort(jnp.argsort(noise, axis=1), axis=1)
    return ranks < num_masked
