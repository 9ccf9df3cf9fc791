"""Numerical parity tests for the ViT stack against a PyTorch reference.

The torch modules here are built from the published CroCo/DUSt3R block math
(pre-norm ViT with RoPE2D) so that weights converted from torch checkpoints
produce identical outputs in the JAX model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from styl3r_tpu.models.vit import (
    Attention,
    Block,
    CrossAttention,
    DecoderBlock,
    Mlp,
    PatchEmbed,
    token_grid_positions,
)
from styl3r_tpu.ops.rope import apply_rope2d

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# Torch reference math (RoPE2D as specified by CroCo v2 / the curope kernel)
# ---------------------------------------------------------------------------


def torch_rope1d(tokens, pos1d, base):
    # tokens: (b, n, h, f); pos1d: (b, n)
    f = tokens.shape[-1]
    inv_freq = 1.0 / (base ** (torch.arange(0, f, 2).float() / f))
    angles = pos1d.float()[..., None] * inv_freq  # (b, n, f/2)
    cos = torch.cat([angles.cos(), angles.cos()], dim=-1)[:, :, None, :]
    sin = torch.cat([angles.sin(), angles.sin()], dim=-1)[:, :, None, :]
    x1, x2 = tokens[..., : f // 2], tokens[..., f // 2 :]
    rotated = torch.cat([-x2, x1], dim=-1)
    return tokens * cos + rotated * sin


def torch_rope2d(tokens, positions, base=100.0):
    # tokens: (b, n, h, d); positions: (b, n, 2) int
    d = tokens.shape[-1]
    y, x = tokens[..., : d // 2], tokens[..., d // 2 :]
    y = torch_rope1d(y, positions[..., 0], base)
    x = torch_rope1d(x, positions[..., 1], base)
    return torch.cat([y, x], dim=-1)


def torch_attention(q, k, v, scale):
    # (b, n, h, d) layout
    logits = torch.einsum("bqhd,bkhd->bhqk", q, k) * scale
    probs = logits.softmax(dim=-1)
    return torch.einsum("bhqk,bkhd->bqhd", probs, v)


class TorchAttention(torch.nn.Module):
    def __init__(self, dim, num_heads, rope_base=None):
        super().__init__()
        self.num_heads = num_heads
        self.rope_base = rope_base
        self.qkv = torch.nn.Linear(dim, dim * 3, bias=True)
        self.proj = torch.nn.Linear(dim, dim)

    def forward(self, x, pos):
        b, n, c = x.shape
        h = self.num_heads
        qkv = self.qkv(x).reshape(b, n, 3, h, c // h)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.rope_base is not None:
            q = torch_rope2d(q, pos, self.rope_base)
            k = torch_rope2d(k, pos, self.rope_base)
        out = torch_attention(q, k, v, (c // h) ** -0.5).reshape(b, n, c)
        return self.proj(out)


class TorchCrossAttention(torch.nn.Module):
    def __init__(self, dim, num_heads, rope_base=None):
        super().__init__()
        self.num_heads = num_heads
        self.rope_base = rope_base
        self.projq = torch.nn.Linear(dim, dim, bias=True)
        self.projk = torch.nn.Linear(dim, dim, bias=True)
        self.projv = torch.nn.Linear(dim, dim, bias=True)
        self.proj = torch.nn.Linear(dim, dim)

    def forward(self, query, key, value, qpos, kpos):
        b, nq, c = query.shape
        h = self.num_heads
        q = self.projq(query).reshape(b, nq, h, c // h)
        k = self.projk(key).reshape(b, key.shape[1], h, c // h)
        v = self.projv(value).reshape(b, value.shape[1], h, c // h)
        if self.rope_base is not None:
            q = torch_rope2d(q, qpos, self.rope_base)
            k = torch_rope2d(k, kpos, self.rope_base)
        out = torch_attention(q, k, v, (c // h) ** -0.5).reshape(b, nq, c)
        return self.proj(out)


class TorchMlp(torch.nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = torch.nn.Linear(dim, hidden)
        self.fc2 = torch.nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(torch.nn.functional.gelu(self.fc1(x)))


class TorchBlock(torch.nn.Module):
    def __init__(self, dim, num_heads, rope_base=None):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.norm2 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.attn = TorchAttention(dim, num_heads, rope_base)
        self.mlp = TorchMlp(dim, dim * 4)

    def forward(self, x, pos):
        x = x + self.attn(self.norm1(x), pos)
        x = x + self.mlp(self.norm2(x))
        return x


class TorchDecoderBlock(torch.nn.Module):
    def __init__(self, dim, num_heads, rope_base=None):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.norm2 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.norm3 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.norm_y = torch.nn.LayerNorm(dim, eps=1e-6)
        self.attn = TorchAttention(dim, num_heads, rope_base)
        self.cross_attn = TorchCrossAttention(dim, num_heads, rope_base)
        self.mlp = TorchMlp(dim, dim * 4)

    def forward(self, x, y, xpos, ypos):
        x = x + self.attn(self.norm1(x), xpos)
        y_ = self.norm_y(y)
        x = x + self.cross_attn(self.norm2(x), y_, y_, xpos, ypos)
        x = x + self.mlp(self.norm3(x))
        return x


# ---------------------------------------------------------------------------
# Weight transfer helpers (torch module -> flax params dict)
# ---------------------------------------------------------------------------


def t2j_linear(linear):
    out = {"kernel": jnp.asarray(linear.weight.detach().numpy().T)}
    if linear.bias is not None:
        out["bias"] = jnp.asarray(linear.bias.detach().numpy())
    return out


def t2j_layernorm(ln):
    return {
        "scale": jnp.asarray(ln.weight.detach().numpy()),
        "bias": jnp.asarray(ln.bias.detach().numpy()),
    }


def t2j_attention(attn):
    return {"qkv": t2j_linear(attn.qkv), "proj": t2j_linear(attn.proj)}


def t2j_cross_attention(attn):
    return {
        "projq": t2j_linear(attn.projq),
        "projk": t2j_linear(attn.projk),
        "projv": t2j_linear(attn.projv),
        "proj": t2j_linear(attn.proj),
    }


def t2j_mlp(mlp):
    return {"fc1": t2j_linear(mlp.fc1), "fc2": t2j_linear(mlp.fc2)}


def t2j_block(block):
    return {
        "norm1": t2j_layernorm(block.norm1),
        "norm2": t2j_layernorm(block.norm2),
        "attn": t2j_attention(block.attn),
        "mlp": t2j_mlp(block.mlp),
    }


def t2j_decoder_block(block):
    return {
        "norm1": t2j_layernorm(block.norm1),
        "norm2": t2j_layernorm(block.norm2),
        "norm3": t2j_layernorm(block.norm3),
        "norm_y": t2j_layernorm(block.norm_y),
        "attn": t2j_attention(block.attn),
        "cross_attn": t2j_cross_attention(block.cross_attn),
        "mlp": t2j_mlp(block.mlp),
    }


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

DIM, HEADS, N, B = 64, 4, 18, 2


def rand_tokens(shape):
    return np.random.default_rng(0).normal(size=shape).astype(np.float32)


def rand_positions(b, n, hi=7):
    return np.random.default_rng(1).integers(0, hi, size=(b, n, 2))


def test_rope2d_matches_torch_reference():
    tok = rand_tokens((B, N, HEADS, DIM // HEADS))
    pos = rand_positions(B, N)
    ours = apply_rope2d(jnp.asarray(tok), jnp.asarray(pos), 100.0)
    theirs = torch_rope2d(torch.from_numpy(tok), torch.from_numpy(pos), 100.0)
    np.testing.assert_allclose(ours, theirs.numpy(), atol=1e-5)


def test_rope2d_identity_at_origin():
    tok = rand_tokens((1, 4, 2, 16))
    pos = np.zeros((1, 4, 2), dtype=np.int64)
    out = apply_rope2d(jnp.asarray(tok), jnp.asarray(pos))
    np.testing.assert_allclose(out, tok, atol=1e-6)


def test_attention_block_parity():
    x = rand_tokens((B, N, DIM))
    pos = rand_positions(B, N)
    tblock = TorchBlock(DIM, HEADS, rope_base=100.0).eval()
    with torch.no_grad():
        expected = tblock(torch.from_numpy(x), torch.from_numpy(pos)).numpy()
    jblock = Block(dim=DIM, num_heads=HEADS, rope_base=100.0)
    params = {"params": t2j_block(tblock)}
    got = jblock.apply(params, jnp.asarray(x), jnp.asarray(pos))
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_decoder_block_parity():
    x = rand_tokens((B, N, DIM))
    y = rand_tokens((B, N + 5, DIM))
    xpos = rand_positions(B, N)
    ypos = rand_positions(B, N + 5)
    tblock = TorchDecoderBlock(DIM, HEADS, rope_base=100.0).eval()
    with torch.no_grad():
        expected = tblock(
            torch.from_numpy(x),
            torch.from_numpy(y),
            torch.from_numpy(xpos),
            torch.from_numpy(ypos),
        ).numpy()
    jblock = DecoderBlock(dim=DIM, num_heads=HEADS, rope_base=100.0)
    params = {"params": t2j_decoder_block(tblock)}
    got, _ = jblock.apply(
        params, jnp.asarray(x), jnp.asarray(y), jnp.asarray(xpos), jnp.asarray(ypos)
    )
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_patch_embed_parity():
    img = rand_tokens((B, 32, 32, 3))
    conv = torch.nn.Conv2d(3, DIM, kernel_size=16, stride=16)
    with torch.no_grad():
        timg = torch.from_numpy(img).permute(0, 3, 1, 2)
        expected = conv(timg).flatten(2).transpose(1, 2).numpy()  # (b, L, C)
    pe = PatchEmbed(patch_size=16, embed_dim=DIM)
    # torch conv weight (out, in, kh, kw) -> flax (kh, kw, in, out)
    kernel = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    params = {
        "params": {
            "proj": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(conv.bias.detach().numpy())}
        }
    }
    tokens, pos = pe.apply(params, jnp.asarray(img))
    np.testing.assert_allclose(tokens, expected, atol=1e-5)
    # positions are row-major (y, x)
    np.testing.assert_array_equal(pos[0, 0], [0, 0])
    np.testing.assert_array_equal(pos[0, 1], [0, 1])
    np.testing.assert_array_equal(pos[0, 2], [1, 0])
    np.testing.assert_array_equal(pos[0, 3], [1, 1])


def test_token_grid_positions():
    pos = token_grid_positions(2, 3)
    np.testing.assert_array_equal(
        pos, [[0, 0], [0, 1], [0, 2], [1, 0], [1, 1], [1, 2]]
    )


def test_intrinsics_token_position_convention():
    """The intrinsics token is appended with synthetic position (h, 0):
    reference backbone_croco_multiview.py:131-135."""
    pos = token_grid_positions(16, 16)
    add = pos[0:1].copy()
    add = add.at[:, 0].add(pos[-1, 0] + 1)
    np.testing.assert_array_equal(add[0], [16, 0])
