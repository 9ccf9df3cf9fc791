"""2D rotary position embeddings as a fused jnp transform.

TPU-native replacement for the reference's cuRoPE2D CUDA extension
(`src/model/encoder/backbone/croco/curope/kernels.cu`) and its PyTorch
fallback (`src/model/encoder/backbone/croco/pos_embed.py:112-159`). The CUDA
kernel exists only to avoid eager-mode overhead; under jit, XLA fuses this
handful of elementwise ops into the surrounding attention matmuls, so a plain
jnp formulation is already speed-of-light (HBM-bound on the q/k tensors).

Math (must match the reference bit-for-bit so MASt3R weights transfer):
  * head dim D is split into a Y half and an X half;
  * each half of size F gets 1D RoPE with frequencies
    inv_freq[f] = 1 / base**(2f/F), f in [0, F/2);
  * the cos/sin vector for a half is cat(freqs, freqs) and rotate_half
    swaps/negates the two quarters: (x1, x2) -> (-x2, x1);
  * positions are *integer* (y, x) token-grid coordinates.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def _rope1d(tokens: Array, pos: Array, base: float) -> Array:
    """Apply 1D RoPE to (..., n, h, f) tokens given integer positions (..., n)."""
    f = tokens.shape[-1]
    half = f // 2
    exponent = jnp.arange(0, f, 2, dtype=jnp.float32) / f
    inv_freq = 1.0 / (base**exponent)  # (f/2,)
    angles = pos.astype(jnp.float32)[..., None] * inv_freq  # (..., n, f/2)
    cos = jnp.cos(angles)[..., None, :]  # (..., n, 1, f/2)
    sin = jnp.sin(angles)[..., None, :]
    cos = jnp.concatenate([cos, cos], axis=-1).astype(tokens.dtype)
    sin = jnp.concatenate([sin, sin], axis=-1).astype(tokens.dtype)
    x1, x2 = tokens[..., :half], tokens[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return tokens * cos + rotated * sin


def _apply_rope2d_raw(tokens: Array, positions: Array, base: float) -> Array:
    d = tokens.shape[-1]
    y_tok, x_tok = tokens[..., : d // 2], tokens[..., d // 2 :]
    y_out = _rope1d(y_tok, positions[..., 0], base)
    x_out = _rope1d(x_tok, positions[..., 1], base)
    return jnp.concatenate([y_out, x_out], axis=-1)


def apply_rope2d(tokens: Array, positions: Array, base: float = 100.0) -> Array:
    """Rotate (..., n, heads, d) q/k tokens by their 2D grid positions.

    Args:
      tokens: (..., n, h, d) with d % 4 == 0. Layout note: the reference uses
        (b, h, n, d); we keep heads after sequence, which is the layout the
        attention kernels want anyway.
      positions: (..., n, 2) integer (y, x) positions.
      base: RoPE frequency base (the reference model uses RoPE100 -> 100.0).
    """
    return _apply_rope2d_raw(tokens, positions, base)
