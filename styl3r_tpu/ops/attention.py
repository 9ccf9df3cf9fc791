"""Attention primitive for the ViT stack.

Replaces xformers `memory_efficient_attention`
(`src/model/encoder/backbone/croco/blocks.py:129,195`). Sequences here are
short (<= ~1.3k tokens: 4 views x 257), so plain batched attention maps
straight onto the MXU and XLA fuses softmax + scaling; no flash/splash kernel
is needed for parity, though `jax.nn.dot_product_attention` picks a fused
implementation where available.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array


def dot_product_attention(
    q: Array,
    k: Array,
    v: Array,
    scale: Optional[float] = None,
) -> Array:
    """softmax(q kᵀ · scale) v over (batch, seq, heads, head_dim) tensors."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    try:
        return jax.nn.dot_product_attention(q, k, v, scale=scale)
    except Exception:
        # Fallback for backends without the fused path.
        logits = jnp.einsum("...qhd,...khd->...hqk", q, k) * scale
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("...hqk,...khd->...qhd", probs, v)
