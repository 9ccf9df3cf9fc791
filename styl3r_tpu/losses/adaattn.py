"""AdaAttN-style alternative stylization loss.

Equivalent of `src/loss/loss_adaattn.py` (the alternative to the default
style loss; unused by the release configs): VGG content loss where the target
features are AdaIN/AdaAttN-normalized toward the style, plus a style loss over
configurable statistics (channel mean / std / gram matrices).

The AdaAttN transform computes per-position attention between content and
style features and normalizes content features with the attention-weighted
style mean/std (Liu et al., AdaAttN, ICCV 2021).
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax.numpy as jnp
from jax import Array

from ..models.stylizers import adain
from .vgg import imagenet_normalize


def adaattn_transform(
    q: Array, k: Array, content: Array, style: Array, eps: float = 1e-8
) -> Array:
    """Attention-weighted AdaIN: q/k are (instance-normalized) query/key
    feature stacks, content/style the value features, all NHWC."""
    b, hc, wc, c = content.shape
    hs, ws = style.shape[1:3]

    def inorm(x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        std = jnp.std(x, axis=(1, 2), keepdims=True) + eps
        return (x - mean) / std

    qf = inorm(q).reshape(b, hc * wc, -1)
    kf = inorm(k).reshape(b, hs * ws, -1)
    attn = jnp.einsum("bqc,bkc->bqk", qf, kf) / jnp.sqrt(qf.shape[-1])
    attn = jnp.exp(attn - attn.max(axis=-1, keepdims=True))
    attn = attn / (attn.sum(axis=-1, keepdims=True) + eps)

    sv = style.reshape(b, hs * ws, c)
    mean = jnp.einsum("bqk,bkc->bqc", attn, sv)
    second = jnp.einsum("bqk,bkc->bqc", attn, sv * sv)
    std = jnp.sqrt(jnp.maximum(second - mean * mean, 0.0)) + eps

    cf = content.reshape(b, hc * wc, c)
    c_mean = cf.mean(axis=1, keepdims=True)
    c_std = cf.std(axis=1, keepdims=True) + eps
    out = std * (cf - c_mean) / c_std + mean
    return out.reshape(b, hc, wc, c)


def gram_matrix(feat: Array) -> Array:
    b, h, w, c = feat.shape
    flat = feat.reshape(b, h * w, c)
    return jnp.einsum("bnc,bnd->bcd", flat, flat) / (c * h * w)


def adaattn_loss(
    vgg_apply: Callable[[Array], List[Array]],
    pred: Array,  # (b, v, h, w, 3) in [0, 1]
    target: Array,
    style: Array,  # (b, hs, ws, 3)
    content_layers: Sequence[int] = (3, 4),
    style_layers: Sequence[int] = (1, 2, 3),
    style_stats: Sequence[str] = ("mean", "gram"),
    lam: float = 1.0,
    norm: str = "adain",
) -> Tuple[Array, dict]:
    """Content: L1 between pred features and style-normalized target features;
    style: MSE over the requested statistics. Layer indices are 1-based VGG
    slices (relu1_1..relu4_1 from VGG19Features)."""
    b, v = pred.shape[:2]
    flat = lambda x: x.reshape(b * v, *x.shape[2:])
    pred_f = vgg_apply(imagenet_normalize(flat(pred)))
    tgt_f = vgg_apply(imagenet_normalize(flat(target)))
    style_rep = jnp.repeat(style[:, None], v, axis=1)
    sty_f = vgg_apply(imagenet_normalize(flat(style_rep)))

    content = 0.0
    for l in content_layers:
        if l - 1 >= len(pred_f):
            continue
        p, c, s = pred_f[l - 1], tgt_f[l - 1], sty_f[l - 1]
        if norm == "adain":
            c = adain(c, s)
        elif norm == "adaattn":
            c = adaattn_transform(c, s, c, s)
        content = content + jnp.mean(jnp.abs(p - c))

    style_total = 0.0
    for l in style_layers:
        p, s = pred_f[l - 1], sty_f[l - 1]
        if "mean" in style_stats:
            style_total = style_total + jnp.mean(
                (p.mean(axis=(1, 2)) - s.mean(axis=(1, 2))) ** 2
            )
        if "std" in style_stats:
            style_total = style_total + jnp.mean(
                (p.std(axis=(1, 2)) - s.std(axis=(1, 2))) ** 2
            )
        if "gram" in style_stats:
            style_total = style_total + jnp.mean((gram_matrix(p) - gram_matrix(s)) ** 2)

    loss = content + lam * style_total
    return loss, {"adaattn_content": content, "adaattn_style": style_total}
