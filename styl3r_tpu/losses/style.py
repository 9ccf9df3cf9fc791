"""Style + identity losses over VGG19 features.

Equivalents of `src/loss/loss_style.py:35-80` and `src/loss/loss_identity.py`:
  * style: content = MSE on relu3_1 + relu4_1 (pred vs GT target views);
    style = MSE of channel-wise mean/std per slice (pred vs style image);
    total = content + style_weight * style (style_weight 10 in config).
  * identity (style := context view 0): 70 * pixel MSE + 1 * sum of feature
    MSEs over all four slices.

Parity note: torch.std uses Bessel's correction (ddof=1) — kept.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import jax.numpy as jnp
from jax import Array

from .vgg import imagenet_normalize


def calc_mean_std(feat: Array, eps: float = 1e-8) -> Tuple[Array, Array]:
    """Channel-wise spatial mean/std of NHWC features (vgg_model.py:19-27;
    std is unbiased like torch.std, + eps)."""
    n, h, w, c = feat.shape
    flat = feat.reshape(n, h * w, c)
    mean = jnp.mean(flat, axis=1)
    std = jnp.std(flat, axis=1, ddof=1) + eps
    return mean, std


def style_loss(
    vgg_apply: Callable[[Array], List[Array]],
    pred: Array,
    target: Array,
    style: Array,
    style_weight: float = 10.0,
) -> Tuple[Array, dict]:
    """Args:
      vgg_apply: params-bound VGG19Features forward (NHWC [ImageNet-norm] -> 4 feats).
      pred/target: (b, v, h, w, 3) renders/GT in [0, 1].
      style: (b, hs, ws, 3) in [0, 1].
    """
    b, v = pred.shape[:2]
    pred_f = vgg_apply(imagenet_normalize(pred.reshape(b * v, *pred.shape[2:])))
    target_f = vgg_apply(imagenet_normalize(target.reshape(b * v, *target.shape[2:])))
    style_rep = jnp.repeat(style[:, None], v, axis=1).reshape(b * v, *style.shape[1:])
    style_f = vgg_apply(imagenet_normalize(style_rep))

    content = jnp.mean((pred_f[-2] - target_f[-2]) ** 2) + jnp.mean(
        (pred_f[-1] - target_f[-1]) ** 2
    )
    style_total = 0.0
    for pf, sf in zip(pred_f, style_f):
        pm, ps = calc_mean_std(pf)
        sm, ss = calc_mean_std(sf)
        style_total = style_total + jnp.mean((pm - sm) ** 2) + jnp.mean((ps - ss) ** 2)

    loss = content + style_weight * style_total
    return loss, {"style_content": content, "style_stats": style_total}


def identity_loss(
    vgg_apply: Callable[[Array], List[Array]],
    pred: Array,
    target: Array,
    weight_1: float = 70.0,
    weight_2: float = 1.0,
) -> Array:
    """Identity branch: renders with style := context view 0 must reconstruct
    the GT target views (loss_identity.py:13-50)."""
    b, v = pred.shape[:2]
    pred_flat = pred.reshape(b * v, *pred.shape[2:])
    target_flat = target.reshape(b * v, *target.shape[2:])
    pixel = jnp.mean((pred_flat - target_flat) ** 2)
    pred_f = vgg_apply(imagenet_normalize(pred_flat))
    target_f = vgg_apply(imagenet_normalize(target_flat))
    feat = 0.0
    for pf, tf in zip(pred_f, target_f):
        feat = feat + jnp.mean((pf - tf) ** 2)
    return weight_1 * pixel + weight_2 * feat
