"""Training loss bundle.

Wires the reference's loss set (`src/loss/__init__.py` registry + the
training_step logic in `model_wrapper_style.py:189-242`) into one jittable
function: MSE, LPIPS (after a warm-up step), VGG style loss, and the identity
branch (a second encoder+render pass with style := context view 0 that must
reconstruct the GT target views).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax.numpy as jnp
from jax import Array

from ..losses.basic import mse_loss
from ..losses.lpips import LPIPSVgg16
from ..losses.style import identity_loss, style_loss
from ..losses.vgg import VGG19Features


@dataclass
class LossBundle:
    """Configured losses + frozen perceptual-net params."""

    mse_weight: Optional[float] = 1.0
    lpips_weight: Optional[float] = None
    lpips_apply_after_step: int = 0
    style_weight: Optional[float] = None  # style-stats weight (reference: 10)
    identity: bool = False
    identity_weight_pixel: float = 70.0
    identity_weight_feat: float = 1.0
    vgg19_params: Optional[Any] = None  # for style/identity losses
    lpips_params: Optional[Any] = None  # for the LPIPS loss

    def vgg_apply(self):
        if self.vgg19_params is None:
            raise ValueError("style/identity loss requires vgg19_params")
        model = VGG19Features()
        return lambda x: model.apply(self.vgg19_params, x)

    def lpips_apply(self):
        if self.lpips_params is None:
            raise ValueError("lpips loss requires lpips_params")
        model = LPIPSVgg16()
        return lambda x, y: model.apply(self.lpips_params, x, y)

    def needs_identity_branch(self) -> bool:
        return self.identity

    def __call__(
        self,
        output,
        batch,
        gaussians,
        global_step: Array | int = 0,
        identity_output=None,
    ) -> Tuple[Array, Dict[str, Array]]:
        target = batch.target_images
        total = jnp.float32(0.0)
        metrics: Dict[str, Array] = {}

        if self.mse_weight:
            l = mse_loss(output.color, target, self.mse_weight)
            total, metrics["mse"] = total + l, l

        if self.lpips_weight and self.lpips_params is not None:
            b, v = target.shape[:2]
            flat_pred = output.color.reshape(b * v, *output.color.shape[2:])
            flat_tgt = target.reshape(b * v, *target.shape[2:])
            l = self.lpips_weight * jnp.mean(self.lpips_apply()(flat_pred, flat_tgt))
            gate = (jnp.asarray(global_step) >= self.lpips_apply_after_step).astype(
                jnp.float32
            )
            l = l * gate
            total, metrics["lpips"] = total + l, l

        if self.style_weight:
            l, style_metrics = style_loss(
                self.vgg_apply(), output.color, target, batch.style_image,
                self.style_weight,
            )
            total = total + l
            metrics["style"] = l
            metrics.update(style_metrics)

        if self.identity and identity_output is not None:
            l = identity_loss(
                self.vgg_apply(), identity_output.color, target,
                self.identity_weight_pixel, self.identity_weight_feat,
            )
            total, metrics["identity"] = total + l, l

        return total, metrics
