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


def scratch_stabilizer(
    gaussians,
    z_min: float = 0.3,
    z_weight: float = 0.1,
    opacity_floor: float = 0.15,
    opacity_weight: float = 0.5,
    dist_ceil: float = 6.0,
    dist_weight: float = 0.05,
) -> Tuple[Array, Dict[str, Array]]:
    """Anti-collapse regularizer for training WITHOUT a MASt3R warm start.

    No reference analog (the reference never trains from scratch). From random
    init, stage-1 MSE training has an absorbing degenerate basin: gaussian
    means drift out of every target frustum (or behind the cameras), rendered
    alpha goes to zero, and d(color)/d(params) becomes EXACTLY zero — the
    model renders black forever (observed: held-out PSNR frozen at 5.34 dB for
    2500 steps). Gradients through the render cannot pull it back, so the
    stabilizer acts on the gaussian parameters directly (always non-zero
    gradient paths through the heads):

      * z-hinge: mean(relu(z_min - means_z)) pushes every point in front of
        the context-0 camera (the prediction frame);
      * opacity floor: relu(opacity_floor - mean(opacity)) — one-sided on the
        MEAN, so individual gaussians can still turn off;
      * distance ceiling: mean(relu(|mean| - dist_ceil)) stops OUTWARD escape
        (observed second failure mode: points drift to depth ~6-18 where a
        0.01-world-unit splat is sub-pixel, the rasterizer culls it, and
        gradients die exactly like the behind-camera case). dist_ceil also
        keeps the pts3d_bound tanh in its linear zone, so radial gradients
        never saturate. Weights are small: genuine far structure demanded by
        the data costs MSE far more than the hinge.

    All terms are exactly zero once the model is in a healthy regime. Use
    together with `scratch_init_heads` and an encoder `pts3d_bound`.
    """
    z = gaussians.means[..., 2]
    z_pen = z_weight * jnp.mean(jnp.maximum(z_min - z, 0.0))
    op_pen = opacity_weight * jnp.maximum(
        opacity_floor - jnp.mean(gaussians.opacities), 0.0
    )
    dist = jnp.linalg.norm(gaussians.means, axis=-1)
    dist_pen = dist_weight * jnp.mean(jnp.maximum(dist - dist_ceil, 0.0))
    total = z_pen + op_pen + dist_pen
    return total, {"stab_z": z_pen, "stab_opacity": op_pen, "stab_dist": dist_pen}


def sparse_anchor_loss(
    gaussians,
    anchor: Dict[str, Array],
    delta: float = 1.0,
) -> Array:
    """Sparse geometric supervision from a COLMAP point cloud (scratch mode).

    No reference analog as a loss, but the exact same ROLE as the reference's
    MASt3R warm start + Dust3R distillation (model_wrapper_style.py:157-171):
    something must give the pts3d heads a depth signal, because photometric
    MSE alone cannot bootstrap geometry from random init. Here the signal is
    the scene's own COLMAP sparse reconstruction (which infer_colmap.py
    already ingests): each tracked 3D point, projected into a context view,
    says "the gaussian predicted at this pixel should sit at this 3D position
    (in the context-0 frame)". Huber, since COLMAP tracks contain outliers
    and occlusion violations.

    anchor dict (built by scripts/overfit_colmap.py make_batch):
      flat_idx: (b, k) int32 into the flattened (v*h*w) gaussian axis;
      target:   (b, k, 3) point positions in the context-0 frame (rescaled);
      mask:     (b, k) float validity.
    """
    pred = jnp.take_along_axis(
        gaussians.means, anchor["flat_idx"][..., None], axis=1
    )  # (b, k, 3)
    err = pred - anchor["target"]
    abs_err = jnp.abs(err)
    huber = jnp.where(
        abs_err <= delta, 0.5 * err * err / delta, abs_err - 0.5 * delta
    ).sum(-1)
    mask = anchor["mask"]
    return (huber * mask).sum() / jnp.clip(mask.sum(), 1.0, None)
