"""High-level inference: checkpoint -> gaussians -> aligned renders -> outputs.

Ports the standalone inference flow of `infer_model_re10k.py:262-560` /
`model_wrapper_style.test_step_align` (:391-461): predict normal + stylized
gaussians in one feed-forward pass, optionally align target camera poses by
optimizing SE3 deltas through the differentiable renderer, render views and
trajectory videos, export .ply.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import Array

from ..geometry.gaussians import Gaussians
from ..geometry.se3 import update_pose
from ..models.decoder import render_gaussians
from ..models.styl3r import Batch, Styl3rModel, normalize_images
from ..utils.ply_export import export_ply


def _default_render_kwargs(render_kwargs: dict) -> dict:
    """Bounded caps + Pallas kernels on TPU: differentiating the pure-XLA
    compositor at production gaussian counts OOMs a 16G chip (see
    infer/cli.py); every pose-optimization loop shares these defaults."""
    out = dict(render_kwargs)
    out.setdefault("max_per_tile", 2048)
    out.setdefault("max_tiles_per_gaussian", 8)
    if jax.default_backend() != "cpu":
        out.setdefault("impl", "pallas")
    return out


def align_target_poses(
    gaussians: Gaussians,
    target_extrinsics: Array,
    target_intrinsics: Array,
    target_near: Array,
    target_far: Array,
    target_images: Array,
    image_shape: Tuple[int, int],
    steps: int = 100,
    rot_lr: float = 3e-3,
    trans_lr: float = 1e-3,
    loss_fn: Optional[Callable] = None,
    **render_kwargs,
) -> Array:
    """Optimize per-view SE3 deltas through the renderer and bake them into the
    extrinsics each step (reference test_step_align; deltas reset to zero after
    every update while Adam state persists)."""
    b, v = target_extrinsics.shape[:2]
    render_kwargs = _default_render_kwargs(render_kwargs)
    if loss_fn is None:
        loss_fn = lambda out, batch_images: jnp.mean((out.color - batch_images) ** 2)

    rot_opt = optax.adam(rot_lr)
    trans_opt = optax.adam(trans_lr)

    def compute_loss(deltas, extrinsics):
        out = render_gaussians(
            gaussians, extrinsics, target_intrinsics, target_near, target_far,
            image_shape, cam_rot_delta=deltas["rot"], cam_trans_delta=deltas["trans"],
            **render_kwargs,
        )
        return loss_fn(out, target_images)

    grad_fn = jax.grad(compute_loss)

    def step(carry, _):
        extrinsics, rot_state, trans_state = carry
        deltas = {"rot": jnp.zeros((b, v, 3)), "trans": jnp.zeros((b, v, 3))}
        grads = grad_fn(deltas, extrinsics)
        # optax updates are the signed increments Adam would add to the deltas;
        # since deltas restart at zero each step, the post-step delta IS the
        # update, which we bake into the extrinsics (reference :442-449).
        rot_up, rot_state = rot_opt.update(grads["rot"], rot_state)
        trans_up, trans_state = trans_opt.update(grads["trans"], trans_state)
        new_ext = update_pose(
            trans_up.reshape(b * v, 3),
            rot_up.reshape(b * v, 3),
            extrinsics.reshape(b * v, 4, 4),
        ).reshape(b, v, 4, 4)
        return (new_ext, rot_state, trans_state), None

    rot_state = rot_opt.init(jnp.zeros((b, v, 3)))
    trans_state = trans_opt.init(jnp.zeros((b, v, 3)))
    (extrinsics, _, _), _ = jax.lax.scan(
        step, (target_extrinsics, rot_state, trans_state), None, length=steps
    )
    return extrinsics


class InferencePipeline:
    """Bundles a Styl3rModel + params with jitted predict/render entry points."""

    def __init__(
        self,
        params: Dict,
        sh_degree: int = 0,
        backbone_dtype=jnp.bfloat16,
        image_shape: Tuple[int, int] = (256, 256),
        **model_kwargs,
    ):
        self.model = Styl3rModel(
            sh_degree=sh_degree, backbone_dtype=backbone_dtype, **model_kwargs
        )
        self.params = params
        self.image_shape = image_shape

        self._predict = jax.jit(
            lambda p, imgs, intr, style: self.model.encoder.apply(
                p, normalize_images(imgs), intr, normalize_images(style)
            )
        )
        self._render = jax.jit(
            functools.partial(render_gaussians, image_shape=self.image_shape),
            static_argnames=(),
        )

    @classmethod
    def from_torch_checkpoint(cls, path: str, **kwargs) -> "InferencePipeline":
        from ..utils.checkpoint import convert_styl3r_encoder, load_torch_state_dict

        sd = load_torch_state_dict(path)
        params = jax.tree.map(jnp.asarray, convert_styl3r_encoder(sd))
        return cls(params, **kwargs)

    def predict_gaussians(
        self, context_images: Array, context_intrinsics: Array,
        style_image: Optional[Array] = None,
    ) -> Gaussians:
        """images/style in [0, 1]. style=None -> identity style (context view 0),
        producing the un-stylized gaussians."""
        if style_image is None:
            style_image = context_images[:, 0]
        return self._predict(
            self.params, context_images, context_intrinsics, style_image
        )

    def render(
        self, gaussians: Gaussians, extrinsics, intrinsics, near, far, **kwargs
    ):
        return render_gaussians(
            gaussians, extrinsics, intrinsics, near, far, self.image_shape, **kwargs
        )

    def render_trajectory_video(
        self, gaussians: Gaussians, ext0: np.ndarray, ext1: np.ndarray,
        intrinsics: np.ndarray, near: float, far: float, num_frames: int = 60,
        batch_frames: int = 10,
    ) -> np.ndarray:
        """Interpolate between two cameras and render (reference
        render_video_interpolation, infer_model_re10k.py:179-233)."""
        from .trajectory import interpolate_extrinsics

        t = (np.cos(np.linspace(0, 2 * np.pi, num_frames)) + 1) / 2
        t = 1.0 - t  # smooth in/out
        exts = interpolate_extrinsics(ext0, ext1, t)
        frames = []
        for i in range(0, num_frames, batch_frames):
            chunk = exts[i : i + batch_frames]
            n = len(chunk)
            out = self.render(
                gaussians,
                jnp.asarray(chunk)[None],
                jnp.broadcast_to(jnp.asarray(intrinsics), (1, n, 3, 3)),
                jnp.full((1, n), near),
                jnp.full((1, n), far),
            )
            frames.append(np.asarray(out.color[0]))
        return np.concatenate(frames, axis=0)

    def export_ply(self, gaussians: Gaussians, path: Path, batch_index: int = 0):
        export_ply(
            np.asarray(gaussians.means[batch_index]),
            np.asarray(gaussians.scales[batch_index]),
            np.asarray(gaussians.rotations[batch_index]),
            np.asarray(gaussians.harmonics[batch_index]),
            np.asarray(gaussians.opacities[batch_index]),
            path,
        )
