"""Full Styl3R model: unposed context + style image -> Gaussians -> renders.

Ties the encoder (styl3r_tpu.models.encoder) and splatting decoder
(styl3r_tpu.models.decoder) together the way the reference ModelWrapperStyle
does inside training_step (`src/model/model_wrapper_style.py:189-213`), as
plain functions over a params pytree so the whole forward is one jit.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..geometry.gaussians import Gaussians
from .decoder import DecoderOutput, render_gaussians
from .encoder import Styl3rEncoder


class Batch(NamedTuple):
    """One training/inference batch (all leading dims (b, v) or (b,)).

    context_*: the v unposed input views; target_*: views to render/supervise;
    style_image: (b, hs, ws, 3) in [0, 1] (normalized to [-1, 1] on device).
    """

    context_images: Array  # (b, v, h, w, 3) in [0, 1]
    context_intrinsics: Array  # (b, v, 3, 3)
    target_extrinsics: Array  # (b, t, 4, 4) c2w, context-0-relative
    target_intrinsics: Array  # (b, t, 3, 3)
    target_near: Array  # (b, t)
    target_far: Array  # (b, t)
    style_image: Array  # (b, hs, ws, 3) in [0, 1]
    target_images: Optional[Array] = None  # (b, t, h, w, 3) in [0, 1] (training)
    # Optional sparse geometric supervision (scratch training from COLMAP
    # scenes; no reference analog — the reference gets geometry from a MASt3R
    # warm start instead). Dict of arrays; see train/losses.py sparse_anchor_loss.
    sparse_anchor: Optional[Any] = None


def normalize_images(images: Array) -> Array:
    """[0, 1] -> [-1, 1]; the reference's normalize shim (mean/std 0.5)."""
    return images * 2.0 - 1.0


def transpose_intrinsics(k: Array) -> Array:
    """Normalized intrinsics of the h/w-transposed image: fx/cx swap with
    fy/cy (ManyAR portrait handling)."""
    out = k
    out = out.at[..., 0, 0].set(k[..., 1, 1]).at[..., 1, 1].set(k[..., 0, 0])
    out = out.at[..., 0, 2].set(k[..., 1, 2]).at[..., 1, 2].set(k[..., 0, 2])
    return out


class Styl3rModel:
    """Bundles the encoder module with jit-friendly apply functions."""

    def __init__(self, sh_degree: int = 0, backbone_dtype: Any = jnp.float32, **encoder_kwargs):
        self.encoder = Styl3rEncoder(
            sh_degree=sh_degree, backbone_dtype=backbone_dtype, **encoder_kwargs
        )

    def init(self, rng: Array, batch: Batch) -> Dict:
        return self.encoder.init(
            rng,
            normalize_images(batch.context_images),
            batch.context_intrinsics,
            normalize_images(batch.style_image),
        )

    def predict_gaussians(
        self,
        params: Dict,
        batch: Batch,
        global_step: Array | int = 0,
        deterministic: bool = True,
        return_aux: bool = False,
        rngs: Optional[Dict] = None,
        portrait: bool = False,
    ):
        """With `portrait` (whole-batch portrait scenes, h > w), the encoder
        runs in landscape orientation — inputs transposed, intrinsics axis-
        swapped — and its dense maps transpose back before the adapter
        (reference ManyAR_PatchEmbed + transpose_to_landscape,
        croco/patch_embed.py:33-75, croco/misc.py:71-117). Rendering then uses
        the true portrait cameras unchanged."""
        context = normalize_images(batch.context_images)
        style = normalize_images(batch.style_image)
        intrinsics = batch.context_intrinsics
        if portrait:
            context = jnp.swapaxes(context, 2, 3)
            style = jnp.swapaxes(style, 1, 2)
            intrinsics = transpose_intrinsics(intrinsics)
        return self.encoder.apply(
            params,
            context,
            intrinsics,
            style,
            global_step=global_step,
            deterministic=deterministic,
            return_aux=return_aux,
            transpose_maps=portrait,
            rngs=rngs,
        )

    def forward(
        self,
        params: Dict,
        batch: Batch,
        image_shape: Tuple[int, int],
        global_step: Array | int = 0,
        deterministic: bool = True,
        rngs: Optional[Dict] = None,
        return_aux: bool = False,
        portrait: bool = False,
        **render_kwargs,
    ):
        """Predict + render. With return_aux, also returns the encoder's aux
        dict (per-view pts3d/depths — the reference's visualization_dump used
        by the distillation loss, model_wrapper_style.py:234-242)."""
        out = self.predict_gaussians(
            params, batch, global_step, deterministic, return_aux=return_aux,
            rngs=rngs, portrait=portrait,
        )
        gaussians, aux = out if return_aux else (out, None)
        output = render_gaussians(
            gaussians,
            batch.target_extrinsics,
            batch.target_intrinsics,
            batch.target_near,
            batch.target_far,
            image_shape,
            **render_kwargs,
        )
        if return_aux:
            return gaussians, output, aux
        return gaussians, output
