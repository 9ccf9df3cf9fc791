"""Frozen DUSt3R/MASt3R teacher for pts3d distillation.

Equivalent of `src/model/distiller/dust3d_backbone.py`: a two-view
asymmetric CroCo (the same trunk as the backbone, without the intrinsics
token) with confidence-predicting DPT pts3d heads, producing pseudo-GT
point maps for the Regr3D distillation loss
(`model_wrapper_style.py:234-242`).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from .croco import MultiViewCrocoBackbone
from .dpt import DPTPts3dHead

Dtype = Any


class Dust3RTeacher(nn.Module):
    """Frozen teacher: 2-view backbone + per-view conf pts3d heads."""

    patch_size: int = 16
    enc_depth: int = 24
    dec_depth: int = 12
    enc_dim: int = 1024
    dec_dim: int = 768
    enc_heads: int = 16
    dec_heads: int = 12
    head_feature_dim: int = 256
    head_last_dim: int = 128
    head_layer_dims: tuple = (96, 192, 384, 768)
    dtype: Dtype = jnp.float32

    def setup(self):
        self.backbone = MultiViewCrocoBackbone(
            patch_size=self.patch_size,
            use_intrinsics_token=False,
            enc_depth=self.enc_depth,
            dec_depth=self.dec_depth,
            enc_dim=self.enc_dim,
            dec_dim=self.dec_dim,
            enc_heads=self.enc_heads,
            dec_heads=self.dec_heads,
            dtype=self.dtype,
        )
        l2 = self.dec_depth
        hooks = (0, l2 * 2 // 4, l2 * 3 // 4, l2)
        head_kwargs = dict(
            hooks=hooks,
            feature_dim=self.head_feature_dim,
            last_dim=self.head_last_dim,
            layer_dims=self.head_layer_dims,
            patch_size=self.patch_size,
            with_conf=True,
        )
        self.downstream_head1 = DPTPts3dHead(**head_kwargs)
        self.downstream_head2 = DPTPts3dHead(**head_kwargs)

    def __call__(self, images: Array) -> Dict[str, Array]:
        """images: (b, 2, h, w, 3) in [-1, 1]. Returns pts3d + conf per view
        (view-1 frame, like DUSt3R)."""
        b, v, h, w, _ = images.shape
        _, _, dec_feat = self.backbone(images, None)
        d0 = [t[:, 0].astype(jnp.float32) for t in dec_feat]
        d1 = [t[:, 1].astype(jnp.float32) for t in dec_feat]
        pts1, conf1 = self.downstream_head1(d0, (h, w))
        pts2, conf2 = self.downstream_head2(d1, (h, w))
        return {"pts3d_1": pts1, "conf_1": conf1, "pts3d_2": pts2, "conf_2": conf2}


def convert_dust3r_checkpoint(state_dict) -> Dict:
    """MASt3R/DUSt3R 'model' state dict -> Dust3RTeacher params."""
    from ..utils.checkpoint import convert_backbone, convert_pts3d_head

    params = {
        "backbone": convert_backbone(state_dict, "backbone")
        if any(k.startswith("backbone.") for k in state_dict)
        else convert_backbone({f"backbone.{k}": v for k, v in state_dict.items()}, "backbone"),
    }
    sd = state_dict
    if not any(k.startswith("downstream_head1.") for k in sd):
        raise ValueError("state dict lacks downstream_head1 keys")
    params["downstream_head1"] = convert_pts3d_head(sd, "downstream_head1")
    params["downstream_head2"] = convert_pts3d_head(sd, "downstream_head2")
    return {"params": params}
