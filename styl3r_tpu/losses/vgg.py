"""VGG19 feature extractor for style/content losses.

Equivalent of the reference VGGEncoder (`src/test/vgg_model.py:79-98`): the
four torchvision `vgg19().features` slices ending at relu1_1, relu2_1,
relu3_1, relu4_1. Weights are converted from a torchvision state dict (the
env has no network access, so weights ship via `convert_torchvision_vgg19`
applied to a downloaded checkpoint at deployment time; tests use random
weights — the math, not the features, is under test).
"""

from __future__ import annotations

from typing import Any, List, Mapping

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import Array

# torchvision vgg19.features conv indices per slice (vgg_model.py:83-86):
#   slice1 = features[:2]   -> conv 0                  -> relu1_1 (64)
#   slice2 = features[2:7]  -> conv 2, pool, conv 5    -> relu2_1 (128)
#   slice3 = features[7:12] -> conv 7, pool, conv 10   -> relu3_1 (256)
#   slice4 = features[12:21]-> conv 12, 14, 16, pool, conv 19 -> relu4_1 (512)
VGG19_SLICE_CONVS = [
    [(0, 3, 64)],
    [(2, 64, 64), ("pool", 0, 0), (5, 64, 128)],
    [(7, 128, 128), ("pool", 0, 0), (10, 128, 256)],
    [
        (12, 256, 256),
        (14, 256, 256),
        (16, 256, 256),
        ("pool", 0, 0),
        (19, 256, 512),
    ],
]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def imagenet_normalize(images: Array) -> Array:
    """[0,1] RGB (..., h, w, 3) -> ImageNet-normalized."""
    mean = jnp.asarray(IMAGENET_MEAN, images.dtype)
    std = jnp.asarray(IMAGENET_STD, images.dtype)
    return (images - mean) / std


class VGG19Features(nn.Module):
    """Returns [relu1_1, relu2_1, relu3_1, relu4_1] features of NHWC input."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        outs = []
        for si, slice_convs in enumerate(VGG19_SLICE_CONVS):
            for spec in slice_convs:
                if spec[0] == "pool":
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                else:
                    idx, _, out_ch = spec
                    x = nn.Conv(
                        out_ch, (3, 3), padding=1, dtype=self.dtype, name=f"conv{idx}"
                    )(x)
                    x = nn.relu(x)
            outs.append(x)
        return outs


def convert_torchvision_vgg19(state_dict: Mapping) -> dict:
    """torchvision vgg19 state dict ('features.N.weight') -> VGG19Features params."""

    def _np(t):
        return t if isinstance(t, np.ndarray) else t.detach().cpu().numpy()

    params = {}
    for slice_convs in VGG19_SLICE_CONVS:
        for spec in slice_convs:
            if spec[0] == "pool":
                continue
            idx = spec[0]
            params[f"conv{idx}"] = {
                "kernel": _np(state_dict[f"features.{idx}.weight"]).transpose(2, 3, 1, 0),
                "bias": _np(state_dict[f"features.{idx}.bias"]),
            }
    return {"params": params}
