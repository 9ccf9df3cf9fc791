"""LPIPS perceptual distance (VGG16 variant), as used by the reference via the
`lpips` pip package (`src/loss/loss_lpips.py:27-54`, weight 0.05).

Architecture: VGG16 features at relu1_2, relu2_2, relu3_3, relu4_3, relu5_3;
unit-normalize channels; squared difference; learned 1x1 'lin' weights;
spatial mean; sum over layers. Weights convert from the lpips package's
state dict via `convert_lpips_state`.
"""

from __future__ import annotations

from typing import Any, List, Mapping

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import Array

# torchvision vgg16.features conv indices per LPIPS slice.
VGG16_SLICES = [
    [(0, 64), (2, 64)],
    [("pool",), (5, 128), (7, 128)],
    [("pool",), (10, 256), (12, 256), (14, 256)],
    [("pool",), (17, 512), (19, 512), (21, 512)],
    [("pool",), (24, 512), (26, 512), (28, 512)],
]

# lpips package input scaling layer.
LPIPS_SHIFT = (-0.030, -0.088, -0.188)
LPIPS_SCALE = (0.458, 0.448, 0.450)


class LPIPSVgg16(nn.Module):
    """d(x, y) for NHWC images. With normalize=True inputs are [0, 1]."""

    dtype: Any = jnp.float32

    def _features(self, x: Array) -> List[Array]:
        outs = []
        for slice_convs in VGG16_SLICES:
            for spec in slice_convs:
                if spec[0] == "pool":
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                else:
                    idx, out_ch = spec
                    x = nn.Conv(
                        out_ch, (3, 3), padding=1, dtype=self.dtype, name=f"conv{idx}"
                    )(x)
                    x = nn.relu(x)
            outs.append(x)
        return outs

    @nn.compact
    def __call__(self, x: Array, y: Array, normalize: bool = True) -> Array:
        if normalize:  # [0,1] -> [-1,1]
            x = 2.0 * x - 1.0
            y = 2.0 * y - 1.0
        shift = jnp.asarray(LPIPS_SHIFT, x.dtype)
        scale = jnp.asarray(LPIPS_SCALE, x.dtype)
        x = (x - shift) / scale
        y = (y - shift) / scale

        # One pass over the stacked pair (avoids duplicate submodule creation
        # under nn.compact and halves conv dispatches).
        n = x.shape[0]
        fxy = self._features(jnp.concatenate([x, y], axis=0))
        fx = [f[:n] for f in fxy]
        fy = [f[n:] for f in fxy]
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.sqrt(jnp.sum(a**2, axis=-1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b**2, axis=-1, keepdims=True) + 1e-10)
            diff = (a - b) ** 2
            lin = self.param(
                f"lin{i}", nn.initializers.ones, (diff.shape[-1],), self.dtype
            )
            # lpips lin layers are nonneg 1x1 convs; relu on the weight matches
            # the package's effective use (weights are stored nonneg).
            val = jnp.sum(diff * jnp.maximum(lin, 0.0), axis=-1)
            total = total + jnp.mean(val, axis=(1, 2))
        return total


def convert_lpips_state(lpips_state: Mapping, vgg16_state: Mapping) -> dict:
    """Combine the lpips package state dict (lin weights, keys like
    'lin0.model.1.weight') and a torchvision vgg16 state dict into params."""

    def _np(t):
        return t if isinstance(t, np.ndarray) else t.detach().cpu().numpy()

    params = {}
    for slice_convs in VGG16_SLICES:
        for spec in slice_convs:
            if spec[0] == "pool":
                continue
            idx = spec[0]
            params[f"conv{idx}"] = {
                "kernel": _np(vgg16_state[f"features.{idx}.weight"]).transpose(2, 3, 1, 0),
                "bias": _np(vgg16_state[f"features.{idx}.bias"]),
            }
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        if key not in lpips_state:
            key = f"lins.{i}.model.1.weight"
        params[f"lin{i}"] = _np(lpips_state[key]).reshape(-1)
    return {"params": params}
