"""SSIM (gaussian-window structural similarity), used for eval metrics and the
photometric pose refinement (reference `src/loss/loss_ssim.py`,
`src/evaluation/metrics.py:33-53`)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


@functools.lru_cache(maxsize=8)
def _gaussian_kernel_np(size: int, sigma: float) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def _filter2d(img: Array, kernel: Array) -> Array:
    """Depthwise 2D filter on (n, h, w, c), VALID padding."""
    c = img.shape[-1]
    k = jnp.broadcast_to(kernel[:, :, None, None], (*kernel.shape, 1, 1))
    img_t = jnp.moveaxis(img, -1, 1).reshape(-1, 1, *img.shape[1:3])  # (n*c, 1, h, w)
    out = jax.lax.conv_general_dilated(
        img_t, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
    )
    out = out.reshape(img.shape[0], c, out.shape[-2], out.shape[-1])
    return jnp.moveaxis(out, 1, -1)


def ssim(
    img1: Array,
    img2: Array,
    max_val: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
    return_map: bool = False,
) -> Array:
    """SSIM over (n, h, w, c) images (or (h, w, c), auto-batched)."""
    squeeze = img1.ndim == 3
    if squeeze:
        img1, img2 = img1[None], img2[None]
    kernel = jnp.asarray(_gaussian_kernel_np(window_size, sigma))
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2

    mu1 = _filter2d(img1, kernel)
    mu2 = _filter2d(img2, kernel)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d(img1 * img1, kernel) - mu1_sq
    sigma2_sq = _filter2d(img2 * img2, kernel) - mu2_sq
    sigma12 = _filter2d(img1 * img2, kernel) - mu12

    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if return_map:
        return ssim_map[0] if squeeze else ssim_map
    out = jnp.mean(ssim_map, axis=(1, 2, 3))
    return out[0] if squeeze else out
