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


def _ssim_cs_per_channel(img1, img2, kernel, c1, c2):
    """Per-channel SSIM and contrast-sensitivity means (reference _ssim,
    loss_ssim.py:58-128, size_average=False)."""
    mu1 = _filter2d(img1, kernel)
    mu2 = _filter2d(img2, kernel)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d(img1 * img1, kernel) - mu1_sq
    sigma2_sq = _filter2d(img2 * img2, kernel) - mu2_sq
    sigma12 = _filter2d(img1 * img2, kernel) - mu12
    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu12 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return jnp.mean(ssim_map, axis=(1, 2)), jnp.mean(cs_map, axis=(1, 2))


def _avg_pool2_pad(x: Array) -> Array:
    """torch avg_pool2d(kernel=2, padding=s%2, count_include_pad=True) on
    NHWC: symmetric zero-pad odd spatial dims by 1, then mean-pool 2x2/2."""
    ph, pw = x.shape[1] % 2, x.shape[2] % 2
    x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    n, h, w, c = x.shape
    # torch floors the output size: a trailing odd row/col (one pad cell when
    # the input was odd) is dropped.
    x = x[:, : 2 * (h // 2), : 2 * (w // 2)]
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(2, 4))


def ms_ssim(
    img1: Array,
    img2: Array,
    max_val: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
    weights=(0.0448, 0.2856, 0.3001, 0.2363, 0.1333),
    size_average: bool = True,
) -> Array:
    """Multi-scale SSIM over (n, h, w, c) images, matching the reference
    `ms_ssim` (loss_ssim.py:190-271): 5 dyadic levels, relu'd cs at the
    coarse levels and relu'd ssim at the finest-window level, combined as a
    weighted product. Requires min(h, w) > (window_size - 1) * 16."""
    squeeze = img1.ndim == 3
    if squeeze:
        img1, img2 = img1[None], img2[None]
    if min(img1.shape[1:3]) <= (window_size - 1) * 16:
        raise ValueError(
            f"image {img1.shape[1:3]} too small for {len(weights)}-level "
            f"ms-ssim with window {window_size}"
        )
    kernel = jnp.asarray(_gaussian_kernel_np(window_size, sigma))
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2

    mcs = []
    for level in range(len(weights)):
        ssim_pc, cs_pc = _ssim_cs_per_channel(img1, img2, kernel, c1, c2)
        if level < len(weights) - 1:
            mcs.append(jax.nn.relu(cs_pc))
            img1 = _avg_pool2_pad(img1)
            img2 = _avg_pool2_pad(img2)
    stack = jnp.stack(mcs + [jax.nn.relu(ssim_pc)], axis=0)  # (levels, n, c)
    w = jnp.asarray(weights, stack.dtype)[:, None, None]
    val = jnp.prod(stack**w, axis=0).mean(axis=-1)  # (n,)
    if size_average:
        val = val.mean()
    return val
