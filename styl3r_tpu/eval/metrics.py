"""Image quality metrics + overlap-bucketed running means.

Equivalents of `src/evaluation/metrics.py:11-53` (PSNR/SSIM; LPIPS lives in
styl3r_tpu.losses.lpips) and the running-mean score tables per context-overlap
bucket (`model_wrapper_style.py:793-841`).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np
from jax import Array

from ..losses.ssim import ssim


def compute_psnr(ground_truth: Array, predicted: Array) -> Array:
    """Per-image PSNR over (..., h, w, c) in [0, 1]."""
    gt = jnp.clip(ground_truth, 0.0, 1.0)
    pred = jnp.clip(predicted, 0.0, 1.0)
    mse = jnp.mean((gt - pred) ** 2, axis=(-1, -2, -3))
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def compute_ssim(ground_truth: Array, predicted: Array) -> Array:
    """Per-image SSIM over (n, h, w, c) (or unbatched)."""
    return ssim(jnp.clip(ground_truth, 0, 1), jnp.clip(predicted, 0, 1))


def overlap_tag(overlap: float) -> str:
    """Bucket context overlap like the reference (misc/utils.py:38-48)."""
    if overlap < 0.3:
        return "small"
    if overlap <= 0.55:
        return "medium"
    return "large"


class MetricTracker:
    """Running means per (metric, bucket) + overall; prints a table."""

    def __init__(self):
        self.sums: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    def update(self, metrics: Dict[str, float], overlap: Optional[float] = None):
        buckets = ["all"]
        if overlap is not None:
            buckets.append(overlap_tag(overlap))
        for name, value in metrics.items():
            for b in buckets:
                key = f"{name}/{b}"
                self.sums[key] += float(value)
                self.counts[key] += 1

    def means(self) -> Dict[str, float]:
        return {k: self.sums[k] / self.counts[k] for k in self.sums}

    def table(self) -> str:
        means = self.means()
        names = sorted({k.split("/")[0] for k in means})
        buckets = ["all", "small", "medium", "large"]
        header = "metric    " + "".join(f"{b:>10}" for b in buckets)
        lines = [header]
        for n in names:
            row = f"{n:<10}"
            for b in buckets:
                v = means.get(f"{n}/{b}")
                row += f"{v:>10.4f}" if v is not None else f"{'-':>10}"
            lines.append(row)
        return "\n".join(lines)
