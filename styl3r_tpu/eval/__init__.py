from .metrics import compute_psnr, compute_ssim, MetricTracker
from .benchmarker import Benchmarker

__all__ = ["compute_psnr", "compute_ssim", "MetricTracker", "Benchmarker"]
