"""Analytic FLOP accounting for the Styl3R forward / train step.

MFU convention: counts matmul/conv multiply-adds as 2 FLOPs each (dots and
convs only — the terms that can run on the MXU); elementwise work, norms,
softmax and resizes-as-gathers are excluded except the bilinear-resize
matmuls, which DO hit the MXU in this codebase (dpt.resize_bilinear_ac).
XLA's own HLO cost analysis differs in two offsetting ways (validated by
tests/test_misc.py against `jax.jit(...).lower(...).cost_analysis()`): it
ADDS elementwise/norm/softmax FLOPs but EXCLUDES padded-border taps in convs
(this module counts the full k^2 window per output, the standard MFU
convention — and what the MXU actually computes when a padded conv lowers to
an implicit GEMM). Dense-only stacks agree within ~5%; conv-heavy heads show
analytic ~5-10% above XLA.

The rasterizer terms are order-of-magnitude estimates (its cost is HBM-bound,
not FLOP-bound; see ops/rasterizer/render.py) — they exist so the reported
MFU is not silently missing a stage, and are < 3% of the total.

Used by bench.py / scripts/profile_stages.py to report achieved TFLOP/s and
% of the chip's bf16 peak (VERDICT r3 #6).
"""

from __future__ import annotations

from typing import Dict, Tuple

# Peak dense bf16 TFLOP/s per chip by JAX device_kind (public figures).
TPU_BF16_PEAK_TFLOPS = {
    "TPU v2": 46.0,
    "TPU v3": 123.0,
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v5": 459.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,
    "TPU v6e": 918.0,
    "TPU7x": 2307.0,
}
DEFAULT_PEAK_TFLOPS = 197.0  # v5e — the dev-environment chip class (16G HBM)


def device_peak_tflops(device=None) -> float:
    """Best-effort bf16 peak for `device` (default: jax.devices()[0])."""
    try:
        if device is None:
            import jax

            device = jax.devices()[0]
        kind = getattr(device, "device_kind", "") or ""
        for name, peak in TPU_BF16_PEAK_TFLOPS.items():
            if kind.lower().startswith(name.lower()):
                return peak
    except Exception:
        pass
    return DEFAULT_PEAK_TFLOPS


def dense(n: int, d_in: int, d_out: int) -> int:
    return 2 * n * d_in * d_out


def conv2d(h: int, w: int, cin: int, cout: int, k: int, stride: int = 1) -> int:
    return 2 * (h // stride) * (w // stride) * cin * cout * k * k


def resize_ac(h_in: int, w_in: int, h_out: int, w_out: int, c: int) -> int:
    """dpt.resize_bilinear_ac = two einsum matmuls."""
    return 2 * h_out * h_in * w_in * c + 2 * w_out * w_in * h_out * c


def attention(nq: int, nk: int, d: int) -> int:
    """q@k^T + attn@v (all heads combined; head split doesn't change FLOPs)."""
    return 2 * nq * nk * d + 2 * nq * nk * d


def block(n: int, d: int, mlp_ratio: int = 4) -> int:
    """vit.Block: qkv + attention + proj + mlp (models/vit.py:104-121)."""
    return (
        dense(n, d, 3 * d)
        + attention(n, n, d)
        + dense(n, d, d)
        + dense(n, d, mlp_ratio * d)
        + dense(n, mlp_ratio * d, d)
    )


def decoder_block(nq: int, nk: int, d: int, mlp_ratio: int = 4) -> int:
    """vit.DecoderBlock: self-attn + cross-attn(memory nk) + mlp."""
    self_attn = dense(nq, d, 3 * d) + attention(nq, nq, d) + dense(nq, d, d)
    cross = (
        dense(nq, d, d)          # projq
        + 2 * dense(nk, d, d)    # projk + projv
        + attention(nq, nk, d)
        + dense(nq, d, d)        # proj
    )
    return self_attn + cross + dense(nq, d, mlp_ratio * d) + dense(nq, mlp_ratio * d, d)


def patch_embed(h: int, w: int, dim: int, patch: int = 16) -> int:
    """Conv k=p, s=p over (h, w, 3): one MAC per input pixel per out channel."""
    return 2 * h * w * 3 * dim


def vit_encoder(h: int, w: int, dim: int, depth: int, patch: int = 16,
                extra_tokens: int = 0) -> int:
    """CrocoVitEncoder on ONE image (+ optional intrinsics token)."""
    n = (h // patch) * (w // patch) + extra_tokens
    return patch_embed(h, w, dim, patch) + depth * block(n, dim)


def dpt_trunk(h: int, w: int, hook_dims: Tuple[int, int, int, int] = (1024, 768, 768, 768),
              layer_dims: Tuple[int, int, int, int] = (96, 192, 384, 768),
              feature_dim: int = 256, patch: int = 16) -> int:
    """models/dpt.py DPTTrunk on ONE image's token pyramid."""
    nh, nw = h // patch, w // patch
    a = nh * nw
    f = feature_dim
    ld = layer_dims
    total = 0
    # Reassembly projections + expands.
    total += dense(a, hook_dims[0], ld[0]) + dense(a, ld[0], ld[0] * 16)
    total += dense(a, hook_dims[1], ld[1]) + dense(a, ld[1], ld[1] * 4)
    total += dense(a, hook_dims[2], ld[2])
    total += dense(a, hook_dims[3], ld[3]) + conv2d(nh, nw, ld[3], ld[3], 3, stride=2)
    # layer_rn 3x3 convs at strides [4, 8, 16, 32].
    total += conv2d(4 * nh, 4 * nw, ld[0], f, 3)
    total += conv2d(2 * nh, 2 * nw, ld[1], f, 3)
    total += conv2d(nh, nw, ld[2], f, 3)
    total += conv2d(nh // 2, nw // 2, ld[3], f, 3)
    # refinenet4: 1 RCU (2 convs) at nh/2, upsample, 1x1 at nh.
    total += 2 * conv2d(nh // 2, nw // 2, f, f, 3)
    total += resize_ac(nh // 2, nw // 2, nh, nw, f) + conv2d(nh, nw, f, f, 1)
    # refinenet3/2/1: 2 RCUs (4 convs) at r, upsample, 1x1 at 2r.
    for r_h, r_w in ((nh, nw), (2 * nh, 2 * nw), (4 * nh, 4 * nw)):
        total += 4 * conv2d(r_h, r_w, f, f, 3)
        total += resize_ac(r_h, r_w, 2 * r_h, 2 * r_w, f)
        total += conv2d(2 * r_h, 2 * r_w, f, f, 1)
    return total


def dpt_pts3d_head(h: int, w: int, hook_dims=(1024, 768, 768, 768),
                   feature_dim: int = 256, last_dim: int = 128,
                   with_conf: bool = False) -> int:
    f = feature_dim
    out_ch = 4 if with_conf else 3
    return (
        dpt_trunk(h, w, hook_dims, feature_dim=f)
        + conv2d(h // 2, w // 2, f, f // 2, 3)
        + resize_ac(h // 2, w // 2, h, w, f // 2)
        + conv2d(h, w, f // 2, last_dim, 3)
        + conv2d(h, w, last_dim, out_ch, 1)
    )


def _gs_tower(h: int, w: int, feature_dim: int, out_channels: int) -> int:
    return conv2d(h, w, feature_dim, feature_dim, 3) + conv2d(
        h, w, feature_dim, out_channels, 1
    )


def dpt_gs_head(h: int, w: int, out_channels: int, hook_dims=(1024, 768, 768, 768),
                feature_dim: int = 256) -> int:
    f = feature_dim
    return (
        dpt_trunk(h, w, hook_dims, feature_dim=f)
        + conv2d(h, w, 3, f, 7)  # input_merger
        + resize_ac(h // 2, w // 2, h, w, f)
        + _gs_tower(h, w, f, out_channels)
    )


def dpt_gs_sh_head(h: int, w: int, out_channels: int, hook_dims=(1024, 768, 768, 768),
                   feature_dim: int = 256) -> int:
    f = feature_dim
    return (
        dpt_trunk(h, w, hook_dims, feature_dim=f)
        + resize_ac(h // 2, w // 2, h, w, f)
        + _gs_tower(h, w, f, out_channels)
    )


# Rasterizer estimates (HBM-bound; these keep the MFU denominator honest).
PROJ_FLOPS_PER_GAUSSIAN = 300       # EWA projection + conic + culling math
COMPOSITE_FLOPS_PER_PAIR_PIXEL = 30  # power eval + alpha blend per pixel


def render_flops(n_views: int, g_per_view: int, pair_slots: int,
                 tile_pixels: int = 256) -> int:
    return (
        n_views * g_per_view * PROJ_FLOPS_PER_GAUSSIAN
        + pair_slots * tile_pixels * COMPOSITE_FLOPS_PER_PAIR_PIXEL
    )


def styl3r_forward_flops(
    b: int = 1,
    v: int = 2,
    h: int = 256,
    w: int = 256,
    style_hw: int = 256,
    n_targets: int = 1,
    *,
    enc_depth: int = 24,
    dec_depth: int = 12,
    enc_dim: int = 1024,
    dec_dim: int = 768,
    sh_degree: int = 0,
    pair_cap_per_gaussian: int = 4,
    patch: int = 16,
) -> Dict[str, float]:
    """Analytic FLOPs of Styl3rModel.forward (predict_gaussians + render),
    broken down by stage. Mirrors models/encoder.py Styl3rEncoder.__call__."""
    a = (h // patch) * (w // patch)
    l = a + 1  # + intrinsics token
    d_sh_ = (sh_degree + 1) ** 2
    hook_dims = (enc_dim, dec_dim, dec_dim, dec_dim)

    content_enc = b * v * vit_encoder(h, w, enc_dim, enc_depth, patch, extra_tokens=1)
    backbone_dec = (
        dense(b * v * l, enc_dim, dec_dim)
        + dec_depth * b * v * decoder_block(l, (v - 1) * l, dec_dim)
    )
    ls = (style_hw // patch) ** 2
    stylizer = (
        b * vit_encoder(style_hw, style_hw, enc_dim, enc_depth, patch)
        + dense(b * (v * l + ls), enc_dim, dec_dim)
        + dec_depth * b * decoder_block(v * l, ls, dec_dim)
    )
    structure_channels = 1 + 7  # opacity + scales(3) + rotations(4)
    heads = b * v * (
        dpt_pts3d_head(h, w, hook_dims)
        + dpt_gs_head(h, w, structure_channels, hook_dims)
        + dpt_gs_sh_head(h, w, 3 * d_sh_, hook_dims)
    )
    g = v * h * w
    render = b * render_flops(
        n_targets, g, pair_cap_per_gaussian * n_targets * g
    )
    total = content_enc + backbone_dec + stylizer + heads + render
    return {
        "content_encoder": float(content_enc),
        "backbone_decoder": float(backbone_dec),
        "token_stylizer": float(stylizer),
        "dpt_heads": float(heads),
        "render_estimate": float(render),
        "total": float(total),
    }


def mfu(total_flops: float, seconds: float, peak_tflops: float = None) -> Dict[str, float]:
    """Achieved TFLOP/s and fraction-of-peak for a measured wall time."""
    if peak_tflops is None:
        peak_tflops = device_peak_tflops()
    achieved = total_flops / max(seconds, 1e-12) / 1e12
    return {
        "tflops": round(achieved, 3),
        "peak_tflops": peak_tflops,
        "mfu": round(achieved / peak_tflops, 4),
    }
