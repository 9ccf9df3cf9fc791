"""Pallas TPU backward kernel for the tile compositing stage.

Implements the reverse-order backward pass of front-to-back alpha compositing
(the same recurrences as the CUDA rasterizer's renderBackwardCUDA): walk each
tile's pair range back-to-front, reconstruct per-gaussian transmittance by
dividing the running transmittance by the window products, accumulate suffix
color/depth sums, and emit per-PAIR gradients for mean2d/conic/opacity/
color/depth in the same attribute-major layout the forward consumes.

The outputs are per-(tile, window) gradient blocks (tiles own disjoint pair
ranges, but 128-aligned windows at range boundaries overlap between
neighboring tiles — masked lanes contribute zeros and XLA scatter-adds the
window blocks back into (16, n_pairs) outside the kernel).

Gradient semantics match the forward's masking exactly: pairs skipped by the
alpha thresholds, the 0.99 clamp, or the early exit get zero gradient.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernel import (
    ATTR_H,
    A_CA,
    A_CB,
    A_CC,
    A_D,
    A_G,
    A_B,
    A_MX,
    A_MY,
    A_OP,
    A_R,
    P,
    TILE,
    WINDOW,
)


def _backward_kernel(
    starts_ref,  # SMEM (n_tiles,)
    counts_ref,  # SMEM (n_tiles,)
    ndone_ref,  # SMEM (n_tiles,) windows processed by the forward
    attrs_ref,  # ANY (16, n_pairs)
    dcol_ref,  # VMEM block (1, P, 3)  dL/dcolor
    ddep_ref,  # VMEM block (1, P, 1)  dL/ddepth
    dalp_ref,  # VMEM block (1, P, 1)  dL/dalpha
    tfin_ref,  # VMEM block (1, P, 1)  final transmittance from forward
    grad_ref,  # VMEM block (1, max_windows, 16, WINDOW)
    scratch,  # VMEM (2, 16, WINDOW)
    sems,  # DMA (2,)
    *,
    grid_x: int,
    max_windows: int,
    n_pairs: int,
    tiles_per_view: int,
):
    t = pl.program_id(0)
    tv = jax.lax.rem(t, tiles_per_view)  # within-view tile (fused multi-view)
    start = starts_ref[t]
    count = counts_ref[t]
    end = start + count
    base = (start // WINDOW) * WINDOW
    n_done = ndone_ref[t]

    grad_ref[...] = jnp.zeros(grad_ref.shape, jnp.float32)

    ty = tv // grid_x
    tx = jax.lax.rem(tv, grid_x)
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, WINDOW), 0)
    px = (tx * TILE + pix % TILE).astype(jnp.float32)
    py = (ty * TILE + pix // TILE).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (P, WINDOW), 1)

    # Cotangents and forward state as (P, 1) columns.
    dc_r = dcol_ref[0, :, 0][:, None]
    dc_g = dcol_ref[0, :, 1][:, None]
    dc_b = dcol_ref[0, :, 2][:, None]
    dd = ddep_ref[0, :, :]
    da = dalp_ref[0, :, :]
    t_final = tfin_ref[0, :, :]

    def start_dma(slot, w):
        offset = jnp.minimum(base + w * WINDOW, n_pairs - WINDOW)
        offset = pl.multiple_of(offset, WINDOW)
        return pltpu.make_async_copy(
            attrs_ref.at[:, pl.ds(offset, WINDOW)], scratch.at[slot], sems.at[slot]
        )

    @pl.when(n_done > 0)
    def _():
        start_dma(jax.lax.rem(n_done - 1, 2), n_done - 1).start()

    # Inclusive-scan matrix for the MXU (see pallas_kernel.py): one
    # (P, W) x (W, W) matmul replaces each 7-round lane-roll scan.
    row_i = jax.lax.broadcasted_iota(jnp.int32, (WINDOW, WINDOW), 0)
    col_j = jax.lax.broadcasted_iota(jnp.int32, (WINDOW, WINDOW), 1)
    scan_u = (row_i <= col_j).astype(jnp.float32)

    def body(state):
        w, t_cur, s_q = state
        slot = jax.lax.rem(w, 2)

        @pl.when(w > 0)
        def _():
            start_dma(jax.lax.rem(w - 1, 2), w - 1).start()

        start_dma(slot, w).wait()
        a = scratch[slot]

        dx = px - a[A_MX : A_MX + 1, :]
        dy = py - a[A_MY : A_MY + 1, :]
        ca = a[A_CA : A_CA + 1, :]
        cb = a[A_CB : A_CB + 1, :]
        cc = a[A_CC : A_CC + 1, :]
        op = a[A_OP : A_OP + 1, :]
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        g_exp = jnp.exp(jnp.minimum(power, 0.0))
        alpha_raw = op * g_exp
        alpha = jnp.minimum(alpha_raw, 0.99)
        live = (
            (power <= 0.0)
            & (alpha >= (1.0 / 255.0))
            & (alpha_raw < 0.99)
        )
        gidx = base + w * WINDOW + lane
        # NOTE: gather_window_grads (the scatter-add replacement) relies on
        # this kernel emitting EXACT zeros for lanes outside [start, end) and
        # for unwritten windows (grad_ref zero-init + this live mask).
        # Relaxing the masking silently drops gradient mass there instead of
        # failing loudly — keep the [start, end) clamp if you edit this.
        live = live & (gidx >= start) & (gidx < end)
        # The compositing alpha (the forward's value, incl. the 0.99 clamp path)
        alpha_fwd = jnp.where(
            (power <= 0.0)
            & (jnp.minimum(alpha_raw, 0.99) >= (1.0 / 255.0))
            & (gidx >= start)
            & (gidx < end),
            alpha,
            0.0,
        )
        alpha = jnp.where(live, alpha, 0.0)

        lm = jnp.log1p(-alpha_fwd)  # alpha_fwd <= 0.99 keeps this finite
        cum = jnp.dot(lm, scan_u, preferred_element_type=jnp.float32)
        prod_w = jnp.exp(cum[:, WINDOW - 1 :])
        t_ws = t_cur / jnp.maximum(prod_w, 1e-12)
        excl = jnp.exp(cum - lm)
        t_i = t_ws * excl  # transmittance before each gaussian
        weight = alpha_fwd * t_i

        c_r = a[A_R : A_R + 1, :]
        c_g = a[A_G : A_G + 1, :]
        c_b = a[A_B : A_B + 1, :]
        c_d = a[A_D : A_D + 1, :]

        # The per-pixel cotangents are constant over gaussians, so they
        # commute into the suffix sums: the four per-channel suffix scans of
        # the CUDA formulation collapse to ONE scan of q_j = <dL/dout, c_j>
        # (q folds r, g, b, depth) — 2 MXU scan matmuls per window (this one
        # + the transmittance scan above) instead of 5.
        q = dc_r * c_r + dc_g * c_g + dc_b * c_b + dd * c_d  # (P, W)
        wq = weight * q
        prefix_q = jnp.dot(wq, scan_u, preferred_element_type=jnp.float32)
        tot_q = prefix_q[:, WINDOW - 1 :]
        s_q_i = (tot_q - prefix_q) + s_q  # suffix over this + later windows

        one_minus = jnp.maximum(1.0 - alpha_fwd, 0.01)
        dalpha = (
            t_i * q - s_q_i / one_minus + da * (t_final / one_minus)
        )
        dalpha = jnp.where(live, dalpha, 0.0)

        d_op = jnp.sum(g_exp * dalpha, axis=0, keepdims=True)  # (1, W)
        dpower = alpha * dalpha
        d_ca = jnp.sum(-0.5 * dx * dx * dpower, axis=0, keepdims=True)
        d_cb = jnp.sum(-dx * dy * dpower, axis=0, keepdims=True)
        d_cc = jnp.sum(-0.5 * dy * dy * dpower, axis=0, keepdims=True)
        # d power / d mean = +(conic . delta) since d(delta)/d(mean) = -1.
        d_mx = jnp.sum((ca * dx + cb * dy) * dpower, axis=0, keepdims=True)
        d_my = jnp.sum((cb * dx + cc * dy) * dpower, axis=0, keepdims=True)
        d_r = jnp.sum(weight * dc_r, axis=0, keepdims=True)
        d_g = jnp.sum(weight * dc_g, axis=0, keepdims=True)
        d_b = jnp.sum(weight * dc_b, axis=0, keepdims=True)
        d_d = jnp.sum(weight * dd, axis=0, keepdims=True)

        grad_ref[0, w, A_MX, :] = d_mx[0]
        grad_ref[0, w, A_MY, :] = d_my[0]
        grad_ref[0, w, A_CA, :] = d_ca[0]
        grad_ref[0, w, A_CB, :] = d_cb[0]
        grad_ref[0, w, A_CC, :] = d_cc[0]
        grad_ref[0, w, A_OP, :] = d_op[0]
        grad_ref[0, w, A_R, :] = d_r[0]
        grad_ref[0, w, A_G, :] = d_g[0]
        grad_ref[0, w, A_B, :] = d_b[0]
        grad_ref[0, w, A_D, :] = d_d[0]

        return (w - 1, t_ws, s_q + tot_q)

    def cond(state):
        return state[0] >= 0

    # The T_N*bg color term's alpha-derivative is folded into the dalpha
    # channel by the caller (da_eff = dalpha - dcolor . bg); suffix sums start
    # at zero.
    init = (n_done - 1, t_final, jnp.zeros((P, 1), jnp.float32))
    jax.lax.while_loop(cond, body, init)


def backward_tiles_pallas(
    attrs: Array,
    starts: Array,
    counts: Array,
    n_done: Array,
    dcolor: Array,  # (n_tiles, P, 3)
    ddepth: Array,  # (n_tiles, P)
    dalpha: Array,  # (n_tiles, P)
    t_final: Array,  # (n_tiles, P)
    grid: Tuple[int, int],
    max_per_tile: int = 4096,
    interpret: bool = False,
    n_views: int = 1,
) -> Array:
    """Returns per-(tile, window) gradient blocks
    (n_tiles_total, max_windows, 16, WINDOW)."""
    gy, gx = grid
    n_tiles = n_views * gy * gx
    n_pairs = attrs.shape[1]
    max_windows = int(pl.cdiv(max_per_tile, WINDOW)) + 1

    kernel = functools.partial(
        _backward_kernel, grid_x=gx, max_windows=max_windows, n_pairs=n_pairs,
        tiles_per_view=gy * gx,
    )
    # Analytic cost for XLA's scheduler (see pallas_kernel.py): 2 scan
    # matmuls + ~4 transcendentals per (pixel, lane) per window, plus the
    # per-tile gradient block writes.
    est_windows = max(n_pairs // WINDOW, 1)
    cost_estimate = pl.CostEstimate(
        flops=est_windows * (2 * 2 * P * WINDOW * WINDOW),
        transcendentals=est_windows * 4 * P * WINDOW,
        bytes_accessed=attrs.size * 4
        + n_tiles * max_windows * ATTR_H * WINDOW * 4
        + n_tiles * P * 6 * 4,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # attrs
            pl.BlockSpec((1, P, 3), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 1), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 1), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 1), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, max_windows, ATTR_H, WINDOW),
            lambda t, *_: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ATTR_H, WINDOW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, max_windows, ATTR_H, WINDOW), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=cost_estimate,
    )(
        starts.astype(jnp.int32),
        counts.astype(jnp.int32),
        n_done.astype(jnp.int32),
        attrs,
        dcolor.astype(jnp.float32),
        ddepth.astype(jnp.float32)[..., None],
        dalpha.astype(jnp.float32)[..., None],
        t_final.astype(jnp.float32)[..., None],
    )


def scatter_window_grads(
    window_grads: Array,  # (n_tiles, max_windows, 16, WINDOW)
    starts: Array,  # (n_tiles,)
    n_pairs: int,
) -> Array:
    """Scatter-add per-(tile, window) gradient blocks into (16, n_pairs).

    Reference formulation, kept as the correctness oracle for
    gather_window_grads (which replaces it on the hot path): the scatter-add
    measured 24.9 ms at the 256^2 bench config because every tile scatters
    ALL max_windows windows and the ~15 dead windows per tile clamp to the
    SAME final offset — massive duplicate-index collisions that serialize
    the TPU scatter."""
    n_tiles, max_windows = window_grads.shape[:2]
    base = (starts // WINDOW) * WINDOW
    win_start = base[:, None] + jnp.arange(max_windows, dtype=starts.dtype)[None] * WINDOW
    win_start = jnp.minimum(win_start, n_pairs - WINDOW)
    cols = win_start[:, :, None] + jnp.arange(WINDOW, dtype=starts.dtype)[None, None]
    cols = cols.reshape(-1)  # (n_tiles * max_windows * WINDOW)
    # Row-major scatter-add (each scattered element is a contiguous 64-byte
    # attribute row; minor-dim scatters vectorize on TPU), then one transpose
    # back to the attribute-major layout — same trick as pack_attrs.
    vals = jnp.moveaxis(window_grads, 2, 3).reshape(-1, ATTR_H)
    out = jnp.zeros((n_pairs, ATTR_H), jnp.float32)
    return out.at[cols].add(vals).T


def gather_window_grads(
    window_grads: Array,  # (n_tiles, max_windows, 16, WINDOW)
    starts: Array,  # (n_tiles,) nondecreasing pair-range starts
    counts: Array,  # (n_tiles,) pair counts (post max_per_tile clamp)
    n_pairs: int,
) -> Array:
    """Gather formulation of the window-grad unpack: (16, n_pairs).

    Tiles own DISJOINT pair ranges [start, start+count), and the backward
    kernel live-masks every lane outside its tile's range to exactly zero —
    so each pair column receives a nonzero contribution from at most ONE
    (tile, window) slot, and the scatter-add of scatter_window_grads is
    equal to a single row gather at the owning slot. The owning tile per
    pair needs no searchsorted: `starts` is nondecreasing (searchsorted
    output) and so is `starts + counts` (counts >= 0, start_{t+1} >= end_t),
    so scattering tile metadata at the start positions and running cummax
    scans recovers (tile, start, end) for every pair in O(n_pairs) VPU work.
    One 64-byte-row gather then replaces the duplicate-collision scatter
    (24.9 ms -> sub-ms at the 256^2 bench config)."""
    n_tiles, max_windows = window_grads.shape[:2]
    starts = starts.astype(jnp.int32)
    ends = starts + counts.astype(jnp.int32)
    neg = jnp.full((n_pairs,), -1, jnp.int32)
    # mode='drop': trailing empty tiles carry start == n_pairs.
    tile = jax.lax.cummax(
        neg.at[starts].max(jnp.arange(n_tiles, dtype=jnp.int32), mode="drop")
    )
    # Duplicate starts (empty tiles): max keeps the largest end / latest tile,
    # which is the only one that can own pairs — empty tiles have end==start.
    start_of = jax.lax.cummax(neg.at[starts].max(starts, mode="drop"))
    end_of = jax.lax.cummax(neg.at[starts].max(ends, mode="drop"))
    p = jnp.arange(n_pairs, dtype=jnp.int32)
    w = p // WINDOW - start_of // WINDOW  # window base is 128-aligned
    valid = (tile >= 0) & (p < end_of) & (w >= 0) & (w < max_windows)
    flat = (
        jnp.maximum(tile, 0) * max_windows + jnp.clip(w, 0, max_windows - 1)
    ) * WINDOW + p % WINDOW
    # (n_tiles, max_windows, 16, WINDOW) -> (slots, 16): contiguous 64-byte
    # rows gather along the minor dim (the fast TPU gather orientation).
    vals = jnp.moveaxis(window_grads, 2, 3).reshape(-1, ATTR_H)
    out = jnp.where(valid[:, None], vals[flat], 0.0)
    return out.T
