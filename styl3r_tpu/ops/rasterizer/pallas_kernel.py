"""Pallas TPU kernel for the per-tile alpha-compositing stage.

The rasterizer pipeline keeps projection/binning/sorting in XLA (bandwidth-
trivial, fully vectorized) and hands the dense sequential stage — front-to-
back alpha compositing per 16x16 pixel tile — to this kernel.

Layout (driven by TPU DMA constraints: manual HBM->VMEM copies want windows of
exactly 128 lanes):
  * pair attributes are packed attribute-major as (16, n_pairs_pad) f32 rows
    [mean_x, mean_y, conic_a, conic_b, conic_c, opacity, r, g, b, depth, pad];
  * each grid step (one 16x16 tile) walks its sorted pair range in 128-wide
    lane windows aligned to 128 (window start rounded down; out-of-range lanes
    masked), double-buffering the (16, 128) attr DMAs;
  * compute block: pixels on sublanes (256) x gaussians on lanes (128);
    alpha evaluated for the whole block on the VPU; the within-window
    exclusive transmittance product runs in log space as one (P, W) x (W, W)
    triangular matmul on the MXU (a prefix-sum of log1p(-alpha)), and the
    four per-pixel reductions (r, g, b, depth) fold into a single
    (P, W) x (W, 4) MXU dot — the VPU only evaluates alphas and masks;
  * a while-loop exits early once every pixel's transmittance < 1e-4 (the
    CUDA kernel's per-pixel early-out, here per tile).

The backward pass is also a Pallas kernel (pallas_backward.py), wired through
jax.custom_vjp in render.py — fwd+bwd is ~2.5x the pure-XLA path on a v5e.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
P = TILE * TILE  # 256 pixels per tile
ATTR_H = 16  # padded attribute rows
WINDOW = 128  # gaussians per DMA window (= f32 lane tile)

# attrs row layout
A_MX, A_MY, A_CA, A_CB, A_CC, A_OP, A_R, A_G, A_B, A_D = range(10)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def take_rows_grouped(table: Array, idx_full: Array, cap: int, exact_dup: int):
    """`jnp.take(table, idx_full[:cap], axis=0)` with a sort-based backward.

    The autodiff VJP of a duplicate-index gather is a duplicate-index
    scatter-add, which serializes on TPU (measured 15-20 ms for the
    pack_attrs backward at the 256^2 bench config). Here every table row id
    appears EXACTLY `exact_dup` times in `idx_full` (a gaussian emits exactly
    max_tiles_per_gaussian pair slots, live or culled), so sorting
    (idx_full, iota) groups row G's slot positions at exactly
    [G*exact_dup, (G+1)*exact_dup) — no run boundaries to search for — and
    the backward is one cheap u32 sort (~0.6 ms at 1M slots) plus exact_dup
    row gathers. Positions >= cap (slots dropped by the pair_cap truncation)
    gather a zero fill. TPU probe at bench scale: sort 0.6 ms + 8 gathers
    6.6 ms, vs 15.3 ms for the duplicate-id scatter-add and 39 ms(!) for a
    searchsorted-based run lookup. `cap`/`exact_dup` are static."""
    del exact_dup
    return jnp.take(table, jax.lax.slice(idx_full, (0,), (cap,)), axis=0)


def _take_rows_grouped_fwd(table, idx_full, cap, exact_dup):
    out = jnp.take(table, jax.lax.slice(idx_full, (0,), (cap,)), axis=0)
    return out, idx_full


def _take_rows_grouped_bwd(cap, exact_dup, idx_full, d_out):
    n_slots = idx_full.shape[0]  # == n_rows * exact_dup
    assert n_slots % exact_dup == 0, (
        "take_rows_grouped: idx_full length must be n_rows * exact_dup "
        "(every row id exactly exact_dup times), got "
        f"{n_slots} slots with exact_dup={exact_dup}"
    )
    n_rows = n_slots // exact_dup
    _, perm = jax.lax.sort(
        (idx_full.astype(jnp.int32), jnp.arange(n_slots, dtype=jnp.int32)),
        num_keys=1,
    )
    grouped = perm.reshape(n_rows, exact_dup)
    acc = jnp.zeros((n_rows, d_out.shape[1]), d_out.dtype)
    for k in range(exact_dup):
        # Slots past the pair_cap truncation have no cotangent: zero fill.
        acc = acc + jnp.take(
            d_out, grouped[:, k], axis=0, mode="fill", fill_value=0
        )
    return acc, None


take_rows_grouped.defvjp(_take_rows_grouped_fwd, _take_rows_grouped_bwd)


def pack_attrs(
    mean_x: Array, mean_y: Array, con_a: Array, con_b: Array, con_c: Array,
    opacities: Array, colors: Array, depths: Array, sorted_gidx: Array,
    full_gidx: Optional[Array] = None,
) -> Array:
    """Gather per-pair attributes in sorted order, attribute-major:
    (16, n_pairs padded to a multiple of 128).

    Takes flat (g,) component vectors (the SoA ProjectedGaussians layout) so
    no lane-padded (g, 2)/(g, 3) intermediates ever materialize upstream.

    Perf note: the gather runs row-major — (g, 16) table indexed by pair, so
    each gathered element is a contiguous 64-byte row (TPU gathers vectorize
    along the minor dim) — then one well-tiled transpose to the attribute-
    major kernel layout. The naive lane-axis gather rows[:, sorted_gidx] was
    ~10x slower (10 x n_pairs scalar-ish gathers).

    `full_gidx` is the FULL pre-pair_cap sorted gid list (sorted_gidx is its
    prefix), in which every gaussian appears exactly max_tiles_per_gaussian
    times; passing it routes the gather through take_rows_grouped, whose
    sort-based backward replaces the duplicate-id scatter-add. None keeps
    plain autodiff (the scatter)."""
    table = jnp.stack(
        [
            mean_x, mean_y,
            con_a, con_b, con_c,
            opacities,
            colors[:, 0], colors[:, 1], colors[:, 2],
            depths,
        ],
        axis=1,
    )  # (g, 10)
    table = jnp.pad(table, ((0, 0), (0, ATTR_H - table.shape[1])))  # (g, 16)
    if full_gidx is not None:
        if full_gidx.shape[0] % table.shape[0]:
            raise ValueError(
                "pack_attrs: full_gidx length must be an exact multiple of "
                "the gaussian count (every id exactly max_tiles_per_gaussian "
                f"times); got {full_gidx.shape[0]} slots for "
                f"{table.shape[0]} gaussians — grouped backward would "
                "misalign silently."
            )
        exact_dup = full_gidx.shape[0] // table.shape[0]
        gathered = take_rows_grouped(
            table, full_gidx, sorted_gidx.shape[0], exact_dup
        )  # (n_pairs, 16)
    else:
        gathered = jnp.take(table, sorted_gidx, axis=0)  # (n_pairs, 16)
    n = gathered.shape[0]
    pad_n = (-n) % WINDOW
    gathered = jnp.pad(gathered, ((0, pad_n), (0, 0)))
    return gathered.T  # (16, n_pairs_pad)


def _composite_kernel(
    starts_ref,  # SMEM (n_tiles_total,) int32  (scalar prefetch)
    counts_ref,  # SMEM (n_tiles_total,) int32  (scalar prefetch)
    attrs_ref,  # ANY/HBM (16, n_pairs_pad) f32
    bg_ref,  # SMEM (n_views, 3) f32
    out_ref,  # VMEM block (1, P, 8) f32: cols r,g,b,depth,alpha,pad
    scratch,  # VMEM (2, 16, WINDOW)
    sems,  # DMA semaphores (2,)
    *,
    grid_x: int,
    max_windows: int,
    n_pairs: int,
    tiles_per_view: int,
):
    # Fused multi-view grid: tile t belongs to view t // tiles_per_view;
    # pixel coordinates come from the within-view tile index (all views of a
    # batch share ONE sort + ONE kernel launch — batched lax.sort under vmap
    # is ~2x the whole render's cost on TPU).
    t = pl.program_id(0)
    view = t // tiles_per_view
    tv = jax.lax.rem(t, tiles_per_view)
    start = starts_ref[t]
    count = counts_ref[t]
    end = start + count
    base = (start // WINDOW) * WINDOW
    n_windows = jnp.minimum(pl.cdiv(end - base, WINDOW), max_windows)

    ty = tv // grid_x
    tx = jax.lax.rem(tv, grid_x)
    # Pixel centers: pixels on sublanes -> (P, 1) columns.
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, WINDOW), 0)
    px = (tx * TILE + pix % TILE).astype(jnp.float32)
    py = (ty * TILE + pix // TILE).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (P, WINDOW), 1)

    def start_dma(slot, w):
        offset = jnp.minimum(base + w * WINDOW, n_pairs - WINDOW)
        offset = pl.multiple_of(offset, WINDOW)
        return pltpu.make_async_copy(
            attrs_ref.at[:, pl.ds(offset, WINDOW)],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(n_windows > 0)
    def _():
        start_dma(0, 0).start()

    # Inclusive-scan matrix: cum[p, j] = sum_{i <= j} x[p, i] = (x @ U)[p, j]
    # with U[i, j] = 1 iff i <= j. One (P, W) x (W, W) matmul on the MXU
    # replaces the 7-round lane-roll product scan (run in log space).
    row_i = jax.lax.broadcasted_iota(jnp.int32, (WINDOW, WINDOW), 0)
    col_j = jax.lax.broadcasted_iota(jnp.int32, (WINDOW, WINDOW), 1)
    scan_u = (row_i <= col_j).astype(jnp.float32)

    def body(state):
        w, acc, trans = state
        slot = jax.lax.rem(w, 2)

        @pl.when(w + 1 < n_windows)
        def _():
            start_dma(jax.lax.rem(w + 1, 2), w + 1).start()

        start_dma(slot, w).wait()
        a = scratch[slot]  # (16, WINDOW); row broadcasts over pixel sublanes

        dx = px - a[A_MX : A_MX + 1, :]
        dy = py - a[A_MY : A_MY + 1, :]
        power = (
            -0.5 * (a[A_CA : A_CA + 1, :] * dx * dx + a[A_CC : A_CC + 1, :] * dy * dy)
            - a[A_CB : A_CB + 1, :] * dx * dy
        )
        alpha = jnp.minimum(
            a[A_OP : A_OP + 1, :] * jnp.exp(jnp.minimum(power, 0.0)), 0.99
        )
        alpha = jnp.where(power > 0.0, 0.0, alpha)
        alpha = jnp.where(alpha < (1.0 / 255.0), 0.0, alpha)
        gidx = base + w * WINDOW + lane
        in_range = jnp.logical_and(gidx >= start, gidx < end)
        alpha = jnp.where(in_range, alpha, 0.0)

        # Transmittance: exclusive product of (1 - alpha) along lanes, as an
        # MXU prefix-sum of logs. alpha <= 0.99 keeps log1p finite (>= -4.7).
        lm = jnp.log1p(-alpha)
        cum = jnp.dot(lm, scan_u, preferred_element_type=jnp.float32)
        excl = jnp.exp(cum - lm)

        weight = alpha * excl * trans  # trans (P, 1) broadcasts over lanes
        # One (P, W) x (W, 4->8) MXU dot folds the four lane reductions
        # (r, g, b, depth); attr rows 6..10 are exactly [r, g, b, depth].
        acc = acc + jax.lax.dot_general(
            weight,
            a[A_R : A_R + 4, :],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P, 4)
        trans = trans * jnp.exp(cum[:, WINDOW - 1 :])
        return w + 1, acc, trans

    def cond(state):
        w, _, trans = state
        return jnp.logical_and(w < n_windows, jnp.max(trans) > 1e-4)

    init = (
        jnp.int32(0),
        jnp.zeros((P, 4), jnp.float32),
        jnp.ones((P, 1), jnp.float32),
    )
    w_done, acc, trans = jax.lax.while_loop(cond, body, init)

    # The early transmittance exit can leave the NEXT window's prefetch DMA
    # in flight: body(w) starts window w+1's copy before compositing window
    # w, so exiting at w_done < n_windows orphans the copy into slot
    # w_done % 2. A grid step must finish with its DMA semaphores at zero —
    # an unwaited semaphore desyncs the next tile's waits and faults the
    # whole TPU program (INTERNAL backend error). This only triggers on
    # dense clouds where alpha saturates mid-range (n_windows >= 2 + early
    # exit), e.g. training from scratch init — sparse scenes run every
    # window and exit clean, which is why inference benches never hit it.
    @pl.when(w_done < n_windows)
    def _():
        start_dma(jax.lax.rem(w_done, 2), w_done).wait()

    out_ref[0, :, 0] = acc[:, 0] + trans[:, 0] * bg_ref[view, 0]
    out_ref[0, :, 1] = acc[:, 1] + trans[:, 0] * bg_ref[view, 1]
    out_ref[0, :, 2] = acc[:, 2] + trans[:, 0] * bg_ref[view, 2]
    out_ref[0, :, 3] = acc[:, 3]
    out_ref[0, :, 4] = 1.0 - trans[:, 0]
    # Bookkeeping for the backward pass: windows actually composited (the
    # early exit must be replayed exactly) and the final transmittance.
    out_ref[0, :, 5] = jnp.full((P,), w_done, jnp.float32)
    out_ref[0, :, 6] = trans[:, 0]
    out_ref[0, :, 7] = jnp.zeros((P,), jnp.float32)


def composite_tiles_pallas(
    attrs: Array,
    starts: Array,
    counts: Array,
    background: Array,
    grid: Tuple[int, int],
    max_per_tile: int = 4096,
    interpret: bool = False,
    n_views: int = 1,
) -> Tuple[Array, Array, Array]:
    """Run the compositing kernel.

    Args:
      attrs: (16, n_pairs_pad) packed sorted attributes (pack_attrs).
      starts/counts: (n_views * n_tiles,) int32 per-tile pair ranges.
      background: (3,) f32, or (n_views, 3) for fused multi-view renders.
      grid: (gy, gx) per-view tile grid.
    Returns (color (n_tiles_total, P, 3), depth (.., P), alpha (.., P),
    n_windows_done (..,), t_final (.., P)) with n_tiles_total = n_views*gy*gx.
    """
    gy, gx = grid
    n_tiles = n_views * gy * gx
    n_pairs = attrs.shape[1]
    max_windows = int(pl.cdiv(max_per_tile, WINDOW)) + 1  # +1 for alignment slack
    background = jnp.atleast_2d(background.astype(jnp.float32))

    kernel = functools.partial(
        _composite_kernel,
        grid_x=gx,
        max_windows=max_windows,
        n_pairs=n_pairs,
        tiles_per_view=gy * gx,
    )
    # Tell XLA what the custom call costs (it has NO model for pallas calls,
    # which can distort scheduling/overlap around the kernel): every sorted
    # pair window is visited ~once across the grid, each window doing one
    # (P, W) x (W, W) scan matmul + one (P, W) x (W, 4) reduction + ~3
    # transcendentals per (pixel, lane).
    est_windows = max(n_pairs // WINDOW, 1)
    cost_estimate = pl.CostEstimate(
        flops=est_windows * (2 * P * WINDOW * WINDOW + 2 * P * WINDOW * 4),
        transcendentals=est_windows * 3 * P * WINDOW,
        bytes_accessed=attrs.size * 4 + n_tiles * P * 8 * 4,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # attrs stay in HBM
            pl.BlockSpec(memory_space=pltpu.SMEM),  # background
        ],
        out_specs=pl.BlockSpec(
            (1, P, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ATTR_H, WINDOW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, P, 8), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=cost_estimate,
    )(
        starts.astype(jnp.int32),
        counts.astype(jnp.int32),
        attrs,
        background.astype(jnp.float32),
    )
    color = out[:, :, 0:3]
    depth = out[:, :, 3]
    alpha = out[:, :, 4]
    n_done = out[:, 0, 5].astype(jnp.int32)
    t_final = out[:, :, 6]
    return color, depth, alpha, n_done, t_final
