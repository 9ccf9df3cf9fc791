"""Differentiable tile-based Gaussian splatting renderer (pure JAX).

TPU-native replacement for the reference's `diff-gaussian-rasterization-w-pose`
CUDA extension (`src/model/decoder/cuda_splatting.py`). Same algorithm family
as the CUDA tile rasterizer, reformulated for static shapes + XLA:

  1. project gaussians (EWA, see project.py) — vectorized XLA;
  2. bin: each gaussian emits up to `max_tiles_per_gaussian` (tile, depth)
     pairs covering its 3-sigma screen bbox, exactly culled by the
     ellipse-tile intersection test; one global lexicographic sort by
     (tile, depth) replaces the CUDA radix sort; per-tile ranges come from
     searchsorted;
  3. composite: per 16x16 tile, scan depth-ordered gaussians in chunks and
     alpha-composite front-to-back with a running transmittance carry.

Multi-view fusion: `render_many` renders ALL views of a batch with ONE sort
and ONE kernel launch by offsetting each view's tile ids into a shared id
space (a batched lax.sort under vmap costs more than the whole unbatched
render on TPU). `render` is the single-view special case.

Differentiable end-to-end via autodiff (gather -> scatter-add in the backward),
including w.r.t. camera pose deltas, which enter through `make_raster_camera`.

Static truncation knobs (the CUDA kernel is unbounded; we trade tails for
static shapes — both default high enough to be exact on the bundled scenes):
  * max_tiles_per_gaussian: bbox tiles beyond this are dropped row-major;
  * max_per_tile: gaussians beyond this per tile are dropped back-to-front
    (they are occluded by construction when transmittance has saturated).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from .camera import RasterCamera
from .project import eval_sh, project_gaussians

TILE = 16


class RenderOutput(NamedTuple):
    color: Array  # (..., h, w, 3)
    depth: Array  # (..., h, w) alpha-weighted expected depth
    alpha: Array  # (..., h, w) accumulated opacity
    # pair_cap telemetry (None when produced by code predating it): the
    # number of LIVE (tile, depth) pairs the fused sort produced, and the
    # slot count actually kept for compositing. The pair_cap truncation is
    # lossless iff live_pairs <= pair_slots — consumers (bench.py, the eval
    # harness) check this at runtime instead of trusting the static cap.
    live_pairs: Optional[Array] = None  # i32 scalar (or (n,) per-view copy)
    pair_slots: Optional[Array] = None  # i32 scalar (or (n,) per-view copy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def composite_pallas_diff(
    attrs, starts, counts, background, gy, gx, max_per_tile, interpret, n_views
):
    """Differentiable Pallas compositing: forward + backward both run as TPU
    kernels (pallas_kernel.py / pallas_backward.py)."""
    from .pallas_kernel import composite_tiles_pallas

    color, depth, alpha, _, _ = composite_tiles_pallas(
        attrs, starts, counts, background, (gy, gx),
        max_per_tile=max_per_tile, interpret=interpret, n_views=n_views,
    )
    return color, depth, alpha


def _composite_pallas_fwd(
    attrs, starts, counts, background, gy, gx, max_per_tile, interpret, n_views
):
    from .pallas_kernel import composite_tiles_pallas

    color, depth, alpha, n_done, t_final = composite_tiles_pallas(
        attrs, starts, counts, background, (gy, gx),
        max_per_tile=max_per_tile, interpret=interpret, n_views=n_views,
    )
    residuals = (attrs, starts, counts, background, n_done, t_final)
    return (color, depth, alpha), residuals


def _composite_pallas_bwd(
    gy, gx, max_per_tile, interpret, n_views, residuals, cotangents
):
    from .pallas_backward import backward_tiles_pallas, gather_window_grads

    attrs, starts, counts, background, n_done, t_final = residuals
    dcolor, ddepth, dalpha = cotangents
    bg2d = jnp.atleast_2d(background)  # (n_views, 3)
    n_tiles = gy * gx
    bg_per_tile = jnp.repeat(bg2d, n_tiles, axis=0)  # (n_views*n_tiles, 3)
    # Fold the T_N * bg color term's alpha-derivative into the dalpha channel:
    # d/d(alpha_i) [T_N * bg] = -T_N * bg / (1 - alpha_i).
    da_eff = dalpha - jnp.einsum("tpc,tc->tp", dcolor, bg_per_tile)
    window_grads = backward_tiles_pallas(
        attrs, starts, counts, n_done, dcolor, ddepth, da_eff, t_final,
        (gy, gx), max_per_tile=max_per_tile, interpret=interpret,
        n_views=n_views,
    )
    grad_attrs = gather_window_grads(window_grads, starts, counts, attrs.shape[1])
    grad_bg_per_tile = jnp.einsum("tpc,tp->tc", dcolor, t_final)
    grad_bg = grad_bg_per_tile.reshape(bg2d.shape[0], n_tiles, 3).sum(axis=1)
    grad_bg = grad_bg.reshape(background.shape)
    return grad_attrs, None, None, grad_bg


composite_pallas_diff.defvjp(_composite_pallas_fwd, _composite_pallas_bwd)


def _build_pairs(
    mean_x: Array,
    mean_y: Array,
    radii: Array,
    depths: Array,
    mask: Array,
    grid: Tuple[int, int],
    max_tiles_per_gaussian: int,
    opacities: Array = None,
    con_a: Array = None,
    con_b: Array = None,
    con_c: Array = None,
) -> Tuple[Array, Array, Array]:
    """Emit (tile_id, depth, gaussian_idx) pairs for every tile each gaussian
    touches. Invalid slots get tile_id = n_tiles (sorts to the end).

    With conic components, pairs whose gaussian cannot reach alpha >= 1/255
    anywhere in the tile are culled exactly (the compositor would zero them
    anyway): the minimum of the conic quadratic over the tile's pixel-center
    rectangle has a closed form (0 inside; else the min over the 4 edges, each
    a clamped 1-D quadratic). This is the ellipse-tile intersection test the
    CUDA rasterizer's 3-sigma getRect bbox only approximates.

    All broadcasting is slot-major (m, g) — gaussians ride the 128-lane axis;
    (g, m=8) orientation would pad 8 -> 128 lanes (16x) on every op in the
    culling chain whenever an intermediate materializes."""
    gy, gx = grid
    n_tiles = gy * gx
    g = mean_x.shape[0]
    m = max_tiles_per_gaussian

    x, y = mean_x, mean_y
    r = radii
    tx0 = jnp.clip(jnp.floor((x - r) / TILE), 0, gx - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((x + r) / TILE), 0, gx - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((y - r) / TILE), 0, gy - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((y + r) / TILE), 0, gy - 1).astype(jnp.int32)
    rw = tx1 - tx0 + 1
    rh = ty1 - ty0 + 1
    area = rw * rh

    if opacities is not None:
        # A gaussian with opacity < 1/255 can never pass the compositing
        # alpha threshold (alpha = op * exp(power<=0)); cull it from binning.
        # Exactly correctness-neutral; big win on trained models where many
        # gaussians are near-transparent.
        mask = mask & (opacities >= (1.0 / 255.0))

    offs = jnp.arange(m, dtype=jnp.int32)[:, None]  # (m, 1)
    oy = offs // rw[None, :]  # (m, g)
    ox = offs % rw[None, :]
    tile_x = tx0[None, :] + ox
    tile_y = ty0[None, :] + oy
    tile_id = tile_y * gx + tile_x
    valid = (offs < area[None, :]) & mask[None, :] & (r[None, :] > 0)

    if con_a is not None and opacities is not None:
        # Exact ellipse-tile test: min over the tile's pixel-center rect
        # [t*16, t*16+15]^2 of q(d) = 0.5*ca*dx^2 + cb*dx*dy + 0.5*cc*dy^2
        # (power = -q in the compositor). Keep iff op*exp(-min q) >= 1/255.
        ca = jnp.maximum(con_a, 1e-12)[None, :]
        cb = con_b[None, :]
        cc = jnp.maximum(con_c, 1e-12)[None, :]
        dx0 = tile_x.astype(x.dtype) * TILE - x[None, :]
        dx1 = dx0 + (TILE - 1)
        dy0 = tile_y.astype(y.dtype) * TILE - y[None, :]
        dy1 = dy0 + (TILE - 1)

        def q(dx, dy):
            return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

        def edge_x(d):  # fixed dx = d, minimize over dy in [dy0, dy1]
            return q(d, jnp.clip(-cb * d / cc, dy0, dy1))

        def edge_y(d):  # fixed dy = d, minimize over dx in [dx0, dx1]
            return q(jnp.clip(-cb * d / ca, dx0, dx1), d)

        min_q = jnp.minimum(
            jnp.minimum(edge_x(dx0), edge_x(dx1)),
            jnp.minimum(edge_y(dy0), edge_y(dy1)),
        )
        inside = (dx0 <= 0) & (dx1 >= 0) & (dy0 <= 0) & (dy1 >= 0)
        min_q = jnp.where(inside, 0.0, min_q)
        reachable = min_q <= jnp.log(255.0 * jnp.maximum(opacities[None, :], 1e-12))
        valid = valid & reachable

    tile_id = jnp.where(valid, tile_id, n_tiles)

    pair_tiles = tile_id.reshape(m * g)
    pair_depths = jnp.broadcast_to(depths[None, :], (m, g)).reshape(-1)
    pair_gidx = jnp.broadcast_to(
        jnp.arange(g, dtype=jnp.int32)[None, :], (m, g)
    ).reshape(-1)
    return pair_tiles, pair_depths, pair_gidx


MIN_DEPTH_KEY_BITS = 14  # >= 6 exponent-range + 8 mantissa bits of depth


def _sort_pairs(pair_tiles: Array, pair_depths: Array, pair_gidx: Array, n_tiles: int):
    """One global sort by a single packed (tile, depth) u32 key: tile id in
    the high bits, the top bits of the positive-f32 depth (monotone as
    unsigned) below. A 1-key u32 sort is ~2x cheaper than the 2-key
    lexicographic comparator on TPU; the only approximation is depth ties
    below the kept-bits quantum — pairs that are visually order-free.
    (CUDA reference packs {tile, depth} into one 64-bit radix key the same
    way.)

    The depth budget shrinks as tile bits grow with fused views/scenes
    (n_tiles here is the GLOBAL fused count). When fewer than
    MIN_DEPTH_KEY_BITS would remain (huge fused renders), fall back to a
    2-key (tile, full f32 depth) sort — exact ordering at ~2x sort cost —
    instead of silently composing in quantized-depth order.
    Returns (sorted_tiles, sorted_gidx, starts, ends)."""
    tile_bits = max(int(n_tiles + 1).bit_length(), 1)
    depth_bits = jax.lax.bitcast_convert_type(
        pair_depths.astype(jnp.float32), jnp.uint32
    )
    if 32 - tile_bits >= MIN_DEPTH_KEY_BITS:
        depth_shift = jnp.uint32(32 - tile_bits)
        key = (pair_tiles.astype(jnp.uint32) << depth_shift) | (
            depth_bits >> jnp.uint32(tile_bits)
        )
        sorted_key, sorted_gidx = jax.lax.sort((key, pair_gidx), num_keys=1)
        sorted_tiles = (sorted_key >> depth_shift).astype(jnp.int32)
    else:
        sorted_t, _, sorted_gidx = jax.lax.sort(
            (pair_tiles.astype(jnp.uint32), depth_bits, pair_gidx), num_keys=2
        )
        sorted_tiles = sorted_t.astype(jnp.int32)
    tile_ids = jnp.arange(n_tiles, dtype=sorted_tiles.dtype)
    starts = jnp.searchsorted(sorted_tiles, tile_ids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tiles, tile_ids, side="right").astype(jnp.int32)
    return sorted_tiles, sorted_gidx, starts, ends


def _composite_jnp_view(
    sorted_gidx, starts, counts, mean_x, mean_y, con_a, con_b, con_c,
    colors, opacities, depths,
    grid, background, max_per_tile, chunk, dtype,
):
    """Pure-XLA per-tile front-to-back compositing for ONE view. The attr
    arrays may be flattened multi-view tables — `sorted_gidx` carries global
    indices; only `starts`/`counts` are per-view slices."""
    gy, gx = grid
    n_pairs = sorted_gidx.shape[0]
    n_chunks = max_per_tile // chunk
    tile_ids = jnp.arange(gy * gx, dtype=jnp.int32)

    py, px = jnp.meshgrid(jnp.arange(TILE), jnp.arange(TILE), indexing="ij")
    local_px = px.reshape(-1).astype(dtype)  # (p,)
    local_py = py.reshape(-1).astype(dtype)

    def composite_tile(tile_idx: Array, start: Array, count: Array):
        ty = tile_idx // gx
        tx = tile_idx % gx
        pix_x = local_px + (tx * TILE).astype(dtype)  # (p,)
        pix_y = local_py + (ty * TILE).astype(dtype)

        def step(carry, k):
            rgb, dep, trans = carry
            offs = k * chunk + jnp.arange(chunk, dtype=jnp.int32)
            in_range = offs < count
            idx = sorted_gidx[jnp.clip(start + offs, 0, n_pairs - 1)]
            mx = mean_x[idx]  # (chunk,)
            my = mean_y[idx]
            ca = con_a[idx]
            cb = con_b[idx]
            cc = con_c[idx]
            col = colors[idx]  # (chunk, 3)
            op = opacities[idx]  # (chunk,)
            dpt = depths[idx]  # (chunk,)

            dx = pix_x[None, :] - mx[:, None]  # (chunk, p)
            dy = pix_y[None, :] - my[:, None]
            power = (
                -0.5 * (ca[:, None] * dx * dx + cc[:, None] * dy * dy)
                - cb[:, None] * dx * dy
            )
            # Clamp before exp: positive powers are masked below, but exp of a
            # large positive value is inf and poisons gradients through the
            # where (0 * inf = NaN in the backward pass).
            alpha = jnp.minimum(op[:, None] * jnp.exp(jnp.minimum(power, 0.0)), 0.99)
            alpha = jnp.where(power > 0, 0.0, alpha)
            alpha = jnp.where(alpha < (1.0 / 255.0), 0.0, alpha)
            alpha = jnp.where(in_range[:, None], alpha, 0.0)

            one_minus = 1.0 - alpha  # (chunk, p)
            cp = jnp.cumprod(one_minus, axis=0)
            excl = jnp.concatenate([jnp.ones_like(cp[:1]), cp[:-1]], axis=0)
            weight = alpha * excl * trans[None, :]  # (chunk, p)

            rgb = rgb + jnp.einsum("cp,cd->pd", weight, col)
            dep = dep + jnp.sum(weight * dpt[:, None], axis=0)
            trans = trans * cp[-1]
            return (rgb, dep, trans), None

        p = TILE * TILE
        init = (
            jnp.zeros((p, 3), dtype),
            jnp.zeros((p,), dtype),
            jnp.ones((p,), dtype),
        )
        (rgb, dep, trans), _ = jax.lax.scan(
            step, init, jnp.arange(n_chunks, dtype=jnp.int32)
        )
        rgb = rgb + trans[:, None] * background[None, :]
        return rgb, dep, 1.0 - trans

    return jax.vmap(composite_tile)(tile_ids, starts, counts)


def render_many(
    cameras: RasterCamera,  # leading dim (n,) on every field
    means: Array,  # (n, g, 3) per-view (pre-gathered/scaled) gaussians
    covariances: Optional[Array],  # (n, g, 3, 3); may be None with scales/rotations
    harmonics: Array,  # (n, g, 3, d_sh)
    opacities: Array,  # (n, g)
    image_shape: Tuple[int, int],
    backgrounds: Optional[Array] = None,  # (n, 3)
    *,
    scales: Optional[Array] = None,  # (n, g, 3) covariance factors — see
    rotations: Optional[Array] = None,  # (n, g, 4) project_gaussians docstring
    max_tiles_per_gaussian: int = 32,
    max_per_tile: int = 4096,
    chunk: int = 64,
    impl: str = "jnp",
    pair_cap: Optional[int] = None,
) -> RenderOutput:
    """Render n views in one fused pipeline (one sort, one kernel launch).

    Args:
      cameras: RasterCamera with (n,)-leading fields (stack make_raster_camera
        outputs, or build from (n, 4, 4) extrinsics directly).
      means/covariances/harmonics/opacities: per-view gaussian sets. Views
      that share a scene's gaussians should pass gathered copies (XLA keeps
      the gather fused); per-view scaling (scale_invariant) composes here.
      image_shape: (h, w), each divisible by 16.
      backgrounds: per-view (n, 3), defaults to black.
      impl: 'jnp' (pure XLA, autodiff-native) | 'pallas' (TPU kernels via
        custom_vjp) | 'pallas_interpret' (kernel in interpreter mode, CPU).
      pair_cap: optional static cap on TOTAL sorted pair slots kept for the
        attribute gather + compositing. The sort emits n*g*max_tiles_per_
        gaussian slots but (with the exact ellipse-tile culling) typically
        <10% are live, and the post-sort attribute gather's HBM cost scales
        with SLOTS, not live pairs (each gathered 64B row pads to a 512B lane
        tile). Invalid pairs sort to the end, so truncating at pair_cap is
        LOSSLESS while live pairs <= pair_cap; on overflow the highest GLOBAL
        tile ids lose pairs first — in this fused multi-view sort that means
        the LAST view's tiles blank before earlier views' bottom rows, so
        size generously (the default None keeps every slot, the CUDA
        reference's exact-allocation semantics).
    Returns RenderOutput with (n, h, w, ...) leaves.
    """
    h, w = image_shape
    if h % TILE or w % TILE:
        raise ValueError(f"image shape {image_shape} must be divisible by {TILE}")
    n = means.shape[0]
    g = means.shape[1]
    gy, gx = h // TILE, w // TILE
    n_tiles = gy * gx
    n_total = n * n_tiles
    dtype = means.dtype
    if backgrounds is None:
        backgrounds = jnp.zeros((n, 3), dtype)

    if scales is not None and rotations is not None:
        proj = jax.vmap(
            lambda cam, m, s, r: project_gaussians(cam, m, scales=s, rotations=r)
        )(cameras, means, scales, rotations)
    else:
        proj = jax.vmap(project_gaussians)(cameras, means, covariances)
    dirs = means - cameras.cam_pos[:, None, :]
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
    colors = eval_sh(harmonics, dirs)  # (n, g, 3)

    pair_tiles, pair_depths, pair_gidx = jax.vmap(
        functools.partial(
            _build_pairs,
            grid=(gy, gx),
            max_tiles_per_gaussian=max_tiles_per_gaussian,
        )
    )(proj.mean_x, proj.mean_y, proj.radii, proj.depths, proj.mask,
      opacities=opacities, con_a=proj.con_a, con_b=proj.con_b, con_c=proj.con_c)
    # Offset each view's tiles into the shared id space (invalid slots keep
    # the global sentinel n_total); gaussian indices go global the same way.
    view_ids = jnp.arange(n, dtype=jnp.int32)[:, None]
    pair_tiles = jnp.where(
        pair_tiles >= n_tiles, n_total, pair_tiles + view_ids * n_tiles
    ).reshape(-1)
    pair_gidx = (pair_gidx + view_ids * g).reshape(-1)
    pair_depths = pair_depths.reshape(-1)

    _, sorted_gidx, starts, ends = _sort_pairs(
        pair_tiles, pair_depths, pair_gidx, n_total
    )
    # Live pairs = pairs with a real tile id (< n_total). Invalid slots carry
    # the sentinel n_total and sort to the end, so the last tile's `ends`
    # IS the live count — free overflow telemetry for the pair_cap contract.
    live_pairs = ends[-1]
    full_gidx = sorted_gidx  # pre-cap: every gaussian appears exactly m times
    if pair_cap is not None and pair_cap < sorted_gidx.shape[0]:
        # Round UP to the kernel's 128-wide DMA window so a cap sized to the
        # live pair count never drops live pairs (the lossless contract).
        cap = -(-pair_cap // 128) * 128
        sorted_gidx = sorted_gidx[:cap]
        starts = jnp.minimum(starts, cap)
        ends = jnp.minimum(ends, cap)
    pair_slots = jnp.int32(sorted_gidx.shape[0])
    counts = jnp.minimum(ends - starts, max_per_tile)

    flat = lambda x: x.reshape((n * g,) + x.shape[2:])

    if impl in ("pallas", "pallas_interpret"):
        from .pallas_kernel import pack_attrs

        attrs = pack_attrs(
            flat(proj.mean_x), flat(proj.mean_y),
            flat(proj.con_a), flat(proj.con_b), flat(proj.con_c),
            flat(opacities).astype(jnp.float32), flat(colors),
            flat(proj.depths), sorted_gidx,
            full_gidx=full_gidx,
        )
        rgb, dep, alpha = composite_pallas_diff(
            attrs, starts, counts, backgrounds, gy, gx,
            max_per_tile, impl == "pallas_interpret", n,
        )
    else:
        per_view = []
        for i in range(n):
            sl = slice(i * n_tiles, (i + 1) * n_tiles)
            per_view.append(
                _composite_jnp_view(
                    sorted_gidx, starts[sl], counts[sl],
                    flat(proj.mean_x), flat(proj.mean_y),
                    flat(proj.con_a), flat(proj.con_b), flat(proj.con_c),
                    flat(colors), flat(opacities), flat(proj.depths),
                    (gy, gx), backgrounds[i], max_per_tile, chunk, dtype,
                )
            )
        rgb = jnp.concatenate([p[0] for p in per_view], axis=0)
        dep = jnp.concatenate([p[1] for p in per_view], axis=0)
        alpha = jnp.concatenate([p[2] for p in per_view], axis=0)

    # (n*n_tiles, p, ...) -> (n, h, w, ...)
    color = (
        rgb.reshape(n, gy, gx, TILE, TILE, 3)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, h, w, 3)
    )
    depth = (
        dep.reshape(n, gy, gx, TILE, TILE).transpose(0, 1, 3, 2, 4).reshape(n, h, w)
    )
    alpha_img = (
        alpha.reshape(n, gy, gx, TILE, TILE).transpose(0, 1, 3, 2, 4).reshape(n, h, w)
    )
    return RenderOutput(
        color=color, depth=depth, alpha=alpha_img,
        live_pairs=live_pairs, pair_slots=pair_slots,
    )


def render(
    camera: RasterCamera,
    means: Array,
    covariances: Optional[Array],
    harmonics: Array,
    opacities: Array,
    image_shape: Tuple[int, int],
    background: Optional[Array] = None,
    *,
    scales: Optional[Array] = None,
    rotations: Optional[Array] = None,
    max_tiles_per_gaussian: int = 32,
    max_per_tile: int = 4096,
    chunk: int = 64,
    impl: str = "jnp",
    pair_cap: Optional[int] = None,
) -> RenderOutput:
    """Render one view of one scene (the n=1 case of render_many).

    Args:
      camera: unbatched RasterCamera (from make_raster_camera).
      means/covariances/harmonics/opacities: (g, 3), (g, 3, 3), (g, 3, d_sh), (g,).
      image_shape: (h, w), each divisible by 16.
      background: (3,) color, defaults to black.
      scales/rotations: optional (g, 3)/(g, 4) covariance factors replacing
        `covariances` (pass covariances=None) — see project_gaussians.
      impl: 'jnp' | 'pallas' | 'pallas_interpret'.
    """
    if background is None:
        background = jnp.zeros((3,), means.dtype)
    out = render_many(
        jax.tree.map(lambda x: jnp.asarray(x)[None], camera),
        means[None], None if covariances is None else covariances[None],
        harmonics[None], opacities[None],
        image_shape, background[None],
        scales=None if scales is None else scales[None],
        rotations=None if rotations is None else rotations[None],
        max_tiles_per_gaussian=max_tiles_per_gaussian,
        max_per_tile=max_per_tile, chunk=chunk, impl=impl, pair_cap=pair_cap,
    )
    return RenderOutput(
        color=out.color[0], depth=out.depth[0], alpha=out.alpha[0],
        live_pairs=out.live_pairs, pair_slots=out.pair_slots,
    )
