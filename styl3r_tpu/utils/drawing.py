"""Vector-graphics drawing onto images, jittable.

TPU-native equivalent of `src/visualization/drawing/{lines,points,cameras,
coordinate_conversion,rendering,types}.py`. The reference renders binary
masks and anti-aliases with iterative MSAA subdivision passes
(rendering.py:76-152) — data-dependent refinement that maps poorly onto
static-shape XLA. Here every primitive computes an analytic signed-distance
coverage (1-pixel smooth edge), which is a single vectorized pass, fully
differentiable, and visually equivalent-or-better; primitives composite in
order ("top wins", the reference's argmax-by-index rule, lines.py:72-79) via
a painter's lax.scan.

Images are channel-last (h, w, 3) float in [0, 1] per repo convention (the
reference uses (3, h, w)).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def _sanitize_vector(x, dim: int, n: Optional[int] = None) -> Array:
    """-> (n, dim) f32 (types.py sanitize_vector)."""
    x = jnp.atleast_2d(jnp.asarray(x, jnp.float32))
    if x.shape[-1] != dim:
        raise ValueError(f"expected last dim {dim}, got {x.shape}")
    x = x.reshape(-1, dim)
    if n is not None:
        x = jnp.broadcast_to(x, (n, dim))
    return x


def _sanitize_scalar(x, n: Optional[int] = None) -> Array:
    x = jnp.asarray(x, jnp.float32).reshape(-1)
    if n is not None:
        x = jnp.broadcast_to(x, (n,))
    return x


def generate_conversions(
    shape: Tuple[int, int],
    x_range: Optional[Sequence[float]] = None,
    y_range: Optional[Sequence[float]] = None,
):
    """(world->pixel, pixel->world) affine conversions
    (coordinate_conversion.py:19-44). Defaults map world == pixel space."""
    h, w = shape
    x_range = (0.0, float(w)) if x_range is None else x_range
    y_range = (0.0, float(h)) if y_range is None else y_range
    minima = jnp.asarray([x_range[0], y_range[0]], jnp.float32)
    maxima = jnp.asarray([x_range[1], y_range[1]], jnp.float32)
    wh = jnp.asarray([w, h], jnp.float32)

    def world_to_pixel(xy: Array) -> Array:
        return (xy - minima) / (maxima - minima) * wh

    def pixel_to_world(xy: Array) -> Array:
        return xy / wh * (maxima - minima) + minima

    return world_to_pixel, pixel_to_world


def _pixel_grid(h: int, w: int) -> Array:
    """(h, w, 2) pixel-center xy sample positions (rendering.py:18-26)."""
    x = jnp.arange(w, dtype=jnp.float32) + 0.5
    y = jnp.arange(h, dtype=jnp.float32) + 0.5
    xg, yg = jnp.meshgrid(x, y, indexing="xy")
    return jnp.stack([xg, yg], axis=-1)


def _coverage(sdf: Array) -> Array:
    """Analytic anti-aliased coverage from a pixel-space signed distance."""
    return jnp.clip(0.5 - sdf, 0.0, 1.0)


def _paint(image: Array, coverages: Array, colors: Array) -> Array:
    """Composite (n, h, w) coverages with (n, 3) colors over (h, w, 3), in
    order — later primitives cover earlier ones (the reference's
    argmax-by-index top color, lines.py:72-79)."""

    def step(img, cov_col):
        cov, col = cov_col
        return img + cov[..., None] * (col - img), None

    out, _ = jax.lax.scan(step, image, (coverages, colors))
    return out


def draw_lines(
    image: Array,
    start,
    end,
    color=(1.0, 1.0, 1.0),
    width=1.0,
    cap: str = "round",
    x_range: Optional[Sequence[float]] = None,
    y_range: Optional[Sequence[float]] = None,
) -> Array:
    """Draw anti-aliased line segments over `image` (lines.py:13-83).

    start/end: (n, 2) world xy (pixel space when no ranges given); width in
    pixels; cap in {'butt', 'round', 'square'}."""
    h, w, _ = image.shape
    start = _sanitize_vector(start, 2)
    end = _sanitize_vector(end, 2)
    n = int(np.broadcast_shapes(
        start.shape[:1], end.shape[:1],
        np.shape(_sanitize_scalar(width)),
        np.shape(_sanitize_vector(color, 3))[:1],
    )[0])
    start = jnp.broadcast_to(start, (n, 2))
    end = jnp.broadcast_to(end, (n, 2))
    color = _sanitize_vector(color, 3, n)
    width = _sanitize_scalar(width, n)

    world_to_pixel, _ = generate_conversions((h, w), x_range, y_range)
    start = world_to_pixel(start)
    end = world_to_pixel(end)

    xy = _pixel_grid(h, w)  # (h, w, 2)

    def one_line(s, e, wd):
        delta = e - s
        norm = jnp.maximum(jnp.linalg.norm(delta), 1e-8)
        u = delta / norm
        rel = xy - s  # (h, w, 2)
        t = rel @ u  # parallel coordinate
        if cap == "butt":
            t_clamped = jnp.clip(t, 0.0, norm)
        elif cap == "square":
            t_clamped = jnp.clip(t, -0.5 * wd, norm + 0.5 * wd)
        else:  # round: distance-to-segment = capsule SDF
            t_clamped = jnp.clip(t, 0.0, norm)
        closest = s + t_clamped[..., None] * u
        d = jnp.linalg.norm(xy - closest, axis=-1)
        if cap in ("butt", "square"):
            # Hard ends: outside the parallel span the pixel is empty even if
            # the perpendicular distance is small (reference's
            # parallel_inside_line, lines.py:55-57).
            perp = jnp.linalg.norm(rel - t[..., None] * u, axis=-1)
            lo = 0.0 if cap == "butt" else -0.5 * wd
            hi = norm if cap == "butt" else norm + 0.5 * wd
            inside_par = _coverage(jnp.maximum(lo - t, t - hi))
            return _coverage(perp - 0.5 * wd) * inside_par
        return _coverage(d - 0.5 * wd)

    coverages = jax.vmap(one_line)(start, end, width)  # (n, h, w)
    return _paint(image, coverages, color)


def draw_points(
    image: Array,
    points,
    color=(1.0, 1.0, 1.0),
    radius=1.0,
    inner_radius=0.0,
    x_range: Optional[Sequence[float]] = None,
    y_range: Optional[Sequence[float]] = None,
) -> Array:
    """Draw anti-aliased discs/annuli over `image` (points.py:13-59)."""
    h, w, _ = image.shape
    points = _sanitize_vector(points, 2)
    n = points.shape[0]
    color = _sanitize_vector(color, 3, n)
    radius = _sanitize_scalar(radius, n)
    inner_radius = _sanitize_scalar(inner_radius, n)

    world_to_pixel, _ = generate_conversions((h, w), x_range, y_range)
    points = world_to_pixel(points)
    xy = _pixel_grid(h, w)

    def one_point(p, r, ri):
        d = jnp.linalg.norm(xy - p, axis=-1)
        # Annulus SDF: inside iff ri <= d <= r (reference's inner_radius mask).
        return _coverage(jnp.maximum(d - r, ri - d))

    coverages = jax.vmap(one_point)(points, radius, inner_radius)
    return _paint(image, coverages, color)


# ---------------------------------------------------------------------------
# Camera wireframe projections (drawing/cameras.py)
# ---------------------------------------------------------------------------


def unproject_frustum_corners(
    extrinsics: Array, intrinsics: Array, depth
) -> Array:
    """(b, 4, 3) world-space frustum corners at z-depth `depth`
    (cameras.py:169-195); corner order circles the image rectangle."""
    xy = jnp.asarray(
        [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]], jnp.float32
    )
    k_inv = jnp.linalg.inv(intrinsics)  # (b, 3, 3)
    dirs = jnp.einsum(
        "bij,pj->bpi", k_inv, jnp.concatenate([xy, jnp.ones((4, 1))], axis=-1)
    )
    dirs = dirs / dirs[..., -1:]  # z-depth, not euclidean
    dirs = jnp.einsum("bij,bpj->bpi", extrinsics[:, :3, :3], dirs)
    origins = extrinsics[:, None, :3, 3]
    depth = jnp.asarray(depth, jnp.float32).reshape(-1, 1, 1)
    return origins + depth * dirs


def compute_aabb(
    extrinsics: Array, intrinsics: Array, near=None, far=None
) -> Tuple[Array, Array]:
    """Axis-aligned bounds of camera positions + frustum corners
    (cameras.py:123-150)."""
    points = [extrinsics[:, :3, 3]]
    for plane in (near, far):
        if plane is not None:
            points.append(
                unproject_frustum_corners(extrinsics, intrinsics, plane).reshape(-1, 3)
            )
    points = jnp.concatenate(points, axis=0)
    return points.min(axis=0), points.max(axis=0)


def compute_equal_aabb_with_margin(
    minima: Array, maxima: Array, margin: float = 0.1
) -> Tuple[Array, Array]:
    """Cubic AABB with relative margin (cameras.py:153-166)."""
    midpoint = (maxima + minima) * 0.5
    span = (maxima - minima).max() * (1 + margin)
    return midpoint - 0.5 * span, midpoint + 0.5 * span


def draw_cameras(
    resolution: int,
    extrinsics,
    intrinsics,
    color,
    near=None,
    far=None,
    margin: float = 0.1,
    frustum_scale: float = 0.05,
    label: bool = True,
) -> np.ndarray:
    """Three axis-aligned orthographic projections of the camera frustums
    (cameras.py:14-121): returns (3, res, res, 3) float images (XY/YZ/ZX
    labeled when PIL is available). Host-side convenience over the jittable
    primitives above."""
    from .viz import annotate

    extrinsics = jnp.asarray(extrinsics, jnp.float32)
    intrinsics = jnp.asarray(intrinsics, jnp.float32)
    b = extrinsics.shape[0]
    color = _sanitize_vector(color, 3, b)

    minima, maxima = compute_aabb(extrinsics, intrinsics, near, far)
    scene_min, scene_max = compute_equal_aabb_with_margin(minima, maxima, margin)
    span = (scene_max - scene_min).max()

    corner_depth = span * frustum_scale
    frustum = unproject_frustum_corners(
        extrinsics, intrinsics, jnp.full((b,), corner_depth)
    )
    near_c = (
        unproject_frustum_corners(extrinsics, intrinsics, jnp.broadcast_to(jnp.asarray(near, jnp.float32), (b,)))
        if near is not None else None
    )
    far_c = (
        unproject_frustum_corners(extrinsics, intrinsics, jnp.broadcast_to(jnp.asarray(far, jnp.float32), (b,)))
        if far is not None else None
    )

    projections = []
    for axis in range(3):
        ax_x, ax_y = (axis + 1) % 3, (axis + 2) % 3
        proj = lambda p: jnp.stack([p[..., ax_x], p[..., ax_y]], axis=-1)
        x_range = (float(scene_min[ax_x]), float(scene_max[ax_x]))
        y_range = (float(scene_min[ax_y]), float(scene_max[ax_y]))
        image = jnp.zeros((resolution, resolution, 3), jnp.float32)

        def ring(img, corners, col):
            c = proj(corners).reshape(-1, 2)
            c_prev = proj(jnp.roll(corners, 1, axis=1)).reshape(-1, 2)
            return draw_lines(
                img, c_prev, c, color=col, width=2,
                x_range=x_range, y_range=y_range,
            )

        for plane_c in (near_c, far_c):
            if plane_c is not None:
                image = ring(image, plane_c, (0.25, 0.25, 0.25))
        if near_c is not None and far_c is not None:
            image = draw_lines(
                image, proj(near_c).reshape(-1, 2), proj(far_c).reshape(-1, 2),
                color=(0.25, 0.25, 0.25), width=2,
                x_range=x_range, y_range=y_range,
            )

        # Frustum edges: origin -> each corner, then the corner ring.
        origins2 = jnp.repeat(proj(extrinsics[:, :3, 3]), 4, axis=0)
        corners2 = proj(frustum).reshape(-1, 2)
        prev2 = proj(jnp.roll(frustum, 1, axis=1)).reshape(-1, 2)
        col4 = jnp.repeat(color, 4, axis=0)
        image = draw_lines(
            image, jnp.concatenate([origins2, prev2]),
            jnp.concatenate([corners2, corners2]),
            color=jnp.concatenate([col4, col4]), width=2,
            x_range=x_range, y_range=y_range,
        )

        img_np = np.asarray(image)
        if label:
            img_np = annotate(img_np, f"{'XYZ'[ax_x]}{'XYZ'[ax_y]} Projection")
        projections.append(img_np)

    return np.stack(projections)
