"""Epipolar line segments: project rays into other cameras' image planes.

Jittable port of `src/geometry/epipolar_lines.py` (the NoPoSplat epipolar
visualization/debugging toolkit): given world-space rays and a target camera,
compute the on-screen segment of each ray's projection (the epipolar line),
clipped to the image frame and to the optional near/far planes, plus helpers
to lift 2D points on those segments back to 3D and to depths.

TPU-first deviations: every boolean-masked in-place update of the reference
becomes a `jnp.where` select over static shapes (the reference's
`result[mask] = ...` case analysis over the 4 valid/invalid combinations
collapses to two nested selects), and torch's `default_collate` stack +
`gather` becomes `jnp.stack` + `take_along_axis`.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
from jax import Array

from .projection import (
    get_world_rays,
    homogenize_points,
    homogenize_vectors,
    intersect_rays,
    invert_se3,
    transform_rigid,
)


def _is_in_bounds(xy: Array, epsilon: float = 1e-6) -> Array:
    """Inside the normalized [0, 1]^2 image plane (epipolar_lines.py:19-26)."""
    return jnp.all(xy >= -epsilon, axis=-1) & jnp.all(xy <= 1 + epsilon, axis=-1)


def _is_in_front_of_camera(xyz: Array, epsilon: float = 1e-6) -> Array:
    return xyz[..., -1] > -epsilon


def _is_positive_t(t: Array, epsilon: float = 1e-6) -> Array:
    return t > -epsilon


class PointProjection(NamedTuple):
    t: Array  # ray parameter: xyz = origin + t * direction
    xy: Array  # image-space xy, normalized to [0, 1]
    valid: Array  # in front of the camera AND inside the frame AND t > 0


def project_camera_space(
    points: Array, intrinsics: Array, epsilon: float = 1.1920929e-07,
    infinity: float = 1e8,
) -> Array:
    """Perspective-divide + K (reference projection.py:47-56)."""
    points = points / (points[..., -1:] + epsilon)
    points = jnp.nan_to_num(points, posinf=infinity, neginf=-infinity)
    points = jnp.einsum("...ij,...j->...i", intrinsics, points)
    return points[..., :-1]


def _intersect_image_coordinate(
    intrinsics: Array,
    origins: Array,
    directions: Array,
    dim: int,
    coordinate_value: float,
) -> PointProjection:
    """Intersection of a camera-space ray's projection with the image-frame
    line {x,y} = coordinate_value (epipolar_lines.py:56-103). `dim` is 0 for
    x, 1 for y."""
    other_dim = 1 - dim
    fs = intrinsics[..., dim, dim]
    fo = intrinsics[..., other_dim, other_dim]
    cs = intrinsics[..., dim, 2]
    co = intrinsics[..., other_dim, 2]
    os_ = origins[..., dim]
    oo = origins[..., other_dim]
    ds = directions[..., dim]
    do = directions[..., other_dim]
    oz = origins[..., 2]
    dz = directions[..., 2]
    c = (coordinate_value - cs) / fs

    # Infinite t / coordinates are fine (handled by the validity mask).
    t = (c * oz - os_) / (ds - c * dz)
    coordinate_other = co + (
        fo * (oo * (c * dz - ds) + do * (os_ - c * oz))
    ) / (dz * os_ - ds * oz)
    coordinate_same = jnp.full_like(coordinate_other, coordinate_value)
    parts = [coordinate_same]
    parts.insert(other_dim, coordinate_other)
    xy = jnp.stack(parts, axis=-1)
    xyz = origins + t[..., None] * directions
    return PointProjection(
        t=t,
        xy=xy,
        valid=_is_in_bounds(xy) & _is_in_front_of_camera(xyz) & _is_positive_t(t),
    )


def _compare_projections(intersections, reduction: str) -> PointProjection:
    """Pick the min/max-t VALID intersection per ray (epipolar_lines.py:106-130)."""
    t = jnp.stack([i.t for i in intersections], axis=0)
    xy = jnp.stack([i.xy for i in intersections], axis=0)
    valid = jnp.stack([i.valid for i in intersections], axis=0)

    lowest_priority = {"min": jnp.inf, "max": -jnp.inf}[reduction]
    t = jnp.where(valid, t, lowest_priority)
    # NaN t values (degenerate rays) must also lose the argmin/argmax.
    t = jnp.nan_to_num(t, nan=lowest_priority)
    selector = jnp.argmin(t, axis=0) if reduction == "min" else jnp.argmax(t, axis=0)
    reduced = jnp.take_along_axis(t, selector[None], axis=0)[0]
    xy_sel = jnp.take_along_axis(xy, selector[None, ..., None], axis=0)[0]
    valid_sel = jnp.take_along_axis(valid, selector[None], axis=0)[0]
    return PointProjection(t=reduced, xy=xy_sel, valid=valid_sel)


def _compute_point_projection(
    xyz: Array, t: Array, intrinsics: Array
) -> PointProjection:
    xy = project_camera_space(xyz, intrinsics)
    return PointProjection(
        t=t,
        xy=xy,
        valid=_is_in_bounds(xy) & _is_in_front_of_camera(xyz) & _is_positive_t(t),
    )


class RaySegmentProjection(NamedTuple):
    t_min: Array  # ray parameter at the segment start
    t_max: Array  # ray parameter at the segment end
    xy_min: Array  # normalized image xy at the start
    xy_max: Array  # normalized image xy at the end
    # Whether the segment overlaps the image; if False the values above are
    # meaningless (exactly the reference's contract).
    overlaps_image: Array


def project_rays(
    origins: Array,
    directions: Array,
    extrinsics: Array,
    intrinsics: Array,
    near: Optional[Array] = None,
    far: Optional[Array] = None,
    epsilon: float = 1e-6,
) -> RaySegmentProjection:
    """On-screen segment of each world ray's projection into the camera
    (epipolar_lines.py:158-250). Broadcasts over any leading batch shape."""
    world_to_cam = invert_se3(extrinsics)
    origins_c = transform_rigid(homogenize_points(origins), world_to_cam)[..., :3]
    directions_c = transform_rigid(
        homogenize_vectors(directions), world_to_cam
    )[..., :3]

    frame_intersections = tuple(
        _intersect_image_coordinate(intrinsics, origins_c, directions_c, dim, val)
        for dim in (0, 1)
        for val in (0.0, 1.0)
    )
    fmin = _compare_projections(frame_intersections, "min")
    fmax = _compare_projections(frame_intersections, "max")

    if near is None:
        # Projection at zero depth; rays starting at the camera use their
        # direction instead, and origins that merely lie on the zero-depth
        # plane are invalid (epipolar_lines.py:188-208).
        mask_depth_zero = origins_c[..., -1] < epsilon
        mask_at_camera = jnp.linalg.norm(origins_c, axis=-1) < epsilon
        origins_for_projection = jnp.where(
            mask_at_camera[..., None], directions_c, origins_c
        )
        pz = _compute_point_projection(
            origins_for_projection, jnp.zeros_like(fmin.t), intrinsics
        )
        pz = pz._replace(valid=pz.valid & ~(mask_depth_zero & ~mask_at_camera))
    else:
        near = jnp.broadcast_to(near, fmin.t.shape)
        pz = _compute_point_projection(
            origins_c + near[..., None] * directions_c, near, intrinsics
        )

    if far is None:
        # Projecting the direction vector == the point at infinite depth.
        pinf = _compute_point_projection(
            directions_c, jnp.full_like(fmax.t, jnp.inf), intrinsics
        )
    else:
        far = jnp.broadcast_to(far, fmax.t.shape)
        pinf = _compute_point_projection(
            origins_c + far[..., None] * directions_c, far, intrinsics
        )

    # The reference's 4-way valid/invalid case loop is two independent
    # selects: a valid endpoint projection wins over the frame intersection.
    def pick(valid, a: PointProjection, b: PointProjection):
        return PointProjection(
            t=jnp.where(valid, a.t, b.t),
            xy=jnp.where(valid[..., None], a.xy, b.xy),
            valid=jnp.where(valid, a.valid, b.valid),
        )

    lo = pick(pz.valid, pz, fmin)
    hi = pick(pinf.valid, pinf, fmax)
    return RaySegmentProjection(
        t_min=lo.t,
        t_max=hi.t,
        xy_min=lo.xy,
        xy_max=hi.xy,
        overlaps_image=lo.valid & hi.valid,
    )


def lift_to_3d(
    origins: Array,
    directions: Array,
    xy: Array,
    extrinsics: Array,
    intrinsics: Array,
) -> Array:
    """3D positions of 2D points on the epipolar lines defined by
    origins/directions (epipolar_lines.py:262-275); extrinsics/intrinsics
    belong to the image the 2D points lie on."""
    xy_origins, xy_directions = get_world_rays(xy, extrinsics, intrinsics)
    return intersect_rays(origins, directions, xy_origins, xy_directions)


def get_depth(
    origins: Array,
    directions: Array,
    xy: Array,
    extrinsics: Array,
    intrinsics: Array,
) -> Array:
    """Depths (distance from ray origin) for 2D points on epipolar lines
    (epipolar_lines.py:278-292)."""
    xyz = lift_to_3d(origins, directions, xy, extrinsics, intrinsics)
    return jnp.linalg.norm(xyz - origins, axis=-1)
