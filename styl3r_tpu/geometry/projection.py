"""Camera projection / ray geometry in pure JAX.

Functional equivalents of the reference `src/geometry/projection.py`:
normalized (0..1) image coordinates, OpenCV-convention camera-to-world
extrinsics (4x4) and normalized intrinsics (3x3).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import Array


def homogenize_points(points: Array) -> Array:
    """(…, d) xyz -> (…, d+1) xyz1."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def homogenize_vectors(vectors: Array) -> Array:
    """(…, d) xyz -> (…, d+1) xyz0."""
    return jnp.concatenate([vectors, jnp.zeros_like(vectors[..., :1])], axis=-1)


def transform_rigid(homogeneous: Array, transformation: Array) -> Array:
    """Apply a rigid-body transform to homogeneous points/vectors."""
    return jnp.einsum("...ij,...j->...i", transformation, homogeneous)


def invert_se3(extrinsics: Array) -> Array:
    """Invert a 4x4 rigid transform analytically (cheaper + more stable than
    a general inverse; the reference calls `.inverse()`)."""
    rot = extrinsics[..., :3, :3]
    t = extrinsics[..., :3, 3]
    rot_t = jnp.swapaxes(rot, -1, -2)
    t_new = -jnp.einsum("...ij,...j->...i", rot_t, t)
    top = jnp.concatenate([rot_t, t_new[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=extrinsics.dtype),
        top.shape[:-2] + (1, 4),
    )
    return jnp.concatenate([top, bottom], axis=-2)


def project(
    points: Array,
    extrinsics: Array,
    intrinsics: Array,
    epsilon: float = 1.1920929e-07,
) -> Tuple[Array, Array]:
    """Project world points through a camera. Returns (xy in [0,1], in-front mask).

    Reference: `src/geometry/projection.py:59-71`.
    """
    cam = transform_rigid(homogenize_points(points), invert_se3(extrinsics))[..., :3]
    in_front = cam[..., -1] >= 0
    cam = cam / (cam[..., -1:] + epsilon)
    cam = jnp.nan_to_num(cam, posinf=1e8, neginf=-1e8)
    pixel = jnp.einsum("...ij,...j->...i", intrinsics, cam)
    return pixel[..., :2], in_front


def unproject(coordinates: Array, z: Array, intrinsics: Array) -> Array:
    """Unproject normalized 2D coords at depth z into camera space."""
    coords_h = homogenize_points(coordinates)
    k_inv = jnp.linalg.inv(intrinsics)
    rays = jnp.einsum("...ij,...j->...i", k_inv, coords_h)
    return rays * z[..., None]


def get_world_rays(
    coordinates: Array,
    extrinsics: Array,
    intrinsics: Array,
) -> Tuple[Array, Array]:
    """Per-pixel world-space ray origins and unit directions.

    Reference: `src/geometry/projection.py:91-114`.
    """
    directions = unproject(coordinates, jnp.ones_like(coordinates[..., 0]), intrinsics)
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    directions = transform_rigid(homogenize_vectors(directions), extrinsics)[..., :3]
    origins = jnp.broadcast_to(extrinsics[..., :3, 3], directions.shape)
    return origins, directions


def sample_image_grid(shape: Tuple[int, int]) -> Tuple[Array, Array]:
    """Normalized half-pixel-center (x, y) coordinates plus integer (row, col)
    indices for an image grid. Reference: `src/geometry/projection.py:131-152`."""
    h, w = shape
    rows = jnp.arange(h)
    cols = jnp.arange(w)
    indices = jnp.stack(jnp.meshgrid(rows, cols, indexing="ij"), axis=-1)
    x = (cols + 0.5) / w
    y = (rows + 0.5) / h
    coords = jnp.stack(jnp.meshgrid(x, y, indexing="xy"), axis=-1)
    return coords, indices


def get_fov(intrinsics: Array) -> Array:
    """Horizontal/vertical field of view (radians) of normalized intrinsics.

    Reference: `src/geometry/projection.py:243-257` — angle between the rays
    through opposite image-edge midpoints.
    """
    k_inv = jnp.linalg.inv(intrinsics)

    def ray(vec):
        v = jnp.einsum("...ij,j->...i", k_inv, jnp.asarray(vec, dtype=intrinsics.dtype))
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    left, right = ray([0.0, 0.5, 1.0]), ray([1.0, 0.5, 1.0])
    top, bottom = ray([0.5, 0.0, 1.0]), ray([0.5, 1.0, 1.0])
    fov_x = jnp.arccos(jnp.clip(jnp.sum(left * right, axis=-1), -1.0, 1.0))
    fov_y = jnp.arccos(jnp.clip(jnp.sum(top * bottom, axis=-1), -1.0, 1.0))
    return jnp.stack([fov_x, fov_y], axis=-1)


def intersect_rays(
    origins_x: Array,
    directions_x: Array,
    origins_y: Array,
    directions_y: Array,
    eps: float = 1e-5,
    inf: float = 1e10,
) -> Array:
    """Least-squares intersection point of two ray bundles (vectorized, jittable).

    Unlike the reference (`projection.py:189-240`) this masks parallel pairs
    instead of boolean-indexing them out, so shapes stay static under jit.
    """
    shape = jnp.broadcast_shapes(
        origins_x.shape, directions_x.shape, origins_y.shape, directions_y.shape
    )
    ox = jnp.broadcast_to(origins_x, shape)
    dx = jnp.broadcast_to(directions_x, shape)
    oy = jnp.broadcast_to(origins_y, shape)
    dy = jnp.broadcast_to(directions_y, shape)

    parallel = jnp.sum(dx * dy, axis=-1) > 1 - eps

    origins = jnp.stack([ox, oy], axis=0)
    directions = jnp.stack([dx, dy], axis=0)
    n = jnp.einsum("r...i,r...j->r...ij", directions, directions)
    n = n - jnp.eye(3, dtype=n.dtype)
    lhs = jnp.sum(n, axis=0)
    rhs = jnp.sum(jnp.einsum("r...ij,r...j->r...i", n, origins), axis=0)
    # Regularized solve stands in for lstsq (lhs is near-singular for parallel rays,
    # which are masked to `inf` anyway).
    lhs = lhs + 1e-10 * jnp.eye(3, dtype=lhs.dtype)
    result = jnp.linalg.solve(lhs, rhs[..., None])[..., 0]
    return jnp.where(parallel[..., None], jnp.full_like(result, inf), result)


def get_local_rays_basis(coordinates: Array, intrinsics: Array) -> Array:
    """Unit camera-space ray directions for normalized coords
    (reference get_local_rays, projection.py:117-128)."""
    directions = unproject(
        coordinates, jnp.ones_like(coordinates[..., 0]), intrinsics
    )
    return directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
