"""Splatting decoder: Gaussians + target cameras -> rendered images.

Equivalent of `DecoderSplattingCUDA` + `render_cuda`
(`src/model/decoder/decoder_splatting_cuda.py:37-68`,
`src/model/decoder/cuda_splatting.py:46-133`), but fully batched: the
reference loops Python-side per (batch*view); here the whole render is
vmapped over (b, v) inside one jit.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..geometry.gaussians import Gaussians
from ..ops.rasterizer import make_raster_camera, render
from ..ops.rasterizer.render import render_many


class DecoderOutput(NamedTuple):
    color: Array  # (b, v, h, w, 3)
    depth: Array  # (b, v, h, w)
    alpha: Array  # (b, v, h, w)
    # pair_cap telemetry, broadcast per view (per SHARD under shard_map: every
    # view in a shard reports its shard's fused-sort totals). The pair_cap
    # truncation was lossless iff (live_pairs <= pair_slots).all().
    live_pairs: Optional[Array] = None  # (b, v) i32
    pair_slots: Optional[Array] = None  # (b, v) i32


def render_gaussians(
    gaussians: Gaussians,
    extrinsics: Array,
    intrinsics: Array,
    near: Array,
    far: Array,
    image_shape: Tuple[int, int],
    background_color: Optional[Array] = None,
    scale_invariant: bool = False,
    cam_rot_delta: Optional[Array] = None,
    cam_trans_delta: Optional[Array] = None,
    *,
    max_tiles_per_gaussian: int = 32,
    max_per_tile: int = 4096,
    chunk: int = 64,
    impl: str = "jnp",
    pair_cap_per_gaussian: int = 0,
    shard_data=None,
) -> DecoderOutput:
    """Render each scene's Gaussians into its (b, v) target cameras.

    Args:
      gaussians: batched (b, g, ...) Gaussians.
      extrinsics: (b, v, 4, 4) c2w; intrinsics: (b, v, 3, 3) normalized.
      near/far: (b, v).
      scale_invariant: rescale the scene by 1/near per view before rendering
        (cuda_splatting.py:64-72) to avoid numerical issues with tiny nears.
      pair_cap_per_gaussian: if > 0, cap total sorted pair slots at this many
        per gaussian (computed from the shard-local view/gaussian counts —
        see render_many's pair_cap). 0 keeps every slot (exact).
      shard_data: optional (Mesh, axis_name). The fused renderer's single
        global sort must NOT cross the data-parallel boundary (XLA would
        all-gather all shards' pairs and sort them redundantly on every
        device); with a mesh given, the render core runs under shard_map so
        each device runs the flat fused sort over ITS batch shard only. TPU
        sorts are only fast in 1-D (measured: u32[1M] flat 0.24 ms vs
        u32[1,1M] 8.6 ms), so per-shard flat fusion beats any batched-sort
        layout.
    """
    b, v = extrinsics.shape[:2]
    n = b * v
    h, w = image_shape
    if background_color is None:
        background_color = jnp.zeros((3,), jnp.float32)
    background_color = jnp.broadcast_to(background_color, (b, v, 3))

    if cam_rot_delta is None:
        cam_rot_delta = jnp.zeros((b, v, 3), extrinsics.dtype)
    if cam_trans_delta is None:
        cam_trans_delta = jnp.zeros((b, v, 3), extrinsics.dtype)

    # Fused multi-view path: repeat each scene's gaussians across its v
    # target views, apply per-view scale-invariance, then ONE render_many
    # call — a single global sort + kernel launch for all (b, v) views (a
    # vmapped lax.sort costs more than the whole unbatched render on TPU).
    # The repeat is an explicit broadcast_to (view until consumed), NOT a
    # gather by arange(n)//v: a general gather materializes lane-padded
    # (n, g, 3)/(n, g, 3, d_sh) copies (minor dims 3/1 pad to 128 lanes,
    # ~42-128x wasted HBM traffic); the broadcast fuses into the projection.
    def per_view(x):  # (b, g, ...) -> (n, g, ...) repeat, no copy
        return jnp.broadcast_to(x[:, None], (b, v) + x.shape[1:]).reshape(
            (n,) + x.shape[1:]
        )

    ext = extrinsics.reshape(n, 4, 4)
    intr = intrinsics.reshape(n, 3, 3)
    nr = near.reshape(n).astype(jnp.float32)
    fr = far.reshape(n).astype(jnp.float32)
    mns = per_view(gaussians.means)  # (n, g, 3)
    shs = per_view(gaussians.harmonics)
    opas = per_view(gaussians.opacities)
    # Prefer the covariance factors over the assembled (g, 3, 3) tensor: the
    # Σ components then fuse into the projection and the padded 3x3 tensor is
    # never materialized (and is DCE'd upstream when nothing else reads it).
    # Adapters keep scales/rotations consistent with covariances, including
    # the posed adapter's world rotation (composed into the quaternion).
    use_factors = gaussians.scales is not None and gaussians.rotations is not None
    if use_factors:
        scl = per_view(gaussians.scales)
        rot = per_view(gaussians.rotations)
        cvs = None
    else:
        cvs = per_view(gaussians.covariances)

    if scale_invariant:
        scale = (1.0 / nr)[:, None]
        ext = ext.at[:, :3, 3].multiply(scale)
        mns = mns * scale[..., None]
        if use_factors:
            scl = scl * scale[..., None]  # Σ scales quadratically in S
        else:
            cvs = cvs * (scale**2)[..., None, None]
        nr = nr * scale[:, 0]
        fr = fr * scale[:, 0]

    cams = make_raster_camera(
        ext, intr, nr, fr, image_shape,
        cam_rot_delta=cam_rot_delta.reshape(n, 3),
        cam_trans_delta=cam_trans_delta.reshape(n, 3),
    )

    if use_factors:
        fields = dict(means=mns, scales=scl, rotations=rot,
                      harmonics=shs, opacities=opas)
    else:
        fields = dict(means=mns, covariances=cvs, harmonics=shs, opacities=opas)

    def run(cams_, fields_, bg_):
        # Derive the absolute cap from the SHARD-LOCAL view/gaussian counts
        # (under shard_map the global batch shape would overstate the local
        # slot count by n_devices and make the cap a silent no-op).
        n_loc, g_loc = fields_["means"].shape[:2]
        cap = pair_cap_per_gaussian * n_loc * g_loc if pair_cap_per_gaussian else None
        out_ = render_many(
            cams_,
            fields_["means"],
            fields_.get("covariances"),
            fields_["harmonics"],
            fields_["opacities"],
            image_shape,
            bg_,
            scales=fields_.get("scales"),
            rotations=fields_.get("rotations"),
            max_tiles_per_gaussian=max_tiles_per_gaussian,
            max_per_tile=max_per_tile,
            chunk=chunk,
            impl=impl,
            pair_cap=cap,
        )
        # Broadcast the scalar sort telemetry per view so shard_map's
        # P(axis) out_specs apply uniformly (a scalar can't be sharded).
        return out_._replace(
            live_pairs=jnp.broadcast_to(out_.live_pairs, (n_loc,)),
            pair_slots=jnp.broadcast_to(out_.pair_slots, (n_loc,)),
        )

    bgs = background_color.reshape(n, 3)
    if shard_data is not None:
        from jax.sharding import PartitionSpec as P

        mesh, axis = shard_data
        spec = P(axis)
        run = jax.shard_map(
            run,
            mesh=mesh,
            in_specs=(
                jax.tree.map(lambda _: spec, cams),
                jax.tree.map(lambda _: spec, fields),
                spec,
            ),
            out_specs=spec,
            check_vma=False,
        )
    out = run(cams, fields, bgs)
    return DecoderOutput(
        color=out.color.reshape(b, v, h, w, 3),
        depth=out.depth.reshape(b, v, h, w),
        alpha=out.alpha.reshape(b, v, h, w),
        live_pairs=out.live_pairs.reshape(b, v),
        pair_slots=out.pair_slots.reshape(b, v),
    )


def orthographic_cameras(
    extrinsics: Array,  # (b, v, 4, 4) c2w
    width: Array,  # (b, v) world-units view width
    height: Array,  # (b, v)
    near: Array,
    far: Array,
    fov_degrees: float = 0.1,
):
    """Fake-orthographic camera construction (reference
    render_cuda_orthographic, cuda_splatting.py:136-227, up to the rasterizer
    call): pull each camera back along its own -z by distance = (w/2)/tan_x
    for a tiny fov_x, derive tan_fov_y from the requested view height, and
    shift near/far by the move-back. Returns (c2w, normalized K, near, far) —
    the inputs render_gaussians wants. Split out so the executed-reference
    parity test (tests/test_reference_parity.py) can golden the construction
    against the reference source."""
    fov_x = jnp.deg2rad(jnp.asarray(fov_degrees))
    tan_fov_x = jnp.tan(0.5 * fov_x)
    distance = (0.5 * width) / tan_fov_x
    tan_fov_y = 0.5 * height / distance

    # Move each camera back along its own -z.
    def backed(ext, d):
        m = jnp.eye(4).at[2, 3].set(-d)
        return ext @ m

    b, v = extrinsics.shape[:2]
    ext_flat = extrinsics.reshape(b * v, 4, 4)
    d_flat = distance.reshape(b * v)
    new_ext = jax.vmap(backed)(ext_flat, d_flat).reshape(b, v, 4, 4)

    # Normalized intrinsics with the tiny fov: fx = 1/(2 tan_x).
    fx = jnp.broadcast_to(1.0 / (2.0 * tan_fov_x), (b, v))
    fy = 1.0 / (2.0 * tan_fov_y)
    k = jnp.zeros((b, v, 3, 3))
    k = k.at[..., 0, 0].set(fx)
    k = k.at[..., 1, 1].set(fy)
    k = k.at[..., 0, 2].set(0.5)
    k = k.at[..., 1, 2].set(0.5)
    k = k.at[..., 2, 2].set(1.0)
    return new_ext, k, near + distance, far + distance


def render_orthographic(
    gaussians: Gaussians,
    extrinsics: Array,  # (b, v, 4, 4) c2w
    width: Array,  # (b, v) world-units view width
    height: Array,  # (b, v)
    near: Array,
    far: Array,
    image_shape: Tuple[int, int],
    fov_degrees: float = 0.1,
    **render_kwargs,
) -> DecoderOutput:
    """Orthographic-style projection for top-down gaussian/camera
    visualizations (reference render_cuda_orthographic,
    cuda_splatting.py:136-227): fake orthography by pulling the camera far
    back with a tiny field of view."""
    new_ext, k, near2, far2 = orthographic_cameras(
        extrinsics, width, height, near, far, fov_degrees
    )
    return render_gaussians(
        gaussians, new_ext, k, near2, far2, image_shape, **render_kwargs
    )
