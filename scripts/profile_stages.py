"""Per-stage device-time breakdown of the flagship predict+render path.

Times each pipeline slice with an in-jit scan (the dev TPU sits behind a
~25 ms/dispatch tunnel, so per-stage device time must be measured inside one
jit) and prints a JSON breakdown:

  backbone | stylizer | heads (pts3d+gs+appearance) | adapter |
  project+bin+sort | composite (pallas fwd) | full forward

Run on the real TPU:      python scripts/profile_stages.py
Quick CPU smoke:          python scripts/profile_stages.py --cpu --tiny
4-view / batched:         python scripts/profile_stages.py --views 4 --batch 4

VERDICT round-1 item 5: accounts for the ~37 ms/scene that the round-1 README
left unattributed. The output is committed as PROFILE_r{N}.json.
"""

import argparse
import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def time_scan(fn, args, perturb, n):
    """Wall time of n in-jit iterations of fn; `perturb(args, carry)` must make
    each iteration's input data-dependent so XLA can't CSE the scan body."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(args):
        def body(carry, _):
            out = fn(*perturb(args, carry))
            # Consume every output leaf with a NON-LINEAR reduction: consuming
            # one element lets XLA dead-code-eliminate the stage, and a plain
            # sum is linear, so XLA reassociates it THROUGH the stage's final
            # convs/matmuls and skips computing the full outputs (measured:
            # plain sums reported the heads stage ~9 ms under its true cost).
            # sum(x*x) cannot fold through linear ops.
            tot = sum(
                jnp.sum(jnp.square(leaf.astype(jnp.float32))) * 1e-12
                for leaf in jax.tree_util.tree_leaves(out)
            )
            return carry * 0.5 + tot * 1e-12, ()

        carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return carry

    # Timing on the axon remote backend: block_until_ready does NOT wait
    # (experimental platform), so force a host fetch of the scalar result and
    # subtract the measured dispatch roundtrip. Verified against a known-FLOPs
    # matmul chain.
    float(run(args))  # compile + warm
    null = jax.jit(lambda x: x + 1.0)
    float(null(jnp.float32(0)))
    t0 = time.perf_counter()
    float(null(jnp.float32(1)))
    roundtrip = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(args))
    total = time.perf_counter() - t0
    return max(total - roundtrip, 0.0) / n


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--views", type=int, default=2)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--impl", default="auto")
    parser.add_argument("--pair-cap", type=int, default=0,
                        help="pair_cap_per_gaussian render kwarg (0 = exact)")
    parser.add_argument("--max-per-tile", type=int, default=0,
                        help="override max_per_tile render kwarg")
    parser.add_argument("--output", default="")
    parser.add_argument("--stages", default="",
                        help="comma-separated stage names to run (default all); "
                             "run stages in separate processes to bound device memory")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from styl3r_tpu.models.styl3r import Styl3rModel, normalize_images
    from styl3r_tpu.models.decoder import render_gaussians
    from styl3r_tpu.ops.rasterizer import make_raster_camera
    from styl3r_tpu.ops.rasterizer.render import TILE, _build_pairs
    from styl3r_tpu.ops.rasterizer.project import eval_sh, project_gaussians

    impl = args.impl
    if impl == "auto":
        impl = "jnp" if jax.default_backend() == "cpu" else "pallas"
    h = w = args.size if not args.tiny else 64
    b, v = args.batch, args.views
    tiny = dict(enc_depth=2, dec_depth=4, enc_dim=32, dec_dim=16, enc_heads=2, dec_heads=2)
    model = Styl3rModel(
        sh_degree=0, backbone_dtype=jnp.bfloat16,
        head_trunk_dtype=jnp.bfloat16,  # match bench.py's fast-inference config
        **(tiny if args.tiny else {}),
    )
    rng = np.random.default_rng(0)
    batch = _example_batch(rng, b=b, v=v, h=h, w=w, t=1, style_hw=h)
    params = jax.jit(model.init)(jax.random.key(0), batch)
    render_kwargs = dict(
        max_per_tile=512 if args.tiny else 2048, max_tiles_per_gaussian=8, impl=impl
    )
    if args.pair_cap:
        render_kwargs["pair_cap_per_gaussian"] = args.pair_cap
    if args.max_per_tile:
        render_kwargs["max_per_tile"] = args.max_per_tile
    n = args.iters
    enc = model.encoder
    imgs = normalize_images(batch.context_images)
    style = normalize_images(batch.style_image)

    def perturb_img(a, c):
        # a = (params, images, ...): perturb the image operand, never the
        # params (params ride through args so they become jit PARAMETERS —
        # closing over them bakes 2.4 GB of constants into the lowering).
        return (a[0], a[1] + c, *a[2:])

    results = {}
    out_path = Path(args.output) if args.output else None

    selected = [s.strip() for s in args.stages.split(",") if s.strip()]

    def record(name, fn_args):
        if selected and not any(name.startswith(s) for s in selected):
            return
        t0 = time.time()
        results[name] = time_scan(*fn_args, n=n)
        print(f"{name}: {1e3 * results[name] / b:.3f} ms/scene "
              f"(+{time.time() - t0:.0f}s compile+run)", flush=True)
        if out_path:
            merged = {}
            if out_path.exists():
                try:
                    merged = json.loads(out_path.read_text())
                except Exception:
                    merged = {}
            merged.update({k: round(1e3 * v / b, 3) for k, v in results.items()})
            out_path.write_text(json.dumps(merged, indent=2))

    # -- encoder slices ------------------------------------------------------
    record("backbone", (
        lambda p, im, k: enc.apply(p, im, k, method=lambda m, i, kk: m.backbone(i, kk)),
        (params, imgs, batch.context_intrinsics), perturb_img,
    ))

    def bb_sty(m, i, kk, s):
        enc_feat, enc_pos, dec_feat = m.backbone(i, kk)
        return m.token_stylizer(s, enc_feat, enc_pos)

    record("backbone+stylizer", (
        lambda p, im, k, s: enc.apply(p, im, k, s, method=bb_sty),
        (params, imgs, batch.context_intrinsics, style), perturb_img,
    ))

    record("predict (enc+sty+heads+adapter)", (
        lambda p, im, k, s: enc.apply(p, im, k, s),
        (params, imgs, batch.context_intrinsics, style), perturb_img,
    ))

    # -- render slices (fixed gaussians) ------------------------------------
    gaussians = jax.jit(lambda p, bt: model.predict_gaussians(p, bt))(params, batch)
    gaussians = jax.block_until_ready(gaussians)
    cam = make_raster_camera(
        batch.target_extrinsics[0, 0], batch.target_intrinsics[0, 0],
        batch.target_near[0, 0], batch.target_far[0, 0], (h, w),
    )
    means, covs = gaussians.means[0], gaussians.covariances[0]
    shs, opas = gaussians.harmonics[0], gaussians.opacities[0]
    gy, gx = h // TILE, w // TILE

    def perturb_means(a, c):
        return (a[0] + c, *a[1:])

    def project_bin_sort(mns, cvs, op):
        proj = project_gaussians(cam, mns, cvs)
        pair_tiles, pair_depths, pair_gidx = _build_pairs(
            proj.mean_x, proj.mean_y, proj.radii, proj.depths, proj.mask,
            (gy, gx), render_kwargs["max_tiles_per_gaussian"], opacities=op,
        )
        n_tiles = gy * gx
        tile_bits = max(int(n_tiles + 1).bit_length(), 1)
        depth_shift = jnp.uint32(32 - tile_bits)
        depth_bits = jax.lax.bitcast_convert_type(
            pair_depths.astype(jnp.float32), jnp.uint32
        )
        key = (pair_tiles.astype(jnp.uint32) << depth_shift) | (
            depth_bits >> jnp.uint32(tile_bits)
        )
        sk, sg = jax.lax.sort((key, pair_gidx), num_keys=1)
        stiles = (sk >> depth_shift).astype(jnp.int32)
        starts = jnp.searchsorted(stiles, jnp.arange(n_tiles, dtype=jnp.int32))
        return starts.astype(jnp.float32).sum() + sg.astype(jnp.float32).sum()

    record("project+bin+sort", (project_bin_sort, (means, covs, opas), perturb_means))

    def project_only(mns, cvs):
        proj = project_gaussians(cam, mns, cvs)
        return sum(jnp.sum(x.astype(jnp.float32)) * 1e-12
                   for x in (proj.mean_x, proj.mean_y, proj.con_a, proj.con_b,
                             proj.con_c, proj.depths, proj.radii))

    record("project only", (project_only, (means, covs), perturb_means))

    def bin_only(mns, cvs, op):
        proj = project_gaussians(cam, mns, cvs)
        pair_tiles, pair_depths, pair_gidx = _build_pairs(
            proj.mean_x, proj.mean_y, proj.radii, proj.depths, proj.mask,
            (gy, gx), render_kwargs["max_tiles_per_gaussian"], opacities=op,
            con_a=proj.con_a, con_b=proj.con_b, con_c=proj.con_c,
        )
        return (jnp.sum(pair_tiles.astype(jnp.float32)) * 1e-12
                + jnp.sum(pair_depths) * 1e-12 + jnp.sum(pair_gidx) * 1e-12)

    record("project+bin (no sort)", (bin_only, (means, covs, opas), perturb_means))

    # -- kernel-isolation slices (share one precomputed bin/sort) ------------
    from styl3r_tpu.ops.rasterizer.pallas_kernel import (
        composite_tiles_pallas, pack_attrs,
    )
    from styl3r_tpu.ops.rasterizer.render import composite_pallas_diff

    proj0 = jax.jit(lambda mns: project_gaussians(cam, mns, covs))(means)
    pair_tiles, pair_depths, pair_gidx = _build_pairs(
        proj0.mean_x, proj0.mean_y, proj0.radii, proj0.depths, proj0.mask,
        (gy, gx), render_kwargs["max_tiles_per_gaussian"], opacities=opas,
        con_a=proj0.con_a, con_b=proj0.con_b, con_c=proj0.con_c,
    )
    n_tiles = gy * gx
    tile_bits = max(int(n_tiles + 1).bit_length(), 1)
    depth_shift = jnp.uint32(32 - tile_bits)
    depth_bits = jax.lax.bitcast_convert_type(pair_depths.astype(jnp.float32), jnp.uint32)
    key = (pair_tiles.astype(jnp.uint32) << depth_shift) | (depth_bits >> jnp.uint32(tile_bits))
    skey, sgidx = jax.lax.sort((key, pair_gidx), num_keys=1)
    stiles = (skey >> depth_shift).astype(jnp.int32)
    tids = jnp.arange(n_tiles, dtype=stiles.dtype)
    starts0 = jnp.searchsorted(stiles, tids, side="left").astype(jnp.int32)
    ends0 = jnp.searchsorted(stiles, tids, side="right").astype(jnp.int32)
    counts0 = jnp.minimum(ends0 - starts0, render_kwargs["max_per_tile"])
    dirs0 = means - cam.cam_pos
    dirs0 = dirs0 / jnp.maximum(jnp.linalg.norm(dirs0, axis=-1, keepdims=True), 1e-8)
    colors0 = jax.jit(eval_sh)(shs, dirs0)
    print(f"[kernel slices] pairs in tiles: {int((pair_tiles < n_tiles).sum())} "
          f"/ {pair_tiles.shape[0]}; counts: mean {float(counts0.mean()):.0f} "
          f"max {int(counts0.max())}", flush=True)

    record("pack_attrs (gather)", (
        lambda mx: pack_attrs(mx, proj0.mean_y, proj0.con_a, proj0.con_b,
                              proj0.con_c, opas.astype(jnp.float32),
                              colors0, proj0.depths, sgidx).sum() * 1e-12,
        (proj0.mean_x,), perturb_means,
    ))

    attrs0 = jax.jit(pack_attrs)(proj0.mean_x, proj0.mean_y, proj0.con_a,
                                 proj0.con_b, proj0.con_c,
                                 opas.astype(jnp.float32), colors0,
                                 proj0.depths, sgidx)
    bg0 = jnp.zeros((3,), jnp.float32)

    record("composite kernel only", (
        lambda a: composite_tiles_pallas(
            a, starts0, counts0, bg0, (gy, gx),
            max_per_tile=render_kwargs["max_per_tile"],
            interpret=jax.default_backend() == "cpu",
        )[0].sum() * 1e-12,
        (attrs0,), lambda args, c: (args[0] + c,),
    ))

    from styl3r_tpu.ops.rasterizer.render import render as render_one_view

    record("render unbatched (no vmap)", (
        lambda mns: render_one_view(
            cam, mns, covs, shs, opas, (h, w),
            max_tiles_per_gaussian=render_kwargs["max_tiles_per_gaussian"],
            max_per_tile=render_kwargs["max_per_tile"],
            impl=impl,
        ).color,
        (means,), perturb_means,
    ))

    # All gaussian fields ride as ARGUMENTS: closing non-perturbed fields over
    # the jit lets XLA constant-fold half the projection/binning, which made
    # this slice report ~2x faster than its true in-situ cost.
    record("render (proj+sort+composite)", (
        lambda mns, cvs, sh, op: render_gaussians(
            gaussians._replace(
                means=mns, covariances=cvs, harmonics=sh, opacities=op
            ),
            batch.target_extrinsics,
            batch.target_intrinsics, batch.target_near, batch.target_far,
            (h, w), **render_kwargs,
        ).color,
        (gaussians.means, gaussians.covariances, gaussians.harmonics,
         gaussians.opacities),
        perturb_means,
    ))

    record("full forward", (
        lambda p, bt_img: model.forward(
            p, batch._replace(context_images=bt_img), (h, w), **render_kwargs
        )[1].color,
        (params, batch.context_images), perturb_img,
    ))

    # -- backward slices (VERDICT r3 #4: attribute the training backward) ----
    # Select with --stages bwd.
    def render_loss(mns, cvs, sh, op):
        out = render_gaussians(
            gaussians._replace(means=mns, covariances=cvs, harmonics=sh,
                               opacities=op),
            batch.target_extrinsics, batch.target_intrinsics,
            batch.target_near, batch.target_far, (h, w), **render_kwargs,
        )
        return jnp.sum(jnp.square(out.color))

    record("bwd:render fwd+bwd", (
        jax.value_and_grad(render_loss, argnums=(0, 1, 2, 3)),
        (gaussians.means, gaussians.covariances, gaussians.harmonics,
         gaussians.opacities),
        perturb_means,
    ))

    def composite_loss(a):
        rgb, dep, alp = composite_pallas_diff(
            a, starts0, counts0, bg0, gy, gx,
            render_kwargs["max_per_tile"], jax.default_backend() == "cpu", 1,
        )
        return jnp.sum(jnp.square(rgb)) + jnp.sum(jnp.square(dep))

    record("bwd:composite kernel fwd+bwd", (
        jax.value_and_grad(composite_loss), (attrs0,),
        lambda args, c: (args[0] + c,),
    ))

    from styl3r_tpu.ops.rasterizer.pallas_backward import (
        gather_window_grads,
        scatter_window_grads,
    )

    n_pairs0 = attrs0.shape[1]
    max_windows0 = (render_kwargs["max_per_tile"] + 127) // 128 + 1
    wg0 = jnp.ones((n_tiles, max_windows0, 16, 128), jnp.float32)
    record("bwd:scatter_window_grads only", (
        lambda wg: scatter_window_grads(wg, starts0, n_pairs0).sum() * 1e-12,
        (wg0,), lambda args, c: (args[0] + c,),
    ))
    record("bwd:gather_window_grads only", (
        lambda wg: gather_window_grads(
            wg, starts0, counts0, n_pairs0
        ).sum() * 1e-12,
        (wg0,), lambda args, c: (args[0] + c,),
    ))

    def pack_loss(mx):
        return jnp.sum(jnp.square(
            pack_attrs(mx, proj0.mean_y, proj0.con_a, proj0.con_b, proj0.con_c,
                       opas.astype(jnp.float32), colors0, proj0.depths, sgidx)
        ))

    record("bwd:pack_attrs fwd+bwd (gather+scatter)", (
        jax.value_and_grad(pack_loss), (proj0.mean_x,), perturb_means,
    ))

    def pack_loss_grouped(mx):
        return jnp.sum(jnp.square(
            pack_attrs(mx, proj0.mean_y, proj0.con_a, proj0.con_b, proj0.con_c,
                       opas.astype(jnp.float32), colors0, proj0.depths, sgidx,
                       full_gidx=sgidx)
        ))

    record("bwd:pack_attrs fwd+bwd (grouped)", (
        jax.value_and_grad(pack_loss_grouped), (proj0.mean_x,), perturb_means,
    ))

    # -- chained in-situ slices ----------------------------------------------
    # predict -> (render pipeline truncated at stage K), all in ONE jit, so
    # each difference gives the *in-situ* cost of a render stage downstream of
    # the live encoder (isolated slices can mis-state costs when XLA fuses /
    # lays out differently across the predict|render boundary). Select with
    # --stages chain.
    t_views = batch.target_extrinsics.shape[1]
    nviews = b * t_views

    def pview(x):  # (b, g, ...) -> (nviews, g, ...) repeat (mirrors decoder)
        return jnp.broadcast_to(x[:, None], (b, t_views) + x.shape[1:]).reshape(
            (nviews,) + x.shape[1:]
        )

    def chain_to(stage):
        def fn(p, im, k, s):
            g = enc.apply(p, im, k, s)
            ext = batch.target_extrinsics.reshape(nviews, 4, 4)
            intr = batch.target_intrinsics.reshape(nviews, 3, 3)
            nr = batch.target_near.reshape(nviews)
            fr = batch.target_far.reshape(nviews)
            cams = make_raster_camera(ext, intr, nr, fr, (h, w))
            mns = pview(g.means)
            scl = pview(g.scales)
            rot = pview(g.rotations)
            opa = pview(g.opacities)
            shs = pview(g.harmonics)
            proj = jax.vmap(
                lambda c, m, sc, ro: project_gaussians(c, m, scales=sc, rotations=ro)
            )(cams, mns, scl, rot)
            if stage == "project":
                return (proj.mean_x, proj.mean_y, proj.con_a, proj.con_b,
                        proj.con_c, proj.depths, proj.radii)
            gy2, gx2 = h // TILE, w // TILE
            n_tiles = gy2 * gx2
            pt, pd, pg = jax.vmap(
                functools.partial(
                    _build_pairs, grid=(gy2, gx2),
                    max_tiles_per_gaussian=render_kwargs["max_tiles_per_gaussian"],
                )
            )(proj.mean_x, proj.mean_y, proj.radii, proj.depths, proj.mask,
              opacities=opa, con_a=proj.con_a, con_b=proj.con_b,
              con_c=proj.con_c)
            view_ids = jnp.arange(nviews, dtype=jnp.int32)[:, None]
            gg = mns.shape[1]
            pt = jnp.where(pt >= n_tiles, nviews * n_tiles, pt + view_ids * n_tiles).reshape(-1)
            pg = (pg + view_ids * gg).reshape(-1)
            pd = pd.reshape(-1)
            from styl3r_tpu.ops.rasterizer.render import _sort_pairs

            _, sgidx, starts, ends = _sort_pairs(pt, pd, pg, nviews * n_tiles)
            # Apply the SAME pair_cap truncation as render_gaussians: without
            # it the chain measures the uncapped gather while "full forward"
            # runs capped, so the stage deltas conflate configurations (the
            # r3 "6.5 ms composite residual" was exactly this artifact).
            pcg = render_kwargs.get("pair_cap_per_gaussian", 0)
            if pcg and pcg * nviews * gg < sgidx.shape[0]:
                cap = -(-(pcg * nviews * gg) // 128) * 128
                sgidx = sgidx[:cap]
                starts = jnp.minimum(starts, cap)
                ends = jnp.minimum(ends, cap)
            if stage == "binsort":
                return sgidx, starts, ends
            from styl3r_tpu.ops.rasterizer.pallas_kernel import pack_attrs as pa

            dirs = mns - cams.cam_pos[:, None, :]
            dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
            cols = eval_sh(shs, dirs)
            flatv = lambda x: x.reshape((nviews * gg,) + x.shape[2:])
            attrs = pa(flatv(proj.mean_x), flatv(proj.mean_y),
                       flatv(proj.con_a), flatv(proj.con_b), flatv(proj.con_c),
                       flatv(opa).astype(jnp.float32), flatv(cols),
                       flatv(proj.depths), sgidx)
            if stage == "pack":
                return attrs, starts, ends
            from styl3r_tpu.ops.rasterizer.render import composite_pallas_diff

            counts = jnp.minimum(ends - starts, render_kwargs["max_per_tile"])
            bgs = jnp.zeros((nviews, 3), jnp.float32)
            rgb, dep, alp = composite_pallas_diff(
                attrs, starts, counts, bgs, gy2, gx2,
                render_kwargs["max_per_tile"],
                jax.default_backend() == "cpu",  # interpret off-TPU
                nviews,
            )
            if stage == "composite":
                return rgb, dep, alp
            # Final image assembly exactly as render_many does it.
            gy3, gx3 = gy2, gx2
            color = (
                rgb.reshape(nviews, gy3, gx3, TILE, TILE, 3)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(nviews, h, w, 3)
            )
            dimg = (
                dep.reshape(nviews, gy3, gx3, TILE, TILE)
                .transpose(0, 1, 3, 2, 4)
                .reshape(nviews, h, w)
            )
            if stage == "images":
                return color, dimg, alp
            raise ValueError(stage)

        return fn

    for st in ("project", "binsort", "pack", "composite", "images"):
        record(f"chain:{st}", (
            chain_to(st),
            (params, imgs, batch.context_intrinsics, style), perturb_img,
        ))

    if selected:
        return
    # Derived slices.
    derived = {
        "stylizer": results["backbone+stylizer"] - results["backbone"],
        "heads+adapter": results["predict (enc+sty+heads+adapter)"]
        - results["backbone+stylizer"],
        "composite": results["render (proj+sort+composite)"] - results["project+bin+sort"],
    }

    report = {
        "config": {
            "views": v, "batch": b, "size": h, "impl": impl,
            "backend": jax.default_backend(), "tiny": args.tiny,
        },
        "per_scene_ms": {k: round(1e3 * t / b, 3) for k, t in results.items()},
        "derived_ms": {k: round(1e3 * t / b, 3) for k, t in derived.items()},
        "scenes_per_sec": round(b / results["full forward"], 3),
    }
    # MFU of the full forward (analytic matmul/conv FLOPs, utils/flops.py).
    from styl3r_tpu.utils import flops as flops_mod

    fwd_flops = flops_mod.styl3r_forward_flops(
        b=b, v=v, h=h, w=w, style_hw=h, n_targets=1,
        enc_depth=enc.enc_depth, dec_depth=enc.dec_depth,
        enc_dim=enc.enc_dim, dec_dim=enc.dec_dim,
        pair_cap_per_gaussian=render_kwargs.get("pair_cap_per_gaussian", 8),
    )
    report["mfu"] = {
        **flops_mod.mfu(fwd_flops["total"], results["full forward"]),
        "model_gflops": round(fwd_flops["total"] / 1e9, 1),
        "breakdown_gflops": {k: round(x / 1e9, 1) for k, x in fwd_flops.items()},
    }
    print(json.dumps(report, indent=2))
    if args.output:
        Path(args.output).write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
