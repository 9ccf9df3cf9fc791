"""Stage-1 overfit run on the bundled COLMAP scene (VERDICT r5 #4).

The reference's de-facto regression method is an overfit smoke run (SURVEY.md
§4); with no released checkpoint in this environment, "the system learns real
images" is demonstrated by overfitting the bundled 301-frame scene
(/root/reference/colmap_test_data/scenes/train) from scratch init and
measuring held-out-view PSNR.

Protocol:
  * every 10th frame is held out (never a context nor a target in training);
  * each training sample follows the RE10K dataset convention
    (data/dataset.py:180-208): context pair (i, i+2g), targets strictly
    between, world rescaled so the context baseline is 1, poses made relative
    to the first context, near/far = 0.1/scale, 100/scale;
  * stage-1 step: stylized=False (style := context 0), MSE loss, AdamW with
    warmup+cosine (train/step.py make_optimizer);
  * eval: for each held-out frame t, contexts (t-g_eval, t+g_eval) from the
    train split, render t, PSNR vs ground truth.

Writes {"series": [{step, loss}...], "evals": [{step, psnr}...], config...}
to --output (committed as OVERFIT_r05.json when run on TPU).

Usage (CPU smoke):   python scripts/overfit_colmap.py --cpu --size 64 \
    --model tiny --steps 20 --eval-every 10 --output /tmp/overfit.json
TPU run:             python scripts/overfit_colmap.py --size 256 \
    --model small --steps 3000 --output OVERFIT_r05.json
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MODEL_KWARGS = {
    # full = ViT-L reference config (encoder.py defaults)
    "full": {},
    # small: enough capacity to overfit one scene, ~8x cheaper per step
    "small": dict(
        enc_depth=8, dec_depth=6, enc_dim=512, dec_dim=384,
        enc_heads=8, dec_heads=6,
    ),
    "tiny": dict(
        enc_depth=2, dec_depth=2, enc_dim=32, dec_dim=16,
        enc_heads=2, dec_heads=2, head_feature_dim=16, head_last_dim=16,
        head_layer_dims=(8, 8, 16, 16),
    ),
}


def load_scene(scene_dir: Path, size: int, return_points: bool = False):
    """Images (n, size, size, 3) in [0,1], normalized intrinsics, c2w poses
    (same loading path as infer_colmap.py). With return_points, also the
    COLMAP sparse point cloud (m, 3) in the SAME (auto-oriented) world frame
    as the returned poses — LLFF poses_bounds keeps the COLMAP world frame
    (only camera-axis columns are permuted), so the auto-orient transform is
    the only thing to apply (verified: 42-86% of points project inside each
    frame with depths matching the stored LLFF bounds)."""
    from PIL import Image

    from styl3r_tpu.data.colmap import (
        auto_orient_and_center_poses,
        camera_intrinsics_normalized,
        colmap_poses_c2w,
        llff_intrinsics_normalized,
        load_colmap_model,
        read_llff_poses,
        read_points3d_binary,
    )

    sparse = scene_dir / "sparse" / "0"
    image_dir = scene_dir / "images"
    photo_paths = sorted(
        p for p in image_dir.iterdir()
        if p.suffix.lower() in (".png", ".jpg", ".jpeg") and p.stem.isdigit()
    )
    if (sparse / "images.bin").exists() or (sparse / "images.txt").exists():
        cameras, col_images = load_colmap_model(sparse)
        poses, names = colmap_poses_c2w(col_images)
        name_to_pose = {n: i for i, n in enumerate(names)}
        keep = [p for p in photo_paths if p.name in name_to_pose]
        poses = poses[[name_to_pose[p.name] for p in keep]]
        photo_paths = keep
        cam = cameras[next(iter(cameras))]
        intrinsics = np.tile(
            camera_intrinsics_normalized(cam), (len(photo_paths), 1, 1)
        )
    else:
        poses_all, hwf, _ = read_llff_poses(scene_dir / "poses_bounds.npy")
        poses = poses_all[: len(photo_paths)]
        intrinsics = llff_intrinsics_normalized(hwf[: len(photo_paths)])
    poses, transform = auto_orient_and_center_poses(poses)

    def load(p):
        im = Image.open(p).convert("RGB")
        if im.size != (size, size):
            im = im.resize((size, size), Image.LANCZOS)
        return np.asarray(im, np.float32) / 255.0

    images = np.stack([load(p) for p in photo_paths])
    out = (images, intrinsics.astype(np.float32), poses.astype(np.float32))
    if not return_points:
        return out
    pts_file = sparse / "points3D.bin"
    points = None
    if pts_file.exists():
        xyz = read_points3d_binary(pts_file)[:, :3]
        points = ((transform[:3, :3] @ xyz.T).T + transform[:3, 3]).astype(np.float32)
    return out + (points,)


def _sparse_anchor(pts_c0, ext, intr, c0, c1, hw, k_points):
    """Project COLMAP points (already rescaled AND expressed in the ctx-0
    camera frame — the frame the pts3d heads predict in) into both context
    views: flat gaussian indices (2*k,), target xyz (2*k, 3), mask (2*k,).
    `ext` is the rescaled ctx-0-relative extrinsics, so inv(ext[c]) maps the
    ctx-0 frame into camera c."""
    h, w = hw
    idx_out = np.zeros((2 * k_points,), np.int32)
    tgt_out = np.zeros((2 * k_points, 3), np.float32)
    mask_out = np.zeros((2 * k_points,), np.float32)
    points = pts_c0
    for j, c in enumerate((c0, c1)):
        w2c = np.linalg.inv(ext[c])
        pc = (w2c[:3, :3] @ points.T).T + w2c[:3, 3]
        z = pc[:, 2]
        kmat = intr[c]
        u = kmat[0, 0] * pc[:, 0] / np.clip(z, 1e-6, None) + kmat[0, 2]
        v = kmat[1, 1] * pc[:, 1] / np.clip(z, 1e-6, None) + kmat[1, 2]
        ok = (z > 0.1) & (z < 50.0) & (u >= 0) & (u < 1) & (v >= 0) & (v < 1)
        sel = np.flatnonzero(ok)
        if len(sel) > k_points:  # deterministic strided subsample
            sel = sel[:: len(sel) // k_points + 1][:k_points]
        n = len(sel)
        px = np.minimum((u[sel] * w).astype(np.int32), w - 1)
        py = np.minimum((v[sel] * h).astype(np.int32), h - 1)
        sl = slice(j * k_points, j * k_points + n)
        idx_out[sl] = j * h * w + py * w + px
        tgt_out[sl] = pts_c0[sel]
        mask_out[sl] = 1.0
    return idx_out, tgt_out, mask_out


def make_batch(images, intrinsics, poses, samples, n_targets, Batch,
               style_idx=None, points=None, k_points=2048):
    """samples: list of (ctx0, ctx1, [targets...]) frame-index tuples.
    style_idx: optional per-sample style-frame indices (stage-2); default
    style := context 0 (overwritten by the stage-1 step anyway).
    points: optional (m, 3) COLMAP sparse cloud in the poses' world frame —
    fills Batch.sparse_anchor for train/losses.py sparse_anchor_loss."""
    import jax.numpy as jnp

    hw = images.shape[1:3]
    ctx_i, ctx_k, tgt_e, tgt_k, tgt_im, nears, fars = [], [], [], [], [], [], []
    anc_idx, anc_tgt, anc_mask = [], [], []
    for c0, c1, tgts in samples:
        ext = poses.copy()
        scale = float(np.linalg.norm(ext[c0, :3, 3] - ext[c1, :3, 3]))
        scale = max(scale, 1e-6)
        ext[:, :3, 3] /= scale
        rel = np.linalg.inv(ext[c0])
        ext = rel[None] @ ext
        ctx_i.append(images[[c0, c1]])
        ctx_k.append(intrinsics[[c0, c1]])
        tgt_e.append(ext[tgts])
        tgt_k.append(intrinsics[tgts])
        tgt_im.append(images[tgts])
        nears.append(np.full((n_targets,), 0.1 / scale, np.float32))
        fars.append(np.full((n_targets,), 100.0 / scale, np.float32))
        if points is not None:
            pr = points / scale
            pts_c0 = (rel[:3, :3] @ pr.T).T + rel[:3, 3]
            i, t, m = _sparse_anchor(
                pts_c0.astype(np.float32), ext, intrinsics, c0, c1, hw, k_points
            )
            anc_idx.append(i), anc_tgt.append(t), anc_mask.append(m)
    anchor = None
    if points is not None:
        anchor = {
            "flat_idx": jnp.asarray(np.stack(anc_idx)),
            "target": jnp.asarray(np.stack(anc_tgt)),
            "mask": jnp.asarray(np.stack(anc_mask)),
        }
    return Batch(
        sparse_anchor=anchor,
        context_images=jnp.asarray(np.stack(ctx_i)),
        context_intrinsics=jnp.asarray(np.stack(ctx_k)),
        target_extrinsics=jnp.asarray(np.stack(tgt_e)),
        target_intrinsics=jnp.asarray(np.stack(tgt_k)),
        target_near=jnp.asarray(np.stack(nears)),
        target_far=jnp.asarray(np.stack(fars)),
        style_image=jnp.asarray(
            images[list(style_idx)] if style_idx is not None
            else np.stack(ctx_i)[:, 0]
        ),
        target_images=jnp.asarray(np.stack(tgt_im)),
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene-dir", default="/root/reference/colmap_test_data/scenes/train")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--model", choices=list(MODEL_KWARGS), default="small")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--targets", type=int, default=2, help="target views per sample")
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--warmup", type=int, default=100)
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--eval-gap", type=int, default=5)
    ap.add_argument("--gap-min", type=int, default=3, help="min context half-gap")
    ap.add_argument("--gap-max", type=int, default=12, help="max context half-gap")
    ap.add_argument("--holdout-every", type=int, default=10)
    ap.add_argument("--stage2-steps", type=int, default=0,
                    help="after stage-1, run this many stage-2 (style) steps "
                         "with a FIXED-SEED VGG19 and record the style/"
                         "identity loss series (VERDICT r5 #9)")
    ap.add_argument("--stage2-lr", type=float, default=2e-4)
    ap.add_argument("--vgg-seed", type=int, default=42)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-scratch-init", action="store_true",
                    help="skip scratch_init_heads (reproduces the degenerate "
                         "all-gaussians-at-origin init)")
    ap.add_argument("--pts3d-bound", type=float, default=20.0,
                    help="radial clamp on the pts3d head (models/dpt.py "
                         "reg_dense_pts3d); 0 disables (reference-exact "
                         "unbounded expm1 — diverges from scratch)")
    ap.add_argument("--no-stabilize", action="store_true",
                    help="drop the scratch_stabilizer loss terms "
                         "(train/losses.py) from the stage-1 objective")
    ap.add_argument("--anchor-weight", type=float, default=0.2,
                    help="weight of the COLMAP sparse-point pts3d anchor "
                         "(train/losses.py sparse_anchor_loss); 0 disables. "
                         "Plays the role of the reference's MASt3R warm "
                         "start: the geometric signal scratch training needs")
    ap.add_argument("--k-points", type=int, default=2048,
                    help="anchor points per context view per sample")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--bf16", action="store_true", help="bf16 backbone/head trunks")
    ap.add_argument("--output", default="OVERFIT_r05.json")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from styl3r_tpu.models.styl3r import Batch, Styl3rModel
    from styl3r_tpu.train.step import TrainState, make_optimizer, make_train_step

    images, intrinsics, poses = load_scene(Path(args.scene_dir), args.size)
    n = len(images)
    held = set(range(0, n, args.holdout_every))
    train_frames = [i for i in range(n) if i not in held]
    train_set = set(train_frames)
    print(f"scene: {n} frames, {len(held)} held out, size {args.size}")

    rng = np.random.default_rng(args.seed)

    def sample_train():
        while True:
            g = int(rng.integers(args.gap_min, args.gap_max + 1))
            c0 = int(rng.integers(0, n - 2 * g))
            c1 = c0 + 2 * g
            if c0 not in train_set or c1 not in train_set:
                continue
            between = [t for t in range(c0 + 1, c1) if t in train_set]
            if len(between) < args.targets:
                continue
            tgts = sorted(rng.choice(between, size=args.targets, replace=False).tolist())
            return (c0, c1, tgts)

    # Eval pairs: held-out target, nearest train contexts on each side.
    eval_samples = []
    for t in sorted(held):
        lo = [i for i in range(max(0, t - args.eval_gap - 3), t) if i in train_set]
        hi = [i for i in range(t + 1, min(n, t + args.eval_gap + 4)) if i in train_set]
        if lo and hi:
            eval_samples.append((lo[0], hi[-1], [t] * args.targets))

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = Styl3rModel(
        sh_degree=0, backbone_dtype=dtype, head_trunk_dtype=dtype,
        pts3d_bound=args.pts3d_bound or None,
        **MODEL_KWARGS[args.model],
    )
    hw = (args.size, args.size)
    render_kwargs = dict(
        impl="jnp" if jax.default_backend() == "cpu" else "pallas",
        max_tiles_per_gaussian=8,
        max_per_tile=2048 if args.size >= 256 else 512,
        pair_cap_per_gaussian=4,
    )
    batch0 = make_batch(
        images, intrinsics, poses, [sample_train() for _ in range(args.batch)],
        args.targets, Batch,
    )
    # Without scratch_init_heads, scratch init is degenerate: expm1 pts3d
    # puts every gaussian at the camera origin -> empty renders -> zero color
    # grads (see styl3r_tpu/train/scratch_init.py). It MUST be fused into the
    # jitted init: applying it eagerly (host asarray + eager damp multiplies)
    # produced params that deterministically crashed the axon backend at the
    # first donated-buffer step execution (INTERNAL/FAILED_PRECONDITION),
    # while the same values produced inside one jitted computation run fine.
    from styl3r_tpu.train.scratch_init import scratch_init_heads

    def init_fn(key, batch):
        p = model.init(key, batch)
        return p if args.no_scratch_init else scratch_init_heads(p)

    params = jax.jit(init_fn)(jax.random.key(args.seed), batch0)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"model {args.model}: {n_params/1e6:.1f}M params")
    tx = make_optimizer(
        lr=args.lr, warmup_steps=args.warmup, total_steps=args.steps,
        params=params, backbone_lr_multiplier=1.0,
    )
    state = TrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )
    stage1_loss = None
    if not args.no_stabilize:
        from styl3r_tpu.train.losses import scratch_stabilizer

        def stage1_loss(output, batch, gaussians, global_step=0,
                        identity_output=None):
            mse = jnp.mean((output.color - batch.target_images) ** 2)
            stab, sm = scratch_stabilizer(gaussians)
            return mse + stab, {"mse": mse, **sm}

    step_fn = jax.jit(
        make_train_step(model, tx, hw, stylized=False, loss_fn=stage1_loss,
                        **render_kwargs),
        donate_argnums=(0,),
    )

    def fwd(params, batch):
        _, out = model.forward(params, batch, hw, **render_kwargs)
        return out.color

    fwd_j = jax.jit(fwd)

    def eval_psnr(params):
        psnrs = []
        for s in eval_samples:
            b = make_batch(images, intrinsics, poses, [s], args.targets, Batch)
            pred = np.asarray(fwd_j(params, b), np.float32)
            gt = np.asarray(b.target_images, np.float32)
            mse = float(np.mean((pred[0, 0] - gt[0, 0]) ** 2))
            psnrs.append(-10.0 * np.log10(max(mse, 1e-10)))
        return float(np.mean(psnrs)), float(np.min(psnrs)), float(np.max(psnrs))

    series, evals = [], []

    def write_output(stage2=None, partial=False):
        out = {
            "task": "stage-1 overfit on bundled COLMAP scene, scratch init",
            "scene": str(args.scene_dir),
            "n_frames": n,
            "held_out": len(eval_samples),
            "size": args.size,
            "model": args.model,
            "params_m": round(n_params / 1e6, 2),
            "steps": args.steps,
            "batch": args.batch,
            "targets_per_sample": args.targets,
            "lr": args.lr,
            "pts3d_bound": args.pts3d_bound or None,
            "stabilizer": not args.no_stabilize,
            "backend": jax.default_backend(),
            "series": series,
            "evals": evals,
            "final_psnr": evals[-1]["psnr"] if evals else None,
            "wall_s": round(time.time() - t_start, 1),
        }
        if partial:
            out["partial"] = True
        if stage2 is not None:
            out["stage2"] = stage2
        Path(args.output).write_text(json.dumps(out, indent=1))
        return out

    key = jax.random.key(args.seed + 1)
    t_start = time.time()
    for i in range(args.steps):
        batch = make_batch(
            images, intrinsics, poses,
            [sample_train() for _ in range(args.batch)], args.targets, Batch,
        )
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch, sub)
        if i < 3 or (i + 1) % 25 == 0:
            loss = float(metrics["loss"])  # forces the fetch (axon sync)
            series.append({"step": i + 1, "loss": loss})
            if not np.isfinite(loss):
                print(f"step {i+1}: loss NOT FINITE, aborting")
                break
        if (i + 1) % args.eval_every == 0 or i + 1 == args.steps:
            mean_p, min_p, max_p = eval_psnr(state.params)
            evals.append({"step": i + 1, "psnr": mean_p, "psnr_min": min_p,
                          "psnr_max": max_p})
            print(
                f"step {i+1}: loss {float(metrics['loss']):.5f} "
                f"held-out PSNR {mean_p:.2f} dB (min {min_p:.2f}, max {max_p:.2f}) "
                f"[{time.time()-t_start:.0f}s]", flush=True,
            )
            # Crash insurance: persist the curve-so-far after every eval (the
            # TPU sits behind a tunnel that can drop mid-run).
            write_output(partial=True)

    stage2 = None
    if args.stage2_steps:
        # Stage-2 style training with a DETERMINISTIC (fixed-seed) VGG19:
        # proves the style loss decreases under the stage-2 freeze/lr-group
        # optimizer — random-but-reproducible Gram features are a valid style
        # objective; only the *visual* quality needs trained VGG weights.
        from styl3r_tpu.losses.vgg import VGG19Features
        from styl3r_tpu.train.losses import LossBundle
        from styl3r_tpu.train.step import make_stage2_optimizer

        vgg = VGG19Features()
        vgg_params = vgg.init(
            jax.random.key(args.vgg_seed), jnp.zeros((1, 64, 64, 3))
        )
        bundle = LossBundle(
            mse_weight=1.0, style_weight=10.0, identity=True,
            vgg19_params=vgg_params,
        )
        tx2 = make_stage2_optimizer(
            lr=args.stage2_lr, warmup_steps=min(25, args.stage2_steps // 4),
            total_steps=args.stage2_steps, params=state.params,
        )
        state2 = TrainState(
            params=state.params, opt_state=tx2.init(state.params),
            step=jnp.zeros((), jnp.int32),
        )
        step2_fn = jax.jit(
            make_train_step(
                model, tx2, hw, loss_fn=bundle, stylized=True,
                identity_branch=True, **render_kwargs,
            ),
            donate_argnums=(0,),
        )
        s2_series = []
        t2 = time.time()
        for i in range(args.stage2_steps):
            samples = [sample_train() for _ in range(args.batch)]
            styles = [
                int(rng.choice([f for f in train_frames
                                if f not in (s[0], s[1])]))
                for s in samples
            ]
            batch = make_batch(images, intrinsics, poses, samples,
                               args.targets, Batch, style_idx=styles)
            key, sub = jax.random.split(key)
            state2, m2 = step2_fn(state2, batch, sub)
            if i < 3 or (i + 1) % 5 == 0 or i + 1 == args.stage2_steps:
                rec = {"step": i + 1}
                for k in ("loss", "style", "identity", "mse"):
                    if k in m2:
                        rec[k] = float(m2[k])
                s2_series.append(rec)
                if not np.isfinite(rec["loss"]):
                    print(f"stage2 step {i+1}: loss NOT FINITE, aborting")
                    break
        first_style = next((r["style"] for r in s2_series if "style" in r), None)
        last_style = next(
            (r["style"] for r in reversed(s2_series) if "style" in r), None
        )
        stage2 = {
            "vgg": f"fixed-seed random init (seed {args.vgg_seed})",
            "steps": args.stage2_steps,
            "lr": args.stage2_lr,
            "series": s2_series,
            "style_first": first_style,
            "style_last": last_style,
            "style_decreased": bool(
                first_style is not None and last_style is not None
                and last_style < first_style
            ),
            "wall_s": round(time.time() - t2, 1),
        }
        print(
            f"stage2: style {first_style:.4f} -> {last_style:.4f} "
            f"({'DECREASED' if stage2['style_decreased'] else 'no decrease'}) "
            f"[{stage2['wall_s']:.0f}s]"
        )

    out = write_output(stage2=stage2)
    print(f"wrote {args.output}: final held-out PSNR "
          f"{out['final_psnr'] and round(out['final_psnr'], 2)} dB")


if __name__ == "__main__":
    main()
