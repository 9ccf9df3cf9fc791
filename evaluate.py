"""Evaluation entry point (reference mode=test + src/scripts/compute_metrics.py).

Runs the deterministic eval protocol over a dataset config: predict with the
identity style, optionally pose-align, render targets, report
PSNR/LPIPS/SSIM per overlap bucket, dump scores.json / benchmark.json /
peak_memory.json.

Usage:
  python evaluate.py --config configs/experiment/re10k_eval.yaml \
      [--checkpoint ckpt] [--max-scenes N] [key=value ...]
"""

import argparse
from pathlib import Path


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/experiment/re10k_eval.yaml")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--max-scenes", type=int, default=None)
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from styl3r_tpu.data.dataset import batch_iterator
    from styl3r_tpu.eval.harness import EvalHarness
    from styl3r_tpu.infer.cli import load_params
    from styl3r_tpu.models.styl3r import Batch, Styl3rModel
    from styl3r_tpu.train.trainer import build_datasets
    from styl3r_tpu.utils.config import load_config

    cfg = load_config(args.config, args.overrides)
    datasets = build_datasets(cfg, "test", cfg.seed, lambda: 0)

    tiny = dict(enc_depth=2, dec_depth=4, enc_dim=32, dec_dim=16, enc_heads=2, dec_heads=2)
    model_kwargs = tiny if args.tiny else {}
    model = Styl3rModel(sh_degree=cfg.model.encoder.sh_degree, **model_kwargs)

    h, w = cfg.datasets[0].input_image_shape
    example_batch = Batch(
        context_images=jnp.zeros((1, cfg.datasets[0].view_sampler.num_context_views, h, w, 3)),
        context_intrinsics=jnp.zeros((1, cfg.datasets[0].view_sampler.num_context_views, 3, 3)),
        target_extrinsics=jnp.zeros((1, 1, 4, 4)),
        target_intrinsics=jnp.zeros((1, 1, 3, 3)),
        target_near=jnp.zeros((1, 1)),
        target_far=jnp.zeros((1, 1)),
        style_image=jnp.zeros((1, h, w, 3)),
    )
    params = load_params(args.checkpoint, model, example_batch)

    render_kwargs = dict(max_per_tile=512, max_tiles_per_gaussian=8) if args.tiny else {}
    render_kwargs["scale_invariant"] = cfg.model.decoder.make_scale_invariant
    if jax.default_backend() != "cpu":
        render_kwargs.setdefault("impl", "pallas")

    # LPIPS is part of the headline eval protocol (model_wrapper_style.py:399)
    # — construct it whenever weights are configured.
    lpips_apply = None
    if cfg.losses.lpips_weights and cfg.losses.lpips_vgg16_weights:
        from styl3r_tpu.losses.lpips import LPIPSVgg16
        from styl3r_tpu.losses.lpips import convert_lpips_state
        from styl3r_tpu.utils.checkpoint import load_torch_state_dict

        lpips_params = jax.tree.map(
            jnp.asarray,
            convert_lpips_state(
                load_torch_state_dict(cfg.losses.lpips_weights),
                load_torch_state_dict(cfg.losses.lpips_vgg16_weights),
            ),
        )
        lpips_model = LPIPSVgg16()
        lpips_apply = jax.jit(lambda x, y: lpips_model.apply(lpips_params, x, y))
        print("LPIPS enabled")
    else:
        print("LPIPS weights not configured (losses.lpips_weights + "
              "losses.lpips_vgg16_weights) — scores.json will omit lpips")

    harness = EvalHarness(
        model, params, image_shape=(h, w),
        align_pose=cfg.test.align_pose, pose_align_steps=cfg.test.pose_align_steps,
        rot_opt_lr=cfg.test.rot_opt_lr, trans_opt_lr=cfg.test.trans_opt_lr,
        lpips_apply=lpips_apply,
        output_path=Path(cfg.test.output_path), save_images=cfg.test.save_image,
        save_videos=cfg.test.save_video,
        render_kwargs=render_kwargs,
    )

    n_scenes = 0
    for ds in datasets:
        for example in ds:
            batch = Batch(
                context_images=jnp.asarray(example.context.image)[None],
                context_intrinsics=jnp.asarray(example.context.intrinsics)[None],
                target_extrinsics=jnp.asarray(example.target.extrinsics)[None],
                target_intrinsics=jnp.asarray(example.target.intrinsics)[None],
                target_near=jnp.asarray(example.target.near)[None],
                target_far=jnp.asarray(example.target.far)[None],
                style_image=jnp.asarray(example.context.image[0])[None],
                target_images=jnp.asarray(example.target.image)[None],
            )
            overlap = float(example.context.overlap[0]) if example.context.overlap is not None else None
            metrics, _ = harness.test_step(batch, example.scene, overlap)
            n_scenes += 1
            if n_scenes % 25 == 0:
                print(f"{n_scenes} scenes...", flush=True)
            if args.max_scenes and n_scenes >= args.max_scenes:
                break
        if args.max_scenes and n_scenes >= args.max_scenes:
            break

    means = harness.finish()
    print(f"evaluated {n_scenes} scenes -> {cfg.test.output_path}")
    return means


if __name__ == "__main__":
    main()
