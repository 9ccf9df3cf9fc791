"""Two-view pose accuracy evaluation (port of the reference's src/eval_pose.py
+ PoseEvaluator): for each eval scene, predict gaussians from 2 context views,
PnP-initialize the second camera from the predicted means, refine it
photometrically, and report rotation/translation AUC@{5,10,20} per overlap
bucket.

Usage:
  python eval_pose.py --config configs/experiment/re10k_eval.yaml \
      [--checkpoint ckpt] [--max-scenes N] [key=value ...]
"""

import argparse
from pathlib import Path


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/experiment/re10k_eval.yaml")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--max-scenes", type=int, default=None)
    parser.add_argument("--refine-steps", type=int, default=200)
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from styl3r_tpu.eval.pose import (
        pnp_pose_from_gaussians,
        pose_auc,
        pose_error_deg,
        refine_pose_photometric,
    )
    from styl3r_tpu.infer.cli import load_params
    from styl3r_tpu.models.styl3r import Batch, Styl3rModel, normalize_images
    from styl3r_tpu.train.trainer import build_datasets
    from styl3r_tpu.utils.config import load_config

    cfg = load_config(args.config, args.overrides)
    datasets = build_datasets(cfg, "test", cfg.seed, lambda: 0)

    tiny = dict(enc_depth=2, dec_depth=4, enc_dim=32, dec_dim=16, enc_heads=2, dec_heads=2)
    model_kwargs = tiny if args.tiny else {}
    model = Styl3rModel(sh_degree=cfg.model.encoder.sh_degree, **model_kwargs)

    h, w = cfg.datasets[0].input_image_shape
    v = cfg.datasets[0].view_sampler.num_context_views
    example_batch = Batch(
        context_images=jnp.zeros((1, v, h, w, 3)),
        context_intrinsics=jnp.zeros((1, v, 3, 3)),
        target_extrinsics=jnp.zeros((1, 1, 4, 4)),
        target_intrinsics=jnp.zeros((1, 1, 3, 3)),
        target_near=jnp.zeros((1, 1)),
        target_far=jnp.zeros((1, 1)),
        style_image=jnp.zeros((1, h, w, 3)),
    )
    params = load_params(args.checkpoint, model, example_batch)
    render_kwargs = dict(max_per_tile=512, max_tiles_per_gaussian=8) if args.tiny else {}

    predict = jax.jit(
        lambda p, imgs, intr, style: model.encoder.apply(
            p, normalize_images(imgs), intr, normalize_images(style), return_aux=True
        )
    )

    errors = []
    n_scenes = 0
    for ds in datasets:
        for ex in ds:
            imgs = jnp.asarray(ex.context.image)[None]
            intr = jnp.asarray(ex.context.intrinsics)[None]
            gaussians, aux = predict(params, imgs, intr, imgs[:, 0])

            # PnP from the predicted pts3d of the *second* context view.
            pts3d = np.asarray(aux["pts3d"][0, 1])
            opac = np.asarray(aux["densities"][0, 1])
            pose0 = pnp_pose_from_gaussians(pts3d, opac, ex.context.intrinsics[1])

            refined = refine_pose_photometric(
                gaussians, jnp.asarray(pose0), intr[0, 1],
                jnp.asarray(ex.context.image[1]),
                float(ex.context.near[1]), float(ex.context.far[1]),
                steps=args.refine_steps, **render_kwargs,
            )
            gt = ex.context.extrinsics[1]
            r_err, t_err = pose_error_deg(np.asarray(refined), gt)
            errors.append(max(r_err, t_err))
            n_scenes += 1
            print(
                f"{ex.scene}: R={r_err:.2f}deg t={t_err:.2f}deg", flush=True
            )
            if args.max_scenes and n_scenes >= args.max_scenes:
                break
        if args.max_scenes and n_scenes >= args.max_scenes:
            break

    aucs = pose_auc(errors)
    print(f"pose AUC over {n_scenes} scenes: " + ", ".join(
        f"@{t}={v:.4f}" for t, v in aucs.items()
    ))
    return aucs


if __name__ == "__main__":
    main()
