"""Batch Tanks&Temples stylization (port of the reference's
infer_model_tnt_batch.py + script/batch_inference.sh): one COLMAP/LLFF scene,
a frame group as context, and a sweep over style images.

Usage:
  python infer_tnt_batch.py --scene-dir <scene> --style-dir <styles> \
      [--frame-ids 0 100 200 300] [--style-ids 0 1 2] [--checkpoint ckpt]
"""

import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--scene-dir", default="/root/reference/colmap_test_data/scenes/train"
    )
    parser.add_argument(
        "--style-dir", default="/root/reference/colmap_test_data/styles"
    )
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--frame-ids", type=int, nargs="*", default=None,
                        help="context frame indices (default: 4 spread)")
    parser.add_argument("--style-ids", type=int, nargs="*", default=[0])
    parser.add_argument("--output", default="outputs/infer_tnt")
    parser.add_argument("--max-targets", type=int, default=4)
    parser.add_argument("--video-frames", type=int, default=0)
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--scale-invariant", action="store_true",
                        help="per-view 1/near rescale before rendering (reference decoder.make_scale_invariant)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from styl3r_tpu.data.colmap import (
        auto_orient_and_center_poses,
        camera_intrinsics_normalized,
        colmap_poses_c2w,
        llff_intrinsics_normalized,
        load_colmap_model,
        read_llff_poses,
    )
    from styl3r_tpu.infer.cli import load_image, load_params, run_scene_inference
    from styl3r_tpu.models.styl3r import Batch, Styl3rModel

    scene_dir = Path(args.scene_dir)
    image_dir = scene_dir / "images"
    photo_paths = sorted(
        p for p in image_dir.iterdir()
        if p.suffix.lower() in (".png", ".jpg", ".jpeg") and p.stem.isdigit()
    )
    sparse = scene_dir / "sparse" / "0"
    if (sparse / "images.bin").exists() or (sparse / "images.txt").exists():
        cameras, col_images = load_colmap_model(sparse)
        poses, names = colmap_poses_c2w(col_images)
        name_to_pose = {n: i for i, n in enumerate(names)}
        photo_paths = [p for p in photo_paths if p.name in name_to_pose]
        poses = poses[[name_to_pose[p.name] for p in photo_paths]]
        cam = cameras[next(iter(cameras))]
        intrinsics = np.tile(camera_intrinsics_normalized(cam), (len(photo_paths), 1, 1))
    else:
        poses_all, hwf, _ = read_llff_poses(scene_dir / "poses_bounds.npy")
        poses = poses_all[: len(photo_paths)]
        intrinsics = llff_intrinsics_normalized(hwf[: len(photo_paths)])
    poses, _ = auto_orient_and_center_poses(poses)
    images = np.stack([load_image(p) for p in photo_paths])

    n = len(images)
    context = args.frame_ids or np.linspace(0, n - 1, 4).round().astype(int).tolist()
    target = [i for i in range(n) if i not in context][: args.max_targets] or context

    styles = sorted(
        p for p in Path(args.style_dir).iterdir()
        if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    )

    tiny = dict(enc_depth=2, dec_depth=4, enc_dim=32, dec_dim=16, enc_heads=2, dec_heads=2)
    model_kwargs = tiny if args.tiny else {}
    model = Styl3rModel(sh_degree=0, **model_kwargs)
    example_batch = Batch(
        context_images=jnp.zeros((1, len(context), 256, 256, 3)),
        context_intrinsics=jnp.zeros((1, len(context), 3, 3)),
        target_extrinsics=jnp.zeros((1, 1, 4, 4)),
        target_intrinsics=jnp.zeros((1, 1, 3, 3)),
        target_near=jnp.zeros((1, 1)),
        target_far=jnp.zeros((1, 1)),
        style_image=jnp.zeros((1, 256, 256, 3)),
    )
    params = load_params(args.checkpoint, model, example_batch)
    render_kwargs = dict(max_per_tile=512, max_tiles_per_gaussian=8) if args.tiny else {}
    render_kwargs["scale_invariant"] = args.scale_invariant

    for sid in args.style_ids:
        style = load_image(styles[sid % len(styles)])
        out_dir = Path(args.output) / f"frames_{'_'.join(map(str, context))}" / f"style_{sid}"
        metrics = run_scene_inference(
            params, images, intrinsics, poses, context, target, style, out_dir,
            video_frames=args.video_frames, render_kwargs=render_kwargs,
            model_kwargs=model_kwargs,
        )
        print(f"style {sid} ({styles[sid % len(styles)].name}): {metrics}")


if __name__ == "__main__":
    main()
