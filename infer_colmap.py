"""In-the-wild inference on a COLMAP-reconstructed scene
(port of the reference's infer_model_colmap.py).

Usage:
  python infer_colmap.py --scene-dir /path/to/scene \
      [--checkpoint re10k_2v.ckpt] [--style path.jpg] \
      [--frames 0 13] [--num-context 2] [--output outputs/colmap]

The scene dir needs images/ and sparse/0/{cameras,images}(.bin|.txt).
Defaults exercise the bundled reference test scene when present.
"""

import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--scene-dir",
        default="/root/reference/colmap_test_data/scenes/train",
        help="COLMAP scene directory (images/ + sparse/0)",
    )
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--style", default=None, help="style image path")
    parser.add_argument("--frames", type=int, nargs="*", default=None,
                        help="context frame indices (default: spread num-context)")
    parser.add_argument("--num-context", type=int, default=2)
    parser.add_argument("--output", default="outputs/infer_colmap")
    parser.add_argument("--align-pose-steps", type=int, default=0)
    parser.add_argument("--video-frames", type=int, default=0)
    parser.add_argument("--tiny", action="store_true", help="tiny trunk (smoke test)")
    parser.add_argument("--max-targets", type=int, default=None)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--scale-invariant", action="store_true",
                        help="per-view 1/near rescale before rendering (reference decoder.make_scale_invariant)")
    args = parser.parse_args(argv)

    import jax

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
    from styl3r_tpu.models.styl3r import Styl3rModel

    scene_dir = Path(args.scene_dir)
    sparse = scene_dir / "sparse" / "0"
    image_dir = scene_dir / "images"
    # Scene photos are numeric frames; style images mixed into images/ are not.
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
        intrinsics = np.tile(camera_intrinsics_normalized(cam), (len(photo_paths), 1, 1))
    elif (scene_dir / "poses_bounds.npy").exists():
        poses_all, hwf, _ = read_llff_poses(scene_dir / "poses_bounds.npy")
        poses = poses_all[: len(photo_paths)]
        intrinsics = llff_intrinsics_normalized(hwf[: len(photo_paths)])
    else:
        raise FileNotFoundError(f"no COLMAP model or poses_bounds.npy in {scene_dir}")
    poses, _ = auto_orient_and_center_poses(poses)
    images = np.stack([load_image(p) for p in photo_paths])

    n = len(images)
    if args.frames:
        context = list(args.frames)
    else:
        context = np.linspace(0, n - 1, args.num_context).round().astype(int).tolist()
    target = [i for i in range(n) if i not in context] or context
    if args.max_targets:
        target = target[: args.max_targets]

    if args.style:
        style = load_image(Path(args.style))
    else:
        default_style = Path("/root/reference/colmap_test_data/styles")
        candidates = sorted(default_style.glob("*")) if default_style.exists() else []
        style = load_image(candidates[0]) if candidates else images[0]

    tiny = dict(enc_depth=2, dec_depth=4, enc_dim=32, dec_dim=16, enc_heads=2, dec_heads=2)
    model_kwargs = tiny if args.tiny else {}
    model = Styl3rModel(sh_degree=0, **model_kwargs)

    from styl3r_tpu.models.styl3r import Batch
    import jax.numpy as jnp

    h, w = 256, 256
    example = Batch(
        context_images=jnp.zeros((1, len(context), h, w, 3)),
        context_intrinsics=jnp.zeros((1, len(context), 3, 3)),
        target_extrinsics=jnp.zeros((1, 1, 4, 4)),
        target_intrinsics=jnp.zeros((1, 1, 3, 3)),
        target_near=jnp.zeros((1, 1)),
        target_far=jnp.zeros((1, 1)),
        style_image=jnp.zeros((1, 256, 256, 3)),
    )
    params = load_params(args.checkpoint, model, example)

    render_kwargs = {"scale_invariant": args.scale_invariant}
    if args.tiny:
        render_kwargs.update(max_per_tile=512, max_tiles_per_gaussian=8)
    metrics = run_scene_inference(
        params, images, intrinsics, poses, context, target, style,
        Path(args.output), image_shape=(h, w),
        align_pose_steps=args.align_pose_steps, video_frames=args.video_frames,
        render_kwargs=render_kwargs, model_kwargs=model_kwargs,
    )
    print(f"wrote {args.output}: {metrics}")


if __name__ == "__main__":
    main()
