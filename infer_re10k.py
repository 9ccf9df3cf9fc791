"""Single-scene RE10K inference (port of the reference's infer_model_re10k.py).

Usage:
  python infer_re10k.py --data-root datasets/re10k --scene <key> \
      [--checkpoint re10k_2v.ckpt] [--style path.jpg] [--num-context 2] \
      [--eval-index assets/evaluation_index_re10k.json] [--output outputs/re10k]
"""

import argparse
import json
from pathlib import Path

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-root", required=True, help="chunked RE10K root")
    parser.add_argument("--stage", default="test")
    parser.add_argument("--scene", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--style", default=None)
    parser.add_argument("--num-context", type=int, default=2)
    parser.add_argument("--eval-index", default=None,
                        help="evaluation index json for deterministic views")
    parser.add_argument("--output", default="outputs/infer_re10k")
    parser.add_argument("--align-pose-steps", type=int, default=0)
    parser.add_argument("--video-frames", type=int, default=60)
    parser.add_argument("--max-targets", type=int, default=None)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--scale-invariant", action="store_true",
                        help="per-view 1/near rescale before rendering (reference decoder.make_scale_invariant)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from styl3r_tpu.data.chunks import convert_poses_re10k, decode_jpeg, load_chunk, load_index
    from styl3r_tpu.infer.cli import load_image, load_params, run_scene_inference
    from styl3r_tpu.models.styl3r import Batch, Styl3rModel

    # Locate + load the scene from its chunk (infer_model_re10k.py:336-365).
    index = load_index(Path(args.data_root), args.stage)
    if args.scene not in index:
        raise SystemExit(f"scene {args.scene} not in index ({len(index)} scenes)")
    chunk = load_chunk(index[args.scene])
    example = next(ex for ex in chunk if ex["key"] == args.scene)
    extrinsics, intrinsics = convert_poses_re10k(example["cameras"])
    n = len(extrinsics)

    if args.eval_index:
        with open(args.eval_index) as f:
            eval_index = json.load(f)
        entry = eval_index.get(args.scene)
        if entry is None:
            raise SystemExit(f"scene {args.scene} has no eval-index entry")
        context = list(entry["context"])
        target = list(entry["target"])
    else:
        context = np.linspace(0, n - 1, args.num_context).round().astype(int).tolist()
        target = [i for i in range(n) if i not in context]
    if args.max_targets:
        target = target[: args.max_targets]

    images = np.stack([decode_jpeg(b) for b in example["images"]])

    style = load_image(Path(args.style)) if args.style else images[context[0]]

    tiny = dict(enc_depth=2, dec_depth=4, enc_dim=32, dec_dim=16, enc_heads=2, dec_heads=2)
    model_kwargs = tiny if args.tiny else {}
    model = Styl3rModel(sh_degree=0, **model_kwargs)
    hw = args.size
    example_batch = Batch(
        context_images=jnp.zeros((1, len(context), hw, hw, 3)),
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
    metrics = run_scene_inference(
        params, images, intrinsics, extrinsics, context, target, style,
        Path(args.output) / args.scene, image_shape=(hw, hw),
        align_pose_steps=args.align_pose_steps,
        video_frames=args.video_frames, render_kwargs=render_kwargs,
        model_kwargs=model_kwargs,
    )
    print(f"wrote {args.output}/{args.scene}: {metrics}")


if __name__ == "__main__":
    main()
