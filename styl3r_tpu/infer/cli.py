"""Shared machinery for the standalone inference CLIs
(infer_re10k.py / infer_colmap.py / infer_tnt_batch.py), porting the common
flow of the reference's infer_model_* scripts: assemble an unposed context
batch from raw data, predict normal + stylized gaussians, optionally
pose-align target cameras, render views and an interpolation video, export
PLYs.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.shims import prepare_style_image, rescale_and_crop
from ..geometry.se3 import camera_normalization
from ..models.styl3r import Styl3rModel
from .pipeline import InferencePipeline, align_target_poses


def load_image(path: Path) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as img:
        return np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0


def save_image(path: Path, image: np.ndarray) -> None:
    from PIL import Image

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray((np.clip(image, 0, 1) * 255).astype(np.uint8)).save(path)


def save_video(path: Path, frames: np.ndarray, fps: int = 30) -> None:
    """PNG frame sequence + mp4 when ffmpeg is on PATH."""
    import shutil
    import subprocess

    path = Path(path)
    frames_dir = path.with_suffix("")
    frames_dir.mkdir(parents=True, exist_ok=True)
    for i, frame in enumerate(frames):
        save_image(frames_dir / f"{i:04d}.png", frame)
    if shutil.which("ffmpeg"):
        subprocess.run(
            [
                "ffmpeg", "-y", "-loglevel", "error", "-framerate", str(fps),
                "-i", str(frames_dir / "%04d.png"), "-pix_fmt", "yuv420p",
                str(path.with_suffix(".mp4")),
            ],
            check=False,
        )


def make_baseline_one(
    extrinsics: np.ndarray, context_indices: Sequence[int],
    near: float = 0.1, far: float = 100.0,
) -> Tuple[np.ndarray, float, float, float]:
    """Rescale world so the first->last context baseline is 1
    (infer_model_re10k.py:402-412); returns (extrinsics, scale, near, far)."""
    a = extrinsics[context_indices[0], :3, 3]
    b = extrinsics[context_indices[-1], :3, 3]
    scale = float(np.linalg.norm(a - b))
    if scale < 1e-8:
        scale = 1.0
    out = extrinsics.copy()
    out[:, :3, 3] /= scale
    return out, scale, near / scale, far / scale


def normalize_to_first_context(
    extrinsics: np.ndarray, context_indices: Sequence[int]
) -> np.ndarray:
    pivot = extrinsics[context_indices[0]]
    return np.asarray(
        camera_normalization(jnp.asarray(pivot), jnp.asarray(extrinsics))
    )


def load_params(
    checkpoint: Optional[str], model: Styl3rModel, example_batch, seed: int = 0
):
    """Load params from a torch .ckpt/.pth, an orbax dir, or random init."""
    if checkpoint is None:
        print("WARNING: no checkpoint given; using random init")
        return jax.jit(model.init)(jax.random.key(seed), example_batch)
    path = Path(checkpoint)
    if path.is_dir():  # orbax
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(path.absolute())
        # Trainer.save_checkpoint(full=True) wraps params with opt_state/step;
        # unwrap so model.apply sees a bare params tree (mirrors
        # Trainer.load_params_lazy).
        if isinstance(restored, dict) and "opt_state" in restored:
            restored = restored["params"]
        return restored
    from ..utils.checkpoint import convert_styl3r_encoder, load_torch_state_dict

    sd = load_torch_state_dict(str(path))
    return jax.tree.map(jnp.asarray, convert_styl3r_encoder(sd))


def run_scene_inference(
    params,
    images: np.ndarray,  # (n, h, w, 3) full scene frames in [0, 1]
    intrinsics: np.ndarray,  # (n, 3, 3) normalized
    extrinsics: np.ndarray,  # (n, 4, 4) c2w
    context_indices: Sequence[int],
    target_indices: Sequence[int],
    style_image: np.ndarray,  # (hs, ws, 3) [0, 1]
    output_dir: Path,
    image_shape: Tuple[int, int] = (256, 256),
    sh_degree: int = 0,
    align_pose_steps: int = 0,
    video_frames: int = 60,
    render_kwargs: Optional[dict] = None,
    model_kwargs: Optional[dict] = None,
) -> dict:
    """The full single-scene flow (infer_model_re10k.py:262-560)."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    render_kwargs = dict(render_kwargs or {})
    # Full-size scenes need bounded caps, and on TPU the Pallas kernels:
    # differentiating the pure-XLA compositor at 131k+ gaussians materializes
    # tens of GB of scan intermediates (OOM on a 16G chip); the kernel VJP
    # keeps pose alignment in-memory.
    render_kwargs.setdefault("max_per_tile", 2048)
    render_kwargs.setdefault("max_tiles_per_gaussian", 8)
    if jax.default_backend() != "cpu":
        render_kwargs.setdefault("impl", "pallas")

    # Condition cameras: baseline-1 + relative to context cam 0.
    extrinsics, scale, near, far = make_baseline_one(extrinsics, context_indices)
    extrinsics = normalize_to_first_context(extrinsics, context_indices)

    # Crop/resize to the model resolution with intrinsics fixup.
    ctx_imgs, ctx_k = rescale_and_crop(
        images[list(context_indices)], intrinsics[list(context_indices)], image_shape
    )
    tgt_imgs, tgt_k = rescale_and_crop(
        images[list(target_indices)], intrinsics[list(target_indices)], image_shape
    )
    style = prepare_style_image(style_image, 256, "test")

    pipeline = InferencePipeline(
        params, sh_degree=sh_degree, image_shape=image_shape, **(model_kwargs or {})
    )

    ctx = jnp.asarray(ctx_imgs)[None]
    ctx_k_j = jnp.asarray(ctx_k)[None]
    # Normal (un-stylized) + stylized gaussians in two forward passes.
    gaussians = pipeline.predict_gaussians(ctx, ctx_k_j, None)
    stylized = pipeline.predict_gaussians(ctx, ctx_k_j, jnp.asarray(style)[None])

    t = len(target_indices)
    tgt_ext = jnp.asarray(extrinsics[list(target_indices)])[None]
    tgt_k_j = jnp.asarray(tgt_k)[None]
    near_arr = jnp.full((1, t), near)
    far_arr = jnp.full((1, t), far)

    if align_pose_steps > 0:
        tgt_ext = align_target_poses(
            gaussians, tgt_ext, tgt_k_j, near_arr, far_arr,
            jnp.asarray(tgt_imgs)[None], image_shape, steps=align_pose_steps,
            **render_kwargs,
        )

    out = pipeline.render(gaussians, tgt_ext, tgt_k_j, near_arr, far_arr, **render_kwargs)
    out_sty = pipeline.render(stylized, tgt_ext, tgt_k_j, near_arr, far_arr, **render_kwargs)

    # Save artifacts.
    save_image(output_dir / "style.png", style)
    for i, idx in enumerate(context_indices):
        save_image(output_dir / f"context_{idx:04d}.png", ctx_imgs[i])
    for i, idx in enumerate(target_indices):
        save_image(output_dir / f"target_gt_{idx:04d}.png", tgt_imgs[i])
        save_image(output_dir / f"color_{idx:04d}.png", np.asarray(out.color[0, i]))
        save_image(
            output_dir / f"stylized_color_{idx:04d}.png", np.asarray(out_sty.color[0, i])
        )

    if video_frames > 0:
        ctx_ext = extrinsics[list(context_indices)]
        video = pipeline.render_trajectory_video(
            stylized, ctx_ext[0], ctx_ext[-1], tgt_k[0], near, far, video_frames
        )
        save_video(output_dir / "interpolation", video)

    pipeline.export_ply(gaussians, output_dir / "gaussians.ply")
    pipeline.export_ply(stylized, output_dir / "gaussians_stylized.ply")

    from ..eval.metrics import compute_psnr

    psnr = float(
        jnp.mean(compute_psnr(jnp.asarray(tgt_imgs), out.color[0]))
    )
    metrics = {"psnr_unstylized": psnr, "scale": scale}
    with (output_dir / "info.json").open("w") as f:
        json.dump(metrics, f, indent=2)
    return metrics
