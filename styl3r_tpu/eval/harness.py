"""Evaluation harness (reference mode=test).

Equivalent of `ModelWrapperStyle.test_step` + `on_test_end`
(`model_wrapper_style.py:317-469`): iterate the deterministic evaluation
index, predict gaussians with style := context view 0 (identity protocol),
optionally pose-align target cameras, render, compute PSNR/LPIPS/SSIM with
per-overlap-bucket running means, save images, and dump
benchmark.json / peak_memory.json via the Benchmarker.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..infer.pipeline import align_target_poses
from ..models.decoder import render_gaussians
from ..models.styl3r import Batch, Styl3rModel, normalize_images
from .benchmarker import Benchmarker
from .metrics import MetricTracker, compute_psnr, compute_ssim


class EvalHarness:
    def __init__(
        self,
        model: Styl3rModel,
        params,
        image_shape=(256, 256),
        align_pose: bool = False,
        pose_align_steps: int = 100,
        rot_opt_lr: float = 3e-3,
        trans_opt_lr: float = 1e-3,
        lpips_apply=None,
        output_path: Optional[Path] = None,
        save_images: bool = False,
        save_videos: bool = False,
        video_frames: int = 30,
        render_kwargs: Optional[Dict] = None,
    ):
        self.model = model
        self.params = params
        self.image_shape = tuple(image_shape)
        self.align_pose = align_pose
        self.pose_align_steps = pose_align_steps
        self.rot_opt_lr = rot_opt_lr
        self.trans_opt_lr = trans_opt_lr
        self.lpips_apply = lpips_apply
        self.output_path = Path(output_path) if output_path else None
        self.save_images = save_images
        self.save_videos = save_videos
        self.video_frames = video_frames
        self._video_render = None

        self.tracker = MetricTracker()
        self.benchmarker = Benchmarker()
        self.render_kwargs = render_kwargs or {}

        self._predict = jax.jit(
            lambda p, imgs, intr, style: self.model.encoder.apply(
                p, normalize_images(imgs), intr, normalize_images(style)
            )
        )
        rk = dict(self.render_kwargs)
        self._render = jax.jit(
            lambda g, e, k, nr, fr: render_gaussians(
                g, e, k, nr, fr, self.image_shape, **rk
            )
        )
        self._seen_render_shapes = set()

    # Target counts vary across eval-index entries; on the remote-compile
    # backend each distinct (b, t) would cost a 5-25 min first compile. Pad t
    # up to a small bucket set so a full eval sweep compiles <= 2 render
    # graphs (the RE10K protocol uses a fixed 3 targets; odd scenes hit the
    # next bucket).
    T_BUCKETS = (1, 2, 3, 4, 6, 8, 12, 16)

    @classmethod
    def _bucket_t(cls, t: int) -> int:
        for b in cls.T_BUCKETS:
            if t <= b:
                return b
        return -(-t // 8) * 8

    def _render_bucketed(self, gaussians, extrinsics, intrinsics, near, far):
        b, t = extrinsics.shape[:2]
        tb = self._bucket_t(t)
        if (b, tb) not in self._seen_render_shapes:
            self._seen_render_shapes.add((b, tb))
            print(f"[eval] compiling render graph for (b={b}, t_bucket={tb})")
        if tb != t:
            pad = tb - t

            def pad_t(x):
                reps = jnp.concatenate([x, jnp.repeat(x[:, -1:], pad, axis=1)], axis=1)
                return reps

            extrinsics = pad_t(extrinsics)
            intrinsics = pad_t(intrinsics)
            near = pad_t(near)
            far = pad_t(far)
        out = self._render(gaussians, extrinsics, intrinsics, near, far)
        if tb != t:
            out = jax.tree.map(lambda x: x[:, :t], out)
        return out

    def test_step(self, batch: Batch, scene: str = "", overlap: Optional[float] = None):
        """One eval scene; returns (metrics dict, renders)."""
        b, t = batch.target_extrinsics.shape[:2]
        # Identity style protocol (test uses style := context view 0,
        # model_wrapper_style.py:325).
        style = batch.style_image
        if style is None or style.shape[1:3] != batch.context_images.shape[2:4]:
            style = batch.context_images[:, 0]

        # Device timing: each block ends with Benchmarker.sync (host-fetch),
        # and the timer subtracts a calibrated dispatch roundtrip —
        # block_until_ready alone does not wait on the axon remote backend.
        with self.benchmarker.time("encoder"):
            gaussians = self.benchmarker.sync(
                self._predict(
                    self.params, batch.context_images, batch.context_intrinsics, style
                )
            )

        extrinsics = batch.target_extrinsics
        if self.align_pose:
            with self.benchmarker.time("optimize"):
                extrinsics = self.benchmarker.sync(
                    align_target_poses(
                        gaussians, extrinsics, batch.target_intrinsics,
                        batch.target_near, batch.target_far, batch.target_images,
                        self.image_shape, steps=self.pose_align_steps,
                        rot_lr=self.rot_opt_lr, trans_lr=self.trans_opt_lr,
                        **self.render_kwargs,
                    )
                )

        # num_calls = the BUCKETED target count actually rendered (>= t):
        # dividing by the true t would overstate ms/frame for scenes whose
        # target count is not an exact bucket (padding views are real work).
        # `decoder_unpadded` records the same block divided by the TRUE t —
        # the reference benchmarker's per-frame contract (benchmarker.py:22) —
        # so benchmark.json carries both divisors explicitly.
        with self.benchmarker.time("decoder", num_calls=self._bucket_t(t)):
            output = self.benchmarker.sync(
                self._render_bucketed(
                    gaussians, extrinsics, batch.target_intrinsics,
                    batch.target_near, batch.target_far,
                )
            )
        self.benchmarker.record(
            "decoder_unpadded", self.benchmarker.last_elapsed, num_calls=t
        )

        h, w = self.image_shape
        pred = output.color.reshape(b * t, h, w, 3)
        gt = jnp.asarray(batch.target_images).reshape(b * t, h, w, 3)
        metrics = {
            "psnr": float(jnp.mean(compute_psnr(gt, pred))),
            "ssim": float(jnp.mean(compute_ssim(gt, pred))),
        }
        if self.lpips_apply is not None:
            metrics["lpips"] = float(jnp.mean(self.lpips_apply(pred, gt)))
        self.tracker.update(metrics, overlap)

        if self.save_images and self.output_path is not None:
            from PIL import Image

            out_dir = self.output_path / "images" / scene
            out_dir.mkdir(parents=True, exist_ok=True)
            for i in range(b * t):
                arr = (np.clip(np.asarray(pred[i]), 0, 1) * 255).astype(np.uint8)
                Image.fromarray(arr).save(out_dir / f"{i:04d}.png")

        # Per-scene interpolation video between the first and last target
        # cameras (reference test_step's render_video_interpolation path).
        if self.save_videos and self.output_path is not None and t >= 2:
            from ..infer.cli import save_video
            from ..infer.trajectory import interpolate_extrinsics, interpolate_intrinsics

            s = np.linspace(0.0, 1.0, self.video_frames)
            ext = interpolate_extrinsics(
                np.asarray(extrinsics[0, 0]), np.asarray(extrinsics[0, -1]), s
            )[None]
            intr = interpolate_intrinsics(
                np.asarray(batch.target_intrinsics[0, 0]),
                np.asarray(batch.target_intrinsics[0, -1]), s,
            )[None]
            if self._video_render is None:
                nf = self.video_frames
                self._video_render = jax.jit(
                    lambda g, e, k, nr, fr: render_gaussians(
                        g, e, k, nr, fr, self.image_shape, **self.render_kwargs
                    )
                )
            traj = self._video_render(
                jax.tree.map(lambda x: x[:1], gaussians),
                jnp.asarray(ext), jnp.asarray(intr),
                jnp.broadcast_to(batch.target_near[:1, :1], (1, len(s))),
                jnp.broadcast_to(batch.target_far[:1, :1], (1, len(s))),
            )
            save_video(
                self.output_path / "videos" / f"{scene or 'scene'}",
                np.asarray(traj.color[0]),
            )
        return metrics, output

    def finish(self) -> Dict[str, float]:
        """Dump tables + benchmark artifacts; returns overall means."""
        print(self.tracker.table(), flush=True)
        if self.output_path is not None:
            self.output_path.mkdir(parents=True, exist_ok=True)
            with (self.output_path / "scores.json").open("w") as f:
                json.dump(self.tracker.means(), f, indent=2)
            self.benchmarker.dump(self.output_path / "benchmark.json")
            self.benchmarker.dump_memory(self.output_path / "peak_memory.json")
        return self.tracker.means()
