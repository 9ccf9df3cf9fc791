"""Training driver.

Replaces the reference's Lightning runtime (`src/main_style.py` +
`ModelWrapperStyle`): builds the model/datasets/losses from a RootCfg, runs
the jitted data-parallel train step over a device mesh, logs scalar metrics,
periodically validates (PSNR/SSIM + comparison PNGs), and checkpoints with
orbax. Multi-dataset configs interleave loaders round-robin (the reference
concatenates one batch per loader each step; round-robin keeps shapes static
per step while preserving the mixing ratio).
"""

from __future__ import annotations

import itertools
import json
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import DatasetConfig, RE10kStyleDataset, make_view_sampler
from ..data.dataset import batch_iterator
from ..eval.metrics import compute_psnr, compute_ssim
from ..models.decoder import render_gaussians
from ..models.styl3r import Batch, Styl3rModel
from ..parallel import batch_sharding, make_mesh, replicated_sharding, shard_batch
from ..utils.config import RootCfg
from .losses import LossBundle
from .step import (
    TrainState,
    create_train_state,
    make_optimizer,
    make_stage2_optimizer,
    make_train_step,
)


class LocalLogger:
    """JSONL scalar log + PNG image dumps (reference misc/LocalLogger.py)."""

    def __init__(self, output_dir: Path):
        self.dir = Path(output_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.scalar_file = (self.dir / "metrics.jsonl").open("a")

    def log_scalars(self, step: int, metrics: Dict[str, float]):
        record = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        self.scalar_file.write(json.dumps(record) + "\n")
        self.scalar_file.flush()

    def log_image(self, step: int, name: str, image: np.ndarray):
        from PIL import Image

        img_dir = self.dir / name
        img_dir.mkdir(parents=True, exist_ok=True)
        arr = (np.clip(image, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{step:0>8}.png")

    def log_video(self, step: int, name: str, frames: np.ndarray, fps: int = 10):
        """(t, h, w, 3) float frames -> PNG sequence + mp4 when ffmpeg exists
        (reference wandb video logging, model_wrapper_style.py:544-629)."""
        from ..infer.cli import save_video

        save_video(self.dir / name / f"{step:0>8}", np.asarray(frames), fps=fps)


class WandbLogger(LocalLogger):
    """Optional Weights & Biases logging on top of the local logger
    (reference main_style.py:61-77 WandbLogger-or-LocalLogger)."""

    def __init__(self, output_dir: Path, project: str = "styl3r_tpu", name: str = ""):
        super().__init__(output_dir)
        import wandb  # raises if not installed; caller falls back to LocalLogger

        self._wandb = wandb
        self._run = wandb.init(project=project, name=name or None, dir=str(output_dir))

    def log_scalars(self, step: int, metrics: Dict[str, float]):
        super().log_scalars(step, metrics)
        self._wandb.log({k: float(v) for k, v in metrics.items()}, step=step)

    def log_image(self, step: int, name: str, image: np.ndarray):
        super().log_image(step, name, image)
        self._wandb.log({name: self._wandb.Image(np.clip(image, 0, 1))}, step=step)

    def log_video(self, step: int, name: str, frames: np.ndarray, fps: int = 10):
        super().log_video(step, name, frames, fps=fps)
        arr = (np.clip(np.asarray(frames), 0, 1) * 255).astype(np.uint8)
        self._wandb.log(
            {name: self._wandb.Video(arr.transpose(0, 3, 1, 2), fps=fps)}, step=step
        )


def make_logger(output_dir: Path, use_wandb: bool = False, **kwargs) -> LocalLogger:
    if use_wandb:
        try:
            return WandbLogger(output_dir, **kwargs)
        except Exception as exc:  # wandb missing or offline
            print(f"wandb unavailable ({exc}); falling back to LocalLogger")
    return LocalLogger(output_dir)


def build_datasets(cfg: RootCfg, stage: str, seed: int, step_fn) -> List:
    datasets = []
    for ds_cfg in cfg.datasets:
        sampler_cfg = ds_cfg.view_sampler
        if sampler_cfg.name == "bounded":
            sampler = make_view_sampler(
                "bounded",
                num_context_views=sampler_cfg.num_context_views,
                num_target_views=sampler_cfg.num_target_views,
                min_gap=sampler_cfg.min_gap,
                max_gap=sampler_cfg.max_gap,
                warm_up_steps=sampler_cfg.warm_up_steps,
                initial_min_gap=sampler_cfg.initial_min_gap,
                initial_max_gap=sampler_cfg.initial_max_gap,
                stage=stage,
            )
        elif sampler_cfg.name == "evaluation":
            sampler = make_view_sampler(
                "evaluation",
                index_path=Path(sampler_cfg.index_path),
                num_context_views=sampler_cfg.num_context_views,
            )
        else:
            sampler = make_view_sampler(
                sampler_cfg.name,
                num_context_views=sampler_cfg.num_context_views,
                num_target_views=sampler_cfg.num_target_views,
            )
        datasets.append(
            RE10kStyleDataset(
                DatasetConfig(
                    roots=[Path(r) for r in ds_cfg.roots],
                    style_root=Path(ds_cfg.style_root) if ds_cfg.style_root else None,
                    input_image_shape=tuple(ds_cfg.input_image_shape),
                    original_image_shape=tuple(ds_cfg.original_image_shape),
                    baseline_min=ds_cfg.baseline_min,
                    baseline_max=ds_cfg.baseline_max,
                    max_fov=ds_cfg.max_fov,
                    make_baseline_1=ds_cfg.make_baseline_1,
                    relative_pose=ds_cfg.relative_pose,
                    augment=ds_cfg.augment and stage == "train",
                    overfit_to_scene=ds_cfg.overfit_to_scene,
                ),
                stage,
                sampler,
                seed=seed,
                step_fn=step_fn,
            )
        )
    return datasets


def endless_batches(make_iter, n_datasets: int) -> Iterator:
    """Infinite epoch-restarting stream over all datasets."""
    while True:
        iters = [make_iter(i) for i in range(n_datasets)]
        exhausted = [False] * n_datasets
        while not all(exhausted):
            for i, it in enumerate(iters):
                if exhausted[i]:
                    continue
                try:
                    yield next(it)
                except StopIteration:
                    exhausted[i] = True


class Trainer:
    def __init__(
        self,
        cfg: RootCfg,
        loss_bundle: Optional[LossBundle] = None,
        teacher=None,
        model: Optional[Styl3rModel] = None,
    ):
        self.cfg = cfg
        self.model = model or Styl3rModel(
            sh_degree=cfg.model.encoder.sh_degree,
            backbone_dtype=jnp.bfloat16
            if cfg.model.encoder.backbone_dtype == "bfloat16"
            else jnp.float32,
        )
        self.loss_bundle = loss_bundle or self._build_loss_bundle(cfg)
        self.distill, self.teacher_params = self._build_distiller(cfg, teacher)
        self.mesh = make_mesh()
        self.output_dir = Path(cfg.checkpointing.output_dir)
        wandb_cfg = getattr(cfg, "wandb", None)
        self.logger = make_logger(
            self.output_dir,
            use_wandb=bool(wandb_cfg) and wandb_cfg.mode != "disabled",
            **(
                dict(project=wandb_cfg.project, name=wandb_cfg.name)
                if wandb_cfg and wandb_cfg.mode != "disabled"
                else {}
            ),
        )
        self._global_step = 0

    def _build_loss_bundle(self, cfg: RootCfg) -> LossBundle:
        """Assemble the loss set with real perceptual-net weights when paths
        are configured (reference get_losses + the torchvision/lpips weights
        it implicitly downloads). Without paths, the nets are randomly
        initialized with a loud warning so the training path stays launchable
        in weightless environments (the loss is then not the reference loss)."""
        vgg_params = None
        if bool(cfg.losses.style) or cfg.losses.identity:
            from ..losses.vgg import VGG19Features, convert_torchvision_vgg19

            if cfg.losses.vgg19_weights:
                from ..utils.checkpoint import load_torch_state_dict

                vgg_params = convert_torchvision_vgg19(
                    load_torch_state_dict(cfg.losses.vgg19_weights)
                )
            else:
                print(
                    "WARNING: style/identity loss configured without "
                    "losses.vgg19_weights — using a RANDOMLY INITIALIZED "
                    "VGG19 (not the reference loss)."
                )
                vgg_params = VGG19Features().init(
                    jax.random.key(0), jnp.zeros((1, 64, 64, 3))
                )
        lpips_params = None
        if cfg.losses.lpips:
            from ..losses.lpips import LPIPSVgg16, convert_lpips_state

            if cfg.losses.lpips_weights and cfg.losses.lpips_vgg16_weights:
                from ..utils.checkpoint import load_torch_state_dict

                lpips_params = convert_lpips_state(
                    load_torch_state_dict(cfg.losses.lpips_weights),
                    load_torch_state_dict(cfg.losses.lpips_vgg16_weights),
                )
            else:
                print(
                    "WARNING: lpips loss configured without losses.lpips_weights"
                    " + losses.lpips_vgg16_weights — using a RANDOMLY "
                    "INITIALIZED LPIPS net (not the reference loss)."
                )
                lpips_params = LPIPSVgg16().init(
                    jax.random.key(1),
                    jnp.zeros((1, 64, 64, 3)),
                    jnp.zeros((1, 64, 64, 3)),
                )
        return LossBundle(
            mse_weight=cfg.losses.mse,
            lpips_weight=cfg.losses.lpips,
            lpips_apply_after_step=cfg.losses.lpips_apply_after_step,
            style_weight=cfg.losses.style,
            identity=cfg.losses.identity,
            vgg19_params=vgg_params,
            lpips_params=lpips_params,
        )

    def _build_distiller(self, cfg: RootCfg, teacher):
        """Frozen DUSt3R/MASt3R teacher + DistillCfg when configured
        (main_style.py:122-125 get_distiller + model_wrapper_style.py:95-100).
        `teacher` may be injected (tests use tiny dims); weights load from
        cfg.train.distiller, else random init with a warning."""
        from .step import DistillCfg

        enabled = bool(cfg.train.distiller) or bool(cfg.losses.distill) or (
            teacher is not None
        )
        if not enabled:
            return None, None
        if teacher is None:
            from ..models.distiller import Dust3RTeacher

            teacher = Dust3RTeacher()
        teacher_params = None
        if cfg.train.distiller:
            from ..models.distiller import convert_dust3r_checkpoint
            from ..utils.checkpoint import load_torch_state_dict

            teacher_params = jax.tree.map(
                jnp.asarray,
                convert_dust3r_checkpoint(load_torch_state_dict(cfg.train.distiller)),
            )
        else:
            print(
                "WARNING: distillation enabled without train.distiller weights"
                " — teacher will be RANDOMLY INITIALIZED (pseudo-GT is noise)."
            )
        distill = DistillCfg(
            teacher=teacher,
            weight=cfg.losses.distill or 0.1,
            max_steps=cfg.train.distill_max_steps,
            distill_only=cfg.train.distill_only,
        )
        return distill, teacher_params

    # -- checkpointing ----------------------------------------------------

    def save_checkpoint(
        self, state: TrainState, path: Optional[Path] = None, full: bool = True
    ):
        """Save params (+ optimizer state and step when `full`, the reference
        main.py resume contract) as one orbax checkpoint."""
        import orbax.checkpoint as ocp

        path = Path(path or self.output_dir / "checkpoints" / f"step_{int(state.step)}")
        path.parent.mkdir(parents=True, exist_ok=True)
        ckptr = ocp.StandardCheckpointer()
        payload = (
            {
                "params": state.params,
                "opt_state": state.opt_state,
                "step": state.step,
            }
            if full
            else state.params
        )
        ckptr.save(path.absolute(), jax.device_get(payload))
        ckptr.wait_until_finished()
        self._prune_checkpoints(path.parent)

    def _prune_checkpoints(self, ckpt_dir: Path):
        """Keep the newest `checkpointing.save_top_k` periodic checkpoints
        (-1 keeps all — reference ModelCheckpoint save_top_k on the
        monotonically increasing global_step monitor, main_style.py:80-90)."""
        import shutil

        k = self.cfg.checkpointing.save_top_k
        if k is None or k < 0:
            return
        steps = sorted(
            (d for d in Path(ckpt_dir).glob("step_*") if d.is_dir()),
            key=lambda d: int(d.name.split("_")[1]),
        )
        for stale in steps[:-k] if k else steps:
            shutil.rmtree(stale, ignore_errors=True)

    def load_params(self, path: Path, like):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(Path(path).absolute(), target=jax.device_get(like))

    def load_params_lazy(self, path: Path):
        """Restore a params pytree without a target template. Full-state
        checkpoints (params + opt_state + step) yield just the params here;
        use restore_state for a true resume."""
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(Path(path).absolute())
        if isinstance(restored, dict) and "opt_state" in restored:
            return restored["params"]
        return restored

    def restore_state(self, path: Path, like: TrainState) -> TrainState:
        """True resume: restore params + optimizer state + step against the
        freshly-initialized TrainState template (same optimizer config).

        Each leaf is restored straight onto the TEMPLATE's sharding (orbax
        abstract-array targets), so a DDP-replicated or tensor-parallel state
        resumes onto the mesh without a host gather + reshard roundtrip —
        this is where multi-chip resume silently breaks if restore drops
        shardings. Falls back to params-only restore for legacy checkpoints.
        """
        import orbax.checkpoint as ocp

        def abstract(x):
            if isinstance(x, jax.Array):
                return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
            return x

        ckptr = ocp.StandardCheckpointer()
        target = {
            "params": like.params,
            "opt_state": like.opt_state,
            "step": like.step,
        }
        try:
            restored = ckptr.restore(
                Path(path).absolute(), target=jax.tree.map(abstract, target)
            )
            return TrainState(
                params=restored["params"],
                opt_state=restored["opt_state"],
                step=jnp.asarray(restored["step"]),
            )
        except Exception as exc:
            print(f"full-state restore failed ({exc}); restoring params only")
            params = self.load_params(path, like.params)
            return like._replace(params=params)

    # -- training ---------------------------------------------------------

    def fit(
        self,
        max_steps: Optional[int] = None,
        init_params=None,
        batches: Optional[Iterator] = None,
        warm_start=None,
        val_batches: Optional[Iterator] = None,
    ) -> TrainState:
        """Training loop: jitted sharded steps + validation every
        `train.val_every_n_steps` (metrics, comparison grid, trajectory strip
        — the reference's validation_step cadence, model_wrapper_style.py:471-629)
        + periodic checkpoints.

        `warm_start` is a (possibly partial) converted params tree merged over
        the model init (torch load_state_dict(strict=False) equivalent)."""
        cfg = self.cfg
        max_steps = max_steps or cfg.optimizer.total_steps
        stylized = bool(cfg.losses.style) or cfg.losses.identity

        if batches is None:
            datasets = build_datasets(
                cfg, "train", cfg.train.seed, lambda: self._global_step
            )
            batches = endless_batches(
                # aspect_buckets groups examples by image shape before
                # collation, so a mixed landscape/portrait stream yields
                # shape-homogeneous batches (fit() keeps one jitted step per
                # shape; homogeneous streams see a single always-hit bucket).
                lambda i: batch_iterator(
                    datasets[i], cfg.train.batch_size, aspect_buckets=True
                ),
                len(datasets),
            )

        first = next(batches)
        first = Batch(*[jnp.asarray(x) for x in first])

        if warm_start is not None:
            from ..utils.checkpoint import merge_params

            base = (
                init_params
                if init_params is not None
                else self.model.init(jax.random.key(cfg.seed), first)
            )
            init_params = merge_params(base, jax.tree.map(jnp.asarray, warm_start))

        if cfg.optimizer.train_stylizer_only:
            if init_params is None:
                init_params = self.model.init(jax.random.key(cfg.seed), first)
            tx = make_stage2_optimizer(
                lr=cfg.optimizer.lr,
                warmup_steps=cfg.optimizer.warm_up_steps,
                total_steps=max_steps,
                weight_decay=cfg.optimizer.weight_decay,
                grad_clip=cfg.optimizer.grad_clip,
                pretrained_lr_scale=cfg.optimizer.pretrained_lr_scale,
                params=init_params,
            )
        else:
            if cfg.optimizer.backbone_lr_multiplier != 1.0 and init_params is None:
                init_params = self.model.init(jax.random.key(cfg.seed), first)
            tx = make_optimizer(
                lr=cfg.optimizer.lr,
                warmup_steps=cfg.optimizer.warm_up_steps,
                total_steps=max_steps,
                weight_decay=cfg.optimizer.weight_decay,
                grad_clip=cfg.optimizer.grad_clip,
                params=init_params,
                backbone_lr_multiplier=cfg.optimizer.backbone_lr_multiplier,
            )

        if init_params is None:
            state, tx = create_train_state(self.model, jax.random.key(cfg.seed), first, tx)
        else:
            state = TrainState(
                params=init_params, opt_state=tx.init(init_params),
                step=jnp.zeros((), jnp.int32),
            )
        if cfg.checkpointing.load and cfg.checkpointing.resume:
            state = self.restore_state(cfg.checkpointing.load, state)
            print(f"resumed full train state at step {int(state.step)}")

        h, w = first.context_images.shape[2:4]
        impl = cfg.model.decoder.impl
        if impl == "auto":
            impl = "jnp" if jax.default_backend() == "cpu" else "pallas"
        self._render_kwargs = dict(
            max_per_tile=cfg.model.decoder.max_per_tile,
            max_tiles_per_gaussian=cfg.model.decoder.max_tiles_per_gaussian,
            scale_invariant=cfg.model.decoder.make_scale_invariant,
            background_color=jnp.asarray(cfg.model.decoder.background_color, jnp.float32),
            impl=impl,
        )
        if cfg.model.decoder.pair_cap_per_gaussian:
            # Absolute cap is derived per shard inside render_gaussians.
            self._render_kwargs["pair_cap_per_gaussian"] = (
                cfg.model.decoder.pair_cap_per_gaussian
            )
        repl = replicated_sharding(self.mesh)
        bshard = batch_sharding(self.mesh)
        teacher_params = None
        if self.distill is not None:
            teacher_params = self.teacher_params
            if teacher_params is None:
                teacher_params = self.distill.teacher.init(
                    jax.random.key(2), jnp.zeros((1, 2, h, w, 3))
                )
            teacher_params = jax.device_put(teacher_params, repl)

        # One jitted step per (h, w) bucket: aspect-bucketed streams (mixed
        # landscape/portrait, data/dataset.py batch_iterator) train portrait
        # batches through the transpose-to-landscape path (ManyAR equivalent).
        step_cache: Dict[Tuple[int, int], Any] = {}
        self._step_cache = step_cache  # exposed for shape-bucket tests

        def get_step_fn(hh: int, ww: int):
            key = (hh, ww)
            if key not in step_cache:
                fn = make_train_step(
                    self.model,
                    tx,
                    (hh, ww),
                    loss_fn=self.loss_bundle,
                    stylized=stylized,
                    identity_branch=self.loss_bundle.needs_identity_branch(),
                    distill=self.distill,
                    portrait=hh > ww,
                    # Keep the fused render's sort inside each data shard
                    # (see render_gaussians shard_data).
                    shard_data=(self.mesh, "data"),
                    **self._render_kwargs,
                )
                if self.distill is not None:
                    fn = jax.jit(
                        fn,
                        in_shardings=(repl, bshard, repl, repl),
                        out_shardings=(repl, repl),
                    )
                else:
                    fn = jax.jit(
                        fn, in_shardings=(repl, bshard, repl), out_shardings=(repl, repl)
                    )
                step_cache[key] = fn
            return step_cache[key]

        state = jax.device_put(state, repl)
        rng = jax.random.key(cfg.train.seed + 1)
        batch = first
        t_last = time.time()
        start_step = int(state.step)
        for i in range(start_step, max_steps):
            rng, step_rng = jax.random.split(rng)
            sharded = shard_batch(batch, self.mesh)
            step_args = (state, sharded, jax.device_put(step_rng, repl))
            if self.distill is not None:
                step_args += (teacher_params,)
            bh, bw = batch.context_images.shape[2:4]
            state, metrics = get_step_fn(bh, bw)(*step_args)
            self._global_step = i + 1

            if (i + 1) % cfg.train.log_every_n_steps == 0:
                metrics = jax.device_get(metrics)
                dt = (time.time() - t_last) / cfg.train.log_every_n_steps
                t_last = time.time()
                self.logger.log_scalars(
                    i + 1, dict(metrics, seconds_per_step=dt)
                )
                print(
                    f"step {i+1}: loss={float(metrics['loss']):.4f} "
                    f"({dt:.2f}s/step)",
                    flush=True,
                )

            if (i + 1) % cfg.train.val_every_n_steps == 0 and not (
                self.distill is not None and self.distill.distill_only
            ):
                val_batch = (
                    Batch(*[jnp.asarray(x) for x in next(val_batches)])
                    if val_batches is not None
                    else batch
                )
                self.validate(
                    jax.device_get(state), val_batch, stylized=stylized
                )

            if (i + 1) % cfg.checkpointing.every_n_train_steps == 0:
                self.save_checkpoint(state)

            if i + 1 < max_steps:
                batch = next(batches)

        return jax.device_get(state)

    # -- validation -------------------------------------------------------

    def validate(
        self,
        state: TrainState,
        batch: Batch,
        stylized: bool = False,
        n_trajectory_frames: int = 4,
    ) -> Dict[str, float]:
        """Validation pass (reference validation_step,
        model_wrapper_style.py:471-629): PSNR/SSIM scalars, a side-by-side
        comparison grid, a short interpolated-trajectory strip, and (when an
        AdaIN checkpoint is configured) the 2-D AdaIN stylization baseline."""
        h, w = batch.context_images.shape[2:4]
        render_kwargs = getattr(self, "_render_kwargs", None)
        if render_kwargs is None:
            # Build the fallback the same way fit() does so a standalone
            # validate() call uses the configured impl/background, not
            # silent jnp defaults.
            impl = self.cfg.model.decoder.impl
            if impl == "auto":
                impl = "jnp" if jax.default_backend() == "cpu" else "pallas"
            render_kwargs = dict(
                max_per_tile=self.cfg.model.decoder.max_per_tile,
                max_tiles_per_gaussian=self.cfg.model.decoder.max_tiles_per_gaussian,
                scale_invariant=self.cfg.model.decoder.make_scale_invariant,
                background_color=jnp.asarray(
                    self.cfg.model.decoder.background_color, jnp.float32
                ),
                impl=impl,
            )
        if not stylized:
            batch = batch._replace(style_image=batch.context_images[:, 0])
        # One jitted forward per image shape (eager per-op dispatch through
        # the remote-TPU tunnel would cost minutes per validation).
        cache = getattr(self, "_val_forward_cache", None)
        if cache is None:
            cache = self._val_forward_cache = {}
        key = (h, w)
        if key not in cache:
            cache[key] = jax.jit(
                lambda p, b: self.model.forward(p, b, (h, w), **render_kwargs)
            )
        gaussians, output = cache[key](state.params, batch)
        b, v = output.color.shape[:2]
        pred = output.color.reshape(b * v, h, w, 3)
        gt = jnp.asarray(batch.target_images).reshape(b * v, h, w, 3)
        psnr = float(jnp.mean(compute_psnr(gt, pred)))
        ssim_val = float(jnp.mean(compute_ssim(gt, pred)))
        step = int(state.step)
        self.logger.log_scalars(step, {"val_psnr": psnr, "val_ssim": ssim_val})
        from ..utils.viz import validation_gallery

        gallery = validation_gallery(
            np.asarray(batch.context_images[0]),
            np.asarray(batch.target_images[0]),
            np.asarray(output.color[0]),
            depth=np.asarray(output.depth[0]),
            style_image=np.asarray(batch.style_image[0]) if stylized else None,
        )
        self.logger.log_image(step, "val_comparison", gallery)

        # Short interpolated camera trajectory between the first two targets
        # (stand-in for the reference's wobble/interpolation videos, :544-629).
        if batch.target_extrinsics.shape[1] >= 2 and n_trajectory_frames > 0:
            from ..infer.trajectory import interpolate_extrinsics, interpolate_intrinsics

            t = np.linspace(0.0, 1.0, n_trajectory_frames)
            ext = interpolate_extrinsics(
                np.asarray(batch.target_extrinsics[0, 0]),
                np.asarray(batch.target_extrinsics[0, 1]),
                t,
            )[None]
            intr = interpolate_intrinsics(
                np.asarray(batch.target_intrinsics[0, 0]),
                np.asarray(batch.target_intrinsics[0, 1]),
                t,
            )[None]
            tkey = ("traj", h, w, len(t))
            if tkey not in cache:
                cache[tkey] = jax.jit(
                    lambda g, e, k, nr, fr: render_gaussians(
                        g, e, k, nr, fr, (h, w), **render_kwargs
                    )
                )
            traj = cache[tkey](
                jax.tree.map(lambda x: x[:1], gaussians),
                jnp.asarray(ext),
                jnp.asarray(intr),
                jnp.broadcast_to(batch.target_near[:1, :1], (1, len(t))),
                jnp.broadcast_to(batch.target_far[:1, :1], (1, len(t))),
            )
            strip = np.concatenate(list(np.asarray(traj.color[0])), axis=1)
            self.logger.log_image(step, "val_trajectory", strip)

        # Orthographic Gaussian projections (front/top/side) + camera
        # wireframe plot (reference validation_in_3d.py render_projections +
        # render_cameras, model_wrapper_style.py:544-629).
        from ..models.decoder import render_orthographic
        from ..utils.viz import annotate, draw_cameras_topdown, hcat, ortho_projection_cameras

        proj_kwargs = {
            k: render_kwargs[k]
            for k in ("impl", "max_per_tile", "max_tiles_per_gaussian", "background_color")
            if k in render_kwargs
        }
        exts, widths, heights, nears, fars = ortho_projection_cameras(
            np.asarray(gaussians.means[0])
        )
        pkey = ("proj", 256)
        if pkey not in cache:
            cache[pkey] = jax.jit(
                lambda g, e, wd, ht, nr, fr: render_orthographic(
                    g, e, wd, ht, nr, fr, (256, 256), **proj_kwargs
                )
            )
        proj = cache[pkey](
            jax.tree.map(lambda x: x[:1], gaussians),
            jnp.asarray(exts)[None], jnp.asarray(widths)[None],
            jnp.asarray(heights)[None], jnp.asarray(nears)[None],
            jnp.asarray(fars)[None],
        )
        proj_imgs = np.asarray(proj.color[0])
        self.logger.log_image(
            step,
            "val_projections",
            hcat(
                annotate(proj_imgs[0], "front (xy)"),
                annotate(proj_imgs[1], "top (xz)"),
                annotate(proj_imgs[2], "side (zy)"),
            ),
        )
        self.logger.log_image(
            step,
            "val_cameras",
            draw_cameras_topdown(
                np.asarray(batch.target_extrinsics[0]),
                np.asarray(batch.target_intrinsics[0]),
            ),
        )
        # Full 3-plane frustum wireframes (reference drawing/cameras.py
        # draw_cameras, logged by validation_in_3d.render_cameras).
        from ..utils.drawing import draw_cameras

        n_cams = batch.target_extrinsics.shape[1]
        cam_colors = np.stack(
            [np.linspace(1, 0, n_cams), np.linspace(0, 1, n_cams),
             np.full(n_cams, 0.3)], axis=-1,
        )
        planes = draw_cameras(
            256,
            np.asarray(batch.target_extrinsics[0]),
            np.asarray(batch.target_intrinsics[0]),
            cam_colors,
            near=float(np.asarray(batch.target_near).min()),
            far=float(np.asarray(batch.target_far).max()) * 0.1,
        )
        self.logger.log_image(
            step, "val_camera_frustums", hcat(planes[0], planes[1], planes[2])
        )

        # Wobble video around the first target camera
        # (src/visualization/camera_trajectory/wobble.py).
        if n_trajectory_frames > 0:
            from ..infer.trajectory import wobble_extrinsics

            n_wob = max(n_trajectory_frames * 2, 8)
            scene_scale = float(
                np.percentile(np.abs(np.asarray(gaussians.means[0])), 90)
            )
            ext_w = wobble_extrinsics(
                np.asarray(batch.target_extrinsics[0, 0]),
                n=n_wob,
                radius=0.05 * max(scene_scale, 1e-3),
            )
            wkey = ("wobble", h, w, n_wob)
            if wkey not in cache:
                cache[wkey] = jax.jit(
                    lambda g, e, k, nr, fr: render_gaussians(
                        g, e, k, nr, fr, (h, w), **render_kwargs
                    )
                )
            wob = cache[wkey](
                jax.tree.map(lambda x: x[:1], gaussians),
                jnp.asarray(ext_w)[None],
                jnp.broadcast_to(batch.target_intrinsics[:1, :1], (1, n_wob, 3, 3)),
                jnp.broadcast_to(batch.target_near[:1, :1], (1, n_wob)),
                jnp.broadcast_to(batch.target_far[:1, :1], (1, n_wob)),
            )
            self.logger.log_video(step, "val_wobble", np.asarray(wob.color[0]))

        # AdaIN 2-D stylization baseline (model_wrapper_style.py:260-308).
        if stylized and self.cfg.train.adain_baseline_weights:
            from ..models.stylizers import AdaIN2D, convert_adain2d_checkpoint
            from ..utils.checkpoint import load_torch_state_dict

            if not hasattr(self, "_adain_params"):
                self._adain_params = jax.tree.map(
                    jnp.asarray,
                    convert_adain2d_checkpoint(
                        load_torch_state_dict(self.cfg.train.adain_baseline_weights)
                    ),
                )
            baseline = AdaIN2D().apply(
                self._adain_params, batch.context_images[:1, 0],
                batch.style_image[:1],
            )
            self.logger.log_image(step, "val_adain_baseline", np.asarray(baseline[0]))

        return {"psnr": psnr, "ssim": ssim_val}
