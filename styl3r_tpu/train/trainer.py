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
from typing import Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import DatasetConfig, RE10kStyleDataset, make_view_sampler
from ..data.dataset import batch_iterator
from ..eval.metrics import compute_psnr, compute_ssim
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


def interleave_iterators(iterators: List[Iterator]) -> Iterator:
    """Round-robin over per-dataset batch iterators, restarting exhausted ones."""
    while True:
        for i, it in enumerate(iterators):
            try:
                yield next(it)
            except StopIteration:
                return


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
    def __init__(self, cfg: RootCfg, loss_bundle: Optional[LossBundle] = None):
        self.cfg = cfg
        self.model = Styl3rModel(
            sh_degree=cfg.model.encoder.sh_degree,
            backbone_dtype=jnp.bfloat16
            if cfg.model.encoder.backbone_dtype == "bfloat16"
            else jnp.float32,
        )
        self.loss_bundle = loss_bundle or LossBundle(
            mse_weight=cfg.losses.mse,
            lpips_weight=cfg.losses.lpips,
            lpips_apply_after_step=cfg.losses.lpips_apply_after_step,
            style_weight=cfg.losses.style,
            identity=cfg.losses.identity,
        )
        self.mesh = make_mesh()
        self.output_dir = Path(cfg.checkpointing.output_dir)
        self.logger = LocalLogger(self.output_dir)
        self._global_step = 0

    # -- checkpointing ----------------------------------------------------

    def save_checkpoint(self, state: TrainState, path: Optional[Path] = None):
        import orbax.checkpoint as ocp

        path = Path(path or self.output_dir / "checkpoints" / f"step_{int(state.step)}")
        path.parent.mkdir(parents=True, exist_ok=True)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path.absolute(), jax.device_get(state.params))
        ckptr.wait_until_finished()

    def load_params(self, path: Path, like):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(Path(path).absolute(), target=jax.device_get(like))

    # -- training ---------------------------------------------------------

    def fit(
        self,
        max_steps: Optional[int] = None,
        init_params=None,
        batches: Optional[Iterator] = None,
    ) -> TrainState:
        cfg = self.cfg
        max_steps = max_steps or cfg.optimizer.total_steps
        stylized = bool(cfg.losses.style) or cfg.losses.identity

        if batches is None:
            datasets = build_datasets(
                cfg, "train", cfg.train.seed, lambda: self._global_step
            )
            batches = endless_batches(
                lambda i: batch_iterator(datasets[i], cfg.train.batch_size),
                len(datasets),
            )

        first = next(batches)
        first = Batch(*[jnp.asarray(x) for x in first])

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
            tx = make_optimizer(
                lr=cfg.optimizer.lr,
                warmup_steps=cfg.optimizer.warm_up_steps,
                total_steps=max_steps,
                weight_decay=cfg.optimizer.weight_decay,
                grad_clip=cfg.optimizer.grad_clip,
            )

        if init_params is None:
            state, tx = create_train_state(self.model, jax.random.key(cfg.seed), first, tx)
        else:
            state = TrainState(
                params=init_params, opt_state=tx.init(init_params),
                step=jnp.zeros((), jnp.int32),
            )

        h, w = first.context_images.shape[2:4]
        impl = cfg.model.decoder.impl
        if impl == "auto":
            impl = "jnp" if jax.default_backend() == "cpu" else "pallas"
        step_fn = make_train_step(
            self.model,
            tx,
            (h, w),
            loss_fn=self.loss_bundle,
            stylized=stylized,
            identity_branch=self.loss_bundle.needs_identity_branch(),
            max_per_tile=cfg.model.decoder.max_per_tile,
            max_tiles_per_gaussian=cfg.model.decoder.max_tiles_per_gaussian,
            impl=impl,
        )
        repl = replicated_sharding(self.mesh)
        bshard = batch_sharding(self.mesh)
        step_fn = jax.jit(
            step_fn, in_shardings=(repl, bshard, repl), out_shardings=(repl, repl)
        )

        state = jax.device_put(state, repl)
        rng = jax.random.key(cfg.train.seed + 1)
        batch = first
        t_last = time.time()
        for i in range(max_steps):
            rng, step_rng = jax.random.split(rng)
            sharded = shard_batch(batch, self.mesh)
            state, metrics = step_fn(state, sharded, jax.device_put(step_rng, repl))
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

            if (i + 1) % cfg.checkpointing.every_n_train_steps == 0:
                self.save_checkpoint(state)

            if i + 1 < max_steps:
                batch = next(batches)

        return jax.device_get(state)

    # -- validation -------------------------------------------------------

    def validate(self, state: TrainState, batch: Batch) -> Dict[str, float]:
        h, w = batch.context_images.shape[2:4]
        gaussians, output = self.model.forward(
            state.params, batch, (h, w),
            max_per_tile=self.cfg.model.decoder.max_per_tile,
            max_tiles_per_gaussian=self.cfg.model.decoder.max_tiles_per_gaussian,
        )
        b, v = output.color.shape[:2]
        pred = output.color.reshape(b * v, h, w, 3)
        gt = jnp.asarray(batch.target_images).reshape(b * v, h, w, 3)
        psnr = float(jnp.mean(compute_psnr(gt, pred)))
        ssim_val = float(jnp.mean(compute_ssim(gt, pred)))
        step = int(state.step)
        self.logger.log_scalars(step, {"val_psnr": psnr, "val_ssim": ssim_val})
        side_by_side = np.concatenate(
            [np.asarray(pred[0]), np.asarray(gt[0])], axis=1
        )
        self.logger.log_image(step, "val_comparison", side_by_side)
        return {"psnr": psnr, "ssim": ssim_val}
