"""Training state + jitted data-parallel train step.

Replaces the reference's Lightning/DDP runtime (`src/model/model_wrapper_style.py`
training_step + configure_optimizers): one functional step — forward (encoder
-> render), loss, grad, AdamW update — jitted over a `data` mesh; XLA inserts
the gradient all-reduce over ICI.

Optimizer schedule parity (model_wrapper_style.py:898-916): AdamW with
weight-decay 0.05, betas (0.9, 0.95), linear warmup then cosine decay to
0.1 * lr, gradient clipping 0.5 (trainer config).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import Array

from ..models.styl3r import Batch, Styl3rModel


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: Array


def make_schedule(
    lr: float, warmup_steps: int, total_steps: int, final_scale: float = 0.1
) -> optax.Schedule:
    """Linear warmup -> cosine decay to final_scale * lr."""
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr, warmup_steps),
            optax.cosine_decay_schedule(lr, max(total_steps - warmup_steps, 1), final_scale),
        ],
        [warmup_steps],
    )


def make_optimizer(
    lr: float = 2e-4,
    warmup_steps: int = 125,
    total_steps: int = 15_000,
    weight_decay: float = 0.05,
    grad_clip: float = 0.5,
    trainable_mask: Optional[Any] = None,
    params: Optional[Any] = None,
    backbone_lr_multiplier: float = 1.0,
) -> optax.GradientTransformation:
    """Stage-1 optimizer. With `backbone_lr_multiplier` != 1 (reference
    stage-1 configs train the CroCo backbone at 0.1x lr,
    re10k_3view_style_8x8.yaml optimizer block) the backbone subtree gets its
    own schedule; requires `params` for the label pytree."""

    def group(lr_scale):
        return optax.adamw(
            make_schedule(lr * lr_scale, warmup_steps, total_steps),
            b1=0.9,
            b2=0.95,
            weight_decay=weight_decay,
        )

    if backbone_lr_multiplier != 1.0:
        if params is None:
            raise ValueError("backbone_lr_multiplier requires params")
        if trainable_mask is not None:
            raise ValueError(
                "trainable_mask is not supported with backbone_lr_multiplier; "
                "fold the freeze into per-group labels instead"
            )
        labels = backbone_param_labels(params)
        # Clip once by the GLOBAL norm across all params (Lightning
        # gradient_clip_val=0.5 clips the whole gradient, not per group),
        # then dispatch to per-group adamw.
        return optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.multi_transform(
                {"backbone": group(backbone_lr_multiplier), "rest": group(1.0)},
                labels,
            ),
        )
    tx = optax.chain(optax.clip_by_global_norm(grad_clip), group(1.0))
    if trainable_mask is not None:
        # Freeze masked-out params (the stage-2 style training freezes
        # everything except the stylizer decoder + appearance head;
        # model_wrapper_style.py:843-916).
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree.map(lambda t: "train" if t else "freeze", trainable_mask),
        )
    return tx


def backbone_param_labels(params) -> dict:
    """Label pytree for the stage-1 backbone lr group: 'backbone' for the
    CroCo trunk, 'rest' for heads/stylizer (reference configure_optimizers
    new_params/pretrained split, model_wrapper_style.py:898-916)."""

    def label_path(path, _):
        keys = [getattr(p, "key", str(p)) for p in path]
        top = keys[0] if keys else ""
        if top == "params" and len(keys) > 1:
            top = keys[1]
        return "backbone" if top == "backbone" else "rest"

    return jax.tree_util.tree_map_with_path(label_path, params)


def create_train_state(
    model: Styl3rModel,
    rng: Array,
    batch: Batch,
    tx: optax.GradientTransformation,
) -> Tuple[TrainState, optax.GradientTransformation]:
    params = model.init(rng, batch)
    opt_state = tx.init(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32)), tx


class DistillCfg(NamedTuple):
    """Distillation settings (reference model_wrapper_style.py:95-100 +
    config/main.yaml train block): a frozen DUSt3R/MASt3R teacher provides
    pseudo-GT point maps; Regr3D(norm_mode=None) on the encoder's per-view
    pts3d, weighted (reference: x0.1) and gated by distill_max_steps."""

    teacher: Any  # Dust3RTeacher module (params passed to the step)
    weight: float = 0.1
    max_steps: int = 1_000_000
    conf_threshold: float = 3.0
    distill_only: bool = False  # skip render + photometric losses entirely


def make_train_step(
    model: Styl3rModel,
    tx: optax.GradientTransformation,
    image_shape: Tuple[int, int],
    loss_fn: Optional[Callable] = None,
    stylized: bool = True,
    identity_branch: bool = False,
    distill: Optional[DistillCfg] = None,
    portrait: bool = False,
    **render_kwargs,
):
    """Build the jittable train step.

    `loss_fn(output, batch, gaussians, global_step, identity_output)` maps the
    decoder output to (scalar, metrics dict); defaults to plain MSE.
    stylized=False (stage-1 NVS pretraining) replaces the style image with
    context view 0 (model_wrapper_style.py:149-155); identity_branch adds a
    second forward with style := context view 0 (:216-231).

    With `distill`, the returned step takes an extra `teacher_params` argument
    (kept out of the closure so the frozen ViT-L teacher isn't baked into the
    executable as constants) and adds the Regr3D distillation term
    (model_wrapper_style.py:157-171, :234-242).
    """

    if loss_fn is None:

        def loss_fn(output, batch, gaussians, global_step=0, identity_output=None):
            mse = jnp.mean((output.color - batch.target_images) ** 2)
            return mse, {"mse": mse}

    def distill_loss(params_aux_pts, batch, teacher_params, global_step):
        from ..losses.regr3d import regr3d_loss
        from ..models.styl3r import normalize_images

        teacher_in = normalize_images(batch.context_images[:, :2])
        pseudo = jax.lax.stop_gradient(
            distill.teacher.apply(teacher_params, teacher_in)
        )
        raw = regr3d_loss(
            pseudo["pts3d_1"], pseudo["pts3d_2"],
            params_aux_pts[:, 0], params_aux_pts[:, 1],
            conf1=pseudo["conf_1"], conf2=pseudo["conf_2"],
            conf_threshold=distill.conf_threshold,
            normalize=False,
        )
        if distill.distill_only:
            # Stage-0 pretraining adds the distillation loss unweighted and
            # ungated (the x0.1 and max_steps gate exist only in the full
            # training path; model_wrapper_style.py:157-171 vs :234-242).
            return raw
        gate = (jnp.asarray(global_step) <= distill.max_steps).astype(jnp.float32)
        return distill.weight * gate * raw

    def train_step(state: TrainState, batch, rng: Array, teacher_params=None):
        if not stylized:
            batch = batch._replace(style_image=batch.context_images[:, 0])

        def compute_loss(params):
            if distill is not None and distill.distill_only:
                # Stage-0 distillation pretraining: encoder only, no render
                # (model_wrapper_style.py:157-171).
                _, aux = model.predict_gaussians(
                    params, batch, global_step=state.step, deterministic=False,
                    return_aux=True, rngs={"dropout": rng}, portrait=portrait,
                )
                l = distill_loss(aux["pts3d"], batch, teacher_params, state.step)
                return l, {"distill": l}

            fwd = model.forward(
                params,
                batch,
                image_shape,
                global_step=state.step,
                deterministic=False,
                rngs={"dropout": rng},
                return_aux=distill is not None,
                portrait=portrait,
                **render_kwargs,
            )
            gaussians, output = fwd[0], fwd[1]
            identity_output = None
            if identity_branch:
                id_batch = batch._replace(style_image=batch.context_images[:, 0])
                _, identity_output = model.forward(
                    params,
                    id_batch,
                    image_shape,
                    global_step=state.step,
                    deterministic=False,
                    rngs={"dropout": rng},
                    portrait=portrait,
                    **render_kwargs,
                )
            loss, metrics = loss_fn(
                output, batch, gaussians, global_step=state.step,
                identity_output=identity_output,
            )
            if distill is not None:
                l = distill_loss(fwd[2]["pts3d"], batch, teacher_params, state.step)
                loss = loss + l
                metrics = dict(metrics, distill=l)
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, loss=loss, grad_norm=optax.global_norm(grads))
        return TrainState(params, opt_state, state.step + 1), metrics

    if distill is None:
        # Keep the historical 3-arg signature for non-distill callers.
        return lambda state, batch, rng: train_step(state, batch, rng)
    return train_step


def stage2_param_labels(params) -> dict:
    """Label pytree for the stage-2 style-training freeze
    (model_wrapper_style.py:843-916): the token-stylizer decoder + appearance
    head are 'new' (full lr), the token-stylizer encoder is 'pretrained'
    (lr * 0.1), everything else is 'frozen'."""
    import jax as _jax

    def label_path(path, _):
        keys = [getattr(p, "key", str(p)) for p in path]
        top = keys[0] if keys else ""
        if top == "params" and len(keys) > 1:
            top, keys = keys[1], keys[1:]
        if top == "gaussian_appearance_head":
            return "new"
        if top == "token_stylizer":
            if len(keys) > 1 and keys[1] == "encoder":
                return "pretrained"
            return "new"
        return "frozen"

    return _jax.tree_util.tree_map_with_path(label_path, params)


def make_stage2_optimizer(
    lr: float = 2e-4,
    warmup_steps: int = 125,
    total_steps: int = 35_000,
    weight_decay: float = 0.05,
    grad_clip: float = 0.5,
    pretrained_lr_scale: float = 0.1,
    params=None,
) -> optax.GradientTransformation:
    """Stage-2 optimizer: per-group lr + freezing, matching
    configure_optimizers' param groups."""

    def group(lr_scale):
        return optax.adamw(
            make_schedule(lr * lr_scale, warmup_steps, total_steps),
            b1=0.9, b2=0.95, weight_decay=weight_decay,
        )

    labels = stage2_param_labels(params)
    frozen_mask = jax.tree.map(lambda l: l == "frozen", labels)
    # Zero frozen grads FIRST so the single global-norm clip matches the
    # reference (Lightning clips across all params that have grads, i.e. the
    # new + pretrained groups only — frozen params have requires_grad=False).
    return optax.chain(
        optax.masked(optax.set_to_zero(), frozen_mask),
        optax.clip_by_global_norm(grad_clip),
        optax.multi_transform(
            {
                "new": group(1.0),
                "pretrained": group(pretrained_lr_scale),
                "frozen": optax.set_to_zero(),
            },
            labels,
        ),
    )
