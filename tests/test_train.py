"""Training runtime tests: loss bundle math, stage-2 freeze labels, and a
short overfit run on a synthetic batch that must decrease the loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from styl3r_tpu.models.styl3r import Batch, Styl3rModel
from styl3r_tpu.train.losses import LossBundle
from styl3r_tpu.train.step import (
    create_train_state,
    make_optimizer,
    make_stage2_optimizer,
    make_train_step,
    stage2_param_labels,
)
from styl3r_tpu.eval.metrics import MetricTracker, compute_psnr, overlap_tag

TINY = dict(enc_depth=2, dec_depth=4, enc_dim=32, dec_dim=16, enc_heads=2, dec_heads=2)
B, V, H, W = 1, 2, 32, 32


def tiny_batch(rng, t=2):
    k = np.asarray([[0.9, 0, 0.5], [0, 0.9, 0.5], [0, 0, 1.0]], np.float32)
    ext = np.broadcast_to(np.eye(4, dtype=np.float32), (B, t, 4, 4)).copy()
    ext[:, 1:, 0, 3] = 0.1
    return Batch(
        context_images=jnp.asarray(rng.uniform(0, 1, (B, V, H, W, 3)), jnp.float32),
        context_intrinsics=jnp.broadcast_to(jnp.asarray(k), (B, V, 3, 3)),
        target_extrinsics=jnp.asarray(ext),
        target_intrinsics=jnp.broadcast_to(jnp.asarray(k), (B, t, 3, 3)),
        target_near=jnp.full((B, t), 0.1),
        target_far=jnp.full((B, t), 100.0),
        style_image=jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32),
        target_images=jnp.asarray(rng.uniform(0.4, 0.6, (B, t, H, W, 3)), jnp.float32),
    )


@pytest.mark.slow
def test_overfit_decreases_loss():
    # NOTE: lr is small because the pts3d head's expm1 postprocess makes a
    # randomly-initialized model exponentially sensitive; real training always
    # warm-starts from MASt3R weights (as the reference does).
    rng = np.random.default_rng(0)
    model = Styl3rModel(sh_degree=0, **TINY)
    batch = tiny_batch(rng)
    tx = make_optimizer(lr=3e-5, warmup_steps=1, total_steps=50)
    state, tx = create_train_state(model, jax.random.key(0), batch, tx)
    step = jax.jit(
        make_train_step(
            model, tx, (H, W), max_per_tile=256, max_tiles_per_gaussian=8
        )
    )
    key = jax.random.key(1)
    losses = []
    for i in range(10):
        state, metrics = step(state, batch, key)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 10


@pytest.mark.slow
def test_stage2_labels_and_freeze():
    rng = np.random.default_rng(1)
    model = Styl3rModel(sh_degree=0, **TINY)
    batch = tiny_batch(rng)
    params = model.init(jax.random.key(0), batch)
    labels = stage2_param_labels(params)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    got = {}
    for path, lab in flat:
        keys = [getattr(p, "key", str(p)) for p in path]
        got.setdefault(keys[1], set()).add(lab)
    assert got["backbone"] == {"frozen"}
    assert got["head1"] == {"frozen"}
    assert got["gaussian_appearance_head"] == {"new"}
    assert "new" in got["token_stylizer"] and "pretrained" in got["token_stylizer"]

    # One stage-2 step must leave frozen params bit-identical.
    tx = make_stage2_optimizer(lr=1e-3, warmup_steps=1, total_steps=10, params=params)
    state, _ = create_train_state(model, jax.random.key(0), batch, tx)
    state = state._replace(params=params)
    step = jax.jit(
        make_train_step(
            model, tx, (H, W), stylized=True, max_per_tile=256, max_tiles_per_gaussian=8
        )
    )
    new_state, _ = step(state, batch, jax.random.key(2))
    new_state, _ = step(new_state, batch, jax.random.key(3))  # step 1 has lr=0 (warmup)
    before = params["params"]["backbone"]
    after = new_state.params["params"]["backbone"]
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), before, after)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0
    # And the appearance head must have moved.
    before_a = params["params"]["gaussian_appearance_head"]
    after_a = new_state.params["params"]["gaussian_appearance_head"]
    diffs_a = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), before_a, after_a)
    assert max(jax.tree_util.tree_leaves(diffs_a)) > 0.0


def test_loss_bundle_mse_only():
    bundle = LossBundle(mse_weight=2.0)

    class Out:
        color = jnp.ones((1, 1, 4, 4, 3))

    batch = type("B", (), {"target_images": jnp.zeros((1, 1, 4, 4, 3)), "style_image": None})
    total, metrics = bundle(Out(), batch, None)
    np.testing.assert_allclose(total, 2.0)
    assert "mse" in metrics


def test_metric_tracker_and_psnr():
    tracker = MetricTracker()
    tracker.update({"psnr": 20.0}, overlap=0.2)
    tracker.update({"psnr": 30.0}, overlap=0.9)
    means = tracker.means()
    assert means["psnr/all"] == 25.0
    assert means["psnr/small"] == 20.0
    assert means["psnr/large"] == 30.0
    assert "small" == overlap_tag(0.1)
    table = tracker.table()
    assert "psnr" in table

    img = jnp.zeros((1, 8, 8, 3))
    np.testing.assert_allclose(compute_psnr(img, img + 0.1), 20.0, atol=0.01)


@pytest.mark.slow
def test_style_stage_training_step():
    """Stage-2 style training: style + identity losses with (random-weight)
    VGG through the full train step, stylizer-only updates."""
    import torch
    from tests.test_losses import features_state_dict, make_vgg19_features
    from styl3r_tpu.losses.vgg import convert_torchvision_vgg19
    from styl3r_tpu.train.losses import LossBundle

    rng = np.random.default_rng(7)
    model = Styl3rModel(sh_degree=0, **TINY)
    batch = tiny_batch(rng)

    vgg_params = jax.tree.map(
        jnp.asarray, convert_torchvision_vgg19(features_state_dict(make_vgg19_features()))
    )
    bundle = LossBundle(
        mse_weight=None, style_weight=10.0, identity=True, vgg19_params=vgg_params
    )
    params = model.init(jax.random.key(0), batch)
    tx = make_stage2_optimizer(lr=1e-4, warmup_steps=0, total_steps=10, params=params)
    from styl3r_tpu.train.step import TrainState

    state = TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))
    step = jax.jit(
        make_train_step(
            model, tx, (H, W), loss_fn=bundle, stylized=True, identity_branch=True,
            max_per_tile=256, max_tiles_per_gaussian=8,
        )
    )
    state, metrics = step(state, batch, jax.random.key(1))
    assert bool(jnp.isfinite(metrics["loss"]))
    assert "style" in metrics and "identity" in metrics
    assert float(metrics["style"]) > 0 and float(metrics["identity"]) > 0


@pytest.mark.slow
def test_distillation_train_step():
    """Distillation wiring (model_wrapper_style.py:234-242): frozen teacher
    pseudo-GT -> Regr3D on the encoder's aux pts3d, weight 0.1, teacher params
    untouched, and the step gate (distill_max_steps) zeroes it out."""
    from styl3r_tpu.models.distiller import Dust3RTeacher
    from styl3r_tpu.train.step import DistillCfg, TrainState

    rng = np.random.default_rng(3)
    model = Styl3rModel(sh_degree=0, **TINY)
    teacher = Dust3RTeacher(
        enc_depth=2, dec_depth=4, enc_dim=32, dec_dim=16, enc_heads=2, dec_heads=2,
        head_feature_dim=16, head_last_dim=8, head_layer_dims=(8, 8, 16, 16),
    )
    batch = tiny_batch(rng)
    params = model.init(jax.random.key(0), batch)
    teacher_params = teacher.init(jax.random.key(1), jnp.zeros((B, 2, H, W, 3)))
    tx = make_optimizer(lr=1e-4, warmup_steps=0, total_steps=10)
    state = TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))

    distill = DistillCfg(teacher=teacher, weight=0.1, max_steps=100)
    step = jax.jit(
        make_train_step(
            model, tx, (H, W), stylized=False, distill=distill,
            max_per_tile=256, max_tiles_per_gaussian=8,
        )
    )
    new_state, metrics = step(state, batch, jax.random.key(2), teacher_params)
    assert bool(jnp.isfinite(metrics["loss"]))
    assert "distill" in metrics and float(metrics["distill"]) > 0
    assert "mse" in metrics  # photometric loss still present

    # Past distill_max_steps the term gates to zero.
    late = state._replace(step=jnp.asarray(101, jnp.int32))
    _, m_late = step(late, batch, jax.random.key(2), teacher_params)
    assert float(m_late["distill"]) == 0.0

    # distill_only: encoder-only step, no photometric term.
    step_only = jax.jit(
        make_train_step(
            model, tx, (H, W), stylized=False,
            distill=distill._replace(distill_only=True),
        )
    )
    s2, m2 = step_only(state, batch, jax.random.key(2), teacher_params)
    assert set(m2) == {"distill", "loss", "grad_norm"}
    assert bool(jnp.isfinite(m2["loss"])) and float(m2["distill"]) > 0
    # Teacher params are an input, not state: trivially frozen; student moved.
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, s2.params
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0


@pytest.mark.slow
def test_trainer_stage2_launch_and_validation_cadence(tmp_path):
    """VERDICT round-1 item 2/4: the stage-2 style config must be launchable
    end-to-end (random VGG fallback) and fit() must run validation at
    val_every_n_steps, producing comparison/trajectory PNGs."""
    from styl3r_tpu.utils.config import load_config
    from styl3r_tpu.train.trainer import Trainer

    cfg = load_config(
        "configs/experiment/re10k_3view_style.yaml",
        [
            f"checkpointing.output_dir={tmp_path}",
            "train.batch_size=8",
            "train.val_every_n_steps=2",
            "train.log_every_n_steps=1",
            "model.decoder.max_per_tile=128",
            "model.decoder.max_tiles_per_gaussian=4",
            "checkpointing.every_n_train_steps=100",
        ],
    )
    assert cfg.losses.style == 10.0 and cfg.losses.identity
    assert cfg.optimizer.train_stylizer_only

    model = Styl3rModel(
        sh_degree=0, enc_depth=1, dec_depth=2, enc_dim=32, dec_dim=16,
        enc_heads=2, dec_heads=2, head_feature_dim=16, head_last_dim=16,
        head_layer_dims=(8, 8, 16, 16),
    )
    trainer = Trainer(cfg, model=model)  # random-VGG warning path
    rng = np.random.default_rng(5)

    def batches():
        while True:
            k = np.asarray([[0.9, 0, 0.5], [0, 0.9, 0.5], [0, 0, 1.0]], np.float32)
            ext = np.broadcast_to(np.eye(4, dtype=np.float32), (8, 2, 4, 4)).copy()
            ext[:, 1:, 0, 3] = 0.1
            yield Batch(
                context_images=jnp.asarray(rng.uniform(0, 1, (8, 2, 16, 16, 3)), jnp.float32),
                context_intrinsics=jnp.broadcast_to(jnp.asarray(k), (8, 2, 3, 3)),
                target_extrinsics=jnp.asarray(ext),
                target_intrinsics=jnp.broadcast_to(jnp.asarray(k), (8, 2, 3, 3)),
                target_near=jnp.full((8, 2), 0.5),
                target_far=jnp.full((8, 2), 100.0),
                style_image=jnp.asarray(rng.uniform(0, 1, (8, 16, 16, 3)), jnp.float32),
                target_images=jnp.asarray(rng.uniform(0.4, 0.6, (8, 2, 16, 16, 3)), jnp.float32),
            )

    state = trainer.fit(max_steps=2, batches=batches())
    assert int(state.step) == 2
    assert (tmp_path / "metrics.jsonl").exists()
    comparisons = list((tmp_path / "val_comparison").glob("*.png"))
    assert comparisons, "validation cadence produced no comparison image"
    assert list((tmp_path / "val_trajectory").glob("*.png"))
    # Round-3 validation visuals (reference validation_in_3d + wobble):
    # orthographic gaussian projections, camera wireframes, wobble video.
    assert list((tmp_path / "val_projections").glob("*.png"))
    assert list((tmp_path / "val_cameras").glob("*.png"))
    wobble_dirs = list((tmp_path / "val_wobble").glob("*/"))
    assert wobble_dirs and list(wobble_dirs[0].glob("*.png"))


def test_registries():
    from styl3r_tpu.models.registry import get_backbone, get_decoder, get_distiller, get_encoder

    assert type(get_encoder("noposplat_multi_token_style", **TINY)).__name__ == "Styl3rEncoder"
    assert type(get_backbone("croco_multi")).__name__ == "MultiViewCrocoBackbone"
    assert callable(get_decoder("splatting_cuda"))
    assert type(get_distiller("mast3r")).__name__ == "Dust3RTeacher"
    assert type(get_backbone("resnet", model="resnet18")).__name__ == "BackboneResnet"
    assert type(get_backbone("dino", model="dino_vits8")).__name__ == "BackboneDino"
    with pytest.raises(ValueError):
        get_encoder("bogus")


@pytest.mark.slow
def test_checkpoint_full_state_roundtrip(tmp_path):
    """True optimizer-state resume (reference main.py checkpoint contract):
    params + opt_state (incl. multi_transform stage-2 states) + step survive
    an orbax save/restore; legacy params-only checkpoints still load."""
    from styl3r_tpu.train.trainer import Trainer
    from styl3r_tpu.train.step import TrainState
    from styl3r_tpu.utils.config import RootCfg

    rng = np.random.default_rng(11)
    model = Styl3rModel(
        sh_degree=0, enc_depth=1, dec_depth=2, enc_dim=32, dec_dim=16,
        enc_heads=2, dec_heads=2, head_feature_dim=16, head_last_dim=16,
        head_layer_dims=(8, 8, 16, 16),
    )
    k = np.asarray([[0.9, 0, 0.5], [0, 0.9, 0.5], [0, 0, 1.0]], np.float32)
    batch = Batch(
        context_images=jnp.asarray(rng.uniform(0, 1, (1, 2, 16, 16, 3)), jnp.float32),
        context_intrinsics=jnp.broadcast_to(jnp.asarray(k), (1, 2, 3, 3)),
        target_extrinsics=jnp.eye(4)[None, None],
        target_intrinsics=jnp.asarray(k)[None, None],
        target_near=jnp.full((1, 1), 0.5),
        target_far=jnp.full((1, 1), 100.0),
        style_image=jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32),
        target_images=jnp.asarray(rng.uniform(0, 1, (1, 1, 16, 16, 3)), jnp.float32),
    )
    params = jax.jit(model.init)(jax.random.key(0), batch)
    tx = make_stage2_optimizer(lr=1e-3, warmup_steps=0, total_steps=10, params=params)
    opt_state = tx.init(params)
    # Make the adam moments nonzero so the roundtrip is meaningful.
    grads = jax.tree.map(jnp.ones_like, params)
    _, opt_state = tx.update(grads, opt_state, params)
    state = TrainState(params=params, opt_state=opt_state, step=jnp.asarray(7, jnp.int32))

    cfg = RootCfg()
    cfg.checkpointing.output_dir = str(tmp_path)
    trainer = Trainer(cfg, model=model)
    trainer.save_checkpoint(state, tmp_path / "ck")

    like = TrainState(
        params=jax.tree.map(jnp.zeros_like, params),
        opt_state=tx.init(jax.tree.map(jnp.zeros_like, params)),
        step=jnp.zeros((), jnp.int32),
    )
    restored = trainer.restore_state(tmp_path / "ck", like)
    assert int(restored.step) == 7
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(params)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree.leaves(restored.opt_state), jax.tree.leaves(opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Legacy params-only checkpoint path.
    trainer.save_checkpoint(state, tmp_path / "ck_params", full=False)
    loaded = trainer.load_params_lazy(tmp_path / "ck_params")
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(params)):
        np.testing.assert_array_equal(a, b)
    # load_params_lazy on a full checkpoint returns just the params.
    loaded2 = trainer.load_params_lazy(tmp_path / "ck")
    for a, b in zip(jax.tree.leaves(loaded2), jax.tree.leaves(params)):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_trainer_distillation_fit(tmp_path):
    """Trainer-level distillation: teacher threading through the sharded
    4-arg jitted step over the 8-device mesh (config re10k_style_distill)."""
    from styl3r_tpu.models.distiller import Dust3RTeacher
    from styl3r_tpu.utils.config import load_config
    from styl3r_tpu.train.trainer import Trainer

    cfg = load_config(
        "configs/experiment/re10k_style_distill.yaml",
        [
            f"checkpointing.output_dir={tmp_path}",
            "train.batch_size=8",
            "train.log_every_n_steps=1",
            "train.val_every_n_steps=100",
            "losses.lpips=null",
            "model.decoder.max_per_tile=128",
            "model.decoder.max_tiles_per_gaussian=4",
            "checkpointing.every_n_train_steps=100",
        ],
    )
    assert cfg.train.distill_only and cfg.losses.distill == 0.1
    tiny = dict(enc_depth=1, dec_depth=2, enc_dim=32, dec_dim=16, enc_heads=2,
                dec_heads=2, head_feature_dim=16, head_last_dim=16,
                head_layer_dims=(8, 8, 16, 16))
    model = Styl3rModel(sh_degree=0, **tiny)
    teacher = Dust3RTeacher(head_last_dim=8, **{k: v for k, v in tiny.items() if k != "head_last_dim"})
    trainer = Trainer(cfg, model=model, teacher=teacher)  # random teacher warning
    assert trainer.distill is not None and trainer.distill.distill_only

    rng = np.random.default_rng(6)

    def batches():
        while True:
            k = np.asarray([[0.9, 0, 0.5], [0, 0.9, 0.5], [0, 0, 1.0]], np.float32)
            ext = np.broadcast_to(np.eye(4, dtype=np.float32), (8, 1, 4, 4)).copy()
            yield Batch(
                context_images=jnp.asarray(rng.uniform(0, 1, (8, 2, 16, 16, 3)), jnp.float32),
                context_intrinsics=jnp.broadcast_to(jnp.asarray(k), (8, 2, 3, 3)),
                target_extrinsics=jnp.asarray(ext),
                target_intrinsics=jnp.broadcast_to(jnp.asarray(k), (8, 1, 3, 3)),
                target_near=jnp.full((8, 1), 0.5),
                target_far=jnp.full((8, 1), 100.0),
                style_image=jnp.asarray(rng.uniform(0, 1, (8, 16, 16, 3)), jnp.float32),
                target_images=jnp.asarray(rng.uniform(0, 1, (8, 1, 16, 16, 3)), jnp.float32),
            )

    state = trainer.fit(max_steps=2, batches=batches())
    assert int(state.step) == 2
    import json as _json

    lines = [
        _json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()
    ]
    assert any("distill" in l for l in lines)
    assert all(np.isfinite(l["loss"]) for l in lines if "loss" in l)


def test_aspect_bucketed_mixed_ar_training(tmp_path):
    """VERDICT r2 item 6: a mixed portrait+landscape stream trains through
    exactly two jitted step graphs (aspect buckets at collation; the
    landscape graph runs normally, the portrait graph via the ManyAR
    transpose-to-landscape path)."""
    from styl3r_tpu.utils.config import load_config
    from styl3r_tpu.train.trainer import Trainer

    cfg = load_config(
        None,
        [
            f"checkpointing.output_dir={tmp_path}",
            "losses.mse=1.0",
            "train.val_every_n_steps=100",
            "train.log_every_n_steps=1",
            "model.decoder.max_per_tile=128",
            "model.decoder.max_tiles_per_gaussian=4",
            "checkpointing.every_n_train_steps=100",
        ],
    )
    model = Styl3rModel(
        sh_degree=0, enc_depth=1, dec_depth=2, enc_dim=32, dec_dim=16,
        enc_heads=2, dec_heads=2, head_feature_dim=16, head_last_dim=16,
        head_layer_dims=(8, 8, 16, 16),
    )
    trainer = Trainer(cfg, model=model)
    rng = np.random.default_rng(9)

    def make_batch(h, w):
        n = 8  # divisible by the 8-device test mesh
        k = np.asarray([[0.9, 0, 0.5], [0, 0.9, 0.5], [0, 0, 1.0]], np.float32)
        ext = np.broadcast_to(np.eye(4, dtype=np.float32), (n, 1, 4, 4)).copy()
        return Batch(
            context_images=jnp.asarray(rng.uniform(0, 1, (n, 2, h, w, 3)), jnp.float32),
            context_intrinsics=jnp.broadcast_to(jnp.asarray(k), (n, 2, 3, 3)),
            target_extrinsics=jnp.asarray(ext),
            target_intrinsics=jnp.broadcast_to(jnp.asarray(k), (n, 1, 3, 3)),
            target_near=jnp.full((n, 1), 0.5),
            target_far=jnp.full((n, 1), 100.0),
            style_image=jnp.asarray(rng.uniform(0, 1, (n, 16, 16, 3)), jnp.float32),
            target_images=jnp.asarray(rng.uniform(0.4, 0.6, (n, 1, h, w, 3)), jnp.float32),
        )

    def batches():
        while True:
            yield make_batch(16, 32)  # landscape
            yield make_batch(32, 16)  # portrait

    state = trainer.fit(max_steps=4, batches=batches())
    assert int(state.step) == 4
    assert set(trainer._step_cache.keys()) == {(16, 32), (32, 16)}


def test_batch_iterator_aspect_buckets():
    """batch_iterator(aspect_buckets=True) groups a mixed-shape stream into
    shape-homogeneous batches."""
    from styl3r_tpu.data.dataset import batch_iterator

    class _Views:
        def __init__(self, img):
            self.image = img
            self.intrinsics = np.eye(3, dtype=np.float32)[None].repeat(img.shape[0], 0)
            self.extrinsics = np.eye(4, dtype=np.float32)[None].repeat(img.shape[0], 0)
            self.near = np.full((img.shape[0],), 0.5, np.float32)
            self.far = np.full((img.shape[0],), 10.0, np.float32)

    class _Ex:
        def __init__(self, h, w):
            self.context = _Views(np.zeros((2, h, w, 3), np.float32))
            self.target = _Views(np.zeros((1, h, w, 3), np.float32))
            self.style_image = np.zeros((16, 16, 3), np.float32)

    stream = [_Ex(16, 32), _Ex(32, 16), _Ex(16, 32), _Ex(32, 16)]
    batches = list(batch_iterator(stream, batch_size=2, aspect_buckets=True))
    shapes = sorted(b.context_images.shape[2:4] for b in batches)
    assert shapes == [(16, 32), (32, 16)]
    assert all(b.context_images.shape[0] == 2 for b in batches)
