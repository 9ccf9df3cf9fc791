"""Data pipeline tests on synthetic chunks (fake RE10K scenes with real JPEG
bytes), covering chunk reading, pose conversion, view sampling, shims, the
full dataset iterator, and batch collation."""

import io
import json
from pathlib import Path

import numpy as np
import pytest
import torch
from PIL import Image

from styl3r_tpu.data import (
    DatasetConfig,
    RE10kStyleDataset,
    ViewSamplerBounded,
    ViewSamplerEvaluation,
    collate_examples,
    convert_poses_re10k,
    load_chunk,
    make_view_sampler,
)
from styl3r_tpu.data.dataset import batch_iterator
from styl3r_tpu.data.shims import (
    center_crop,
    prepare_style_image,
    rescale,
    rescale_and_crop,
)

H_ORIG, W_ORIG = 72, 96


def make_jpeg_bytes(rng, h=H_ORIG, w=W_ORIG):
    arr = (rng.uniform(0, 1, (h, w, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def make_scene(rng, key, n_frames=30):
    cameras = np.zeros((n_frames, 18), np.float32)
    cameras[:, 0] = 0.8  # fx
    cameras[:, 1] = 0.9  # fy
    cameras[:, 2:4] = 0.5
    for i in range(n_frames):
        w2c = np.eye(4, dtype=np.float32)
        w2c[0, 3] = -0.05 * i  # camera slides along +x
        cameras[i, 6:] = w2c[:3].reshape(-1)
    images = [torch.frombuffer(make_jpeg_bytes(rng), dtype=torch.uint8) for _ in range(n_frames)]
    return {"key": key, "cameras": torch.from_numpy(cameras), "images": images, "url": ""}


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("re10k")
    for stage in ("train", "test"):
        d = root / stage
        d.mkdir()
        scenes = [make_scene(rng, f"{stage}_scene_{i}") for i in range(3)]
        torch.save(scenes, d / "000000.torch")
        index = {s["key"]: "000000.torch" for s in scenes}
        (d / "index.json").write_text(json.dumps(index))
    # style root
    style = root / "styles" / "train"
    style.mkdir(parents=True)
    img = (np.random.default_rng(1).uniform(0, 1, (300, 400, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(style / "style0.jpg")
    mapping = {f"{stage}_scene_{i}": "style0.jpg" for stage in ("train", "test") for i in range(3)}
    (style / "scene_style_mapping_all.json").write_text(json.dumps(mapping))
    return root


def test_convert_poses():
    cams = np.zeros((2, 18), np.float32)
    cams[:, 0], cams[:, 1], cams[:, 2], cams[:, 3] = 0.8, 0.9, 0.5, 0.4
    w2c = np.eye(4, dtype=np.float32)
    w2c[0, 3] = 2.0
    cams[:, 6:] = w2c[:3].reshape(-1)
    c2w, k = convert_poses_re10k(cams)
    np.testing.assert_allclose(c2w[0, 0, 3], -2.0, atol=1e-6)
    np.testing.assert_allclose(k[0, 0, 0], 0.8)
    np.testing.assert_allclose(k[0, 1, 2], 0.4)


def test_load_chunk(data_root):
    chunk = load_chunk(data_root / "train" / "000000.torch")
    assert len(chunk) == 3
    assert chunk[0]["cameras"].shape == (30, 18)
    assert isinstance(chunk[0]["images"][0], bytes)


def test_bounded_sampler_properties():
    sampler = ViewSamplerBounded(
        num_context_views=3, num_target_views=4, min_gap=10, max_gap=20
    )
    rng = np.random.default_rng(2)
    for _ in range(20):
        s = sampler.sample("x", 30, rng)
        assert len(s.context) == 3
        gap = s.context[-1] - s.context[0]
        assert 10 <= gap <= 20
        assert (s.target >= s.context[0]).all() and (s.target <= s.context[-1]).all()
        assert (s.context[1:-1] > s.context[0]).all()
        assert (s.context[1:-1] < s.context[-1]).all()

    with pytest.raises(ValueError):
        ViewSamplerBounded(min_gap=50, max_gap=60).sample("x", 20, rng)


def test_evaluation_sampler(tmp_path):
    index = {"scene_a": {"context": [3, 40], "target": [10, 20, 30], "overlap": "large"}}
    p = tmp_path / "eval.json"
    p.write_text(json.dumps(index))
    s = ViewSamplerEvaluation(p)
    out = s.sample("scene_a", 50)
    np.testing.assert_array_equal(out.context, [3, 40])
    np.testing.assert_array_equal(out.target, [10, 20, 30])
    assert out.overlap == 0.85
    # 2 -> 3 context upsample hack
    s3 = ViewSamplerEvaluation(p, num_context_views=3)
    out3 = s3.sample("scene_a", 50)
    assert len(out3.context) == 3
    assert out3.context[0] == 3 and out3.context[-1] == 40


def test_shims():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (4, 40, 60, 3)).astype(np.float32)
    k = np.tile(np.eye(3, dtype=np.float32), (4, 1, 1))
    k[:, 0, 0], k[:, 1, 1] = 0.8, 0.9
    out, k2 = rescale_and_crop(img, k, (32, 32))
    assert out.shape == (4, 32, 32, 3)
    # landscape crop: fx scaled by w_in/w_out at the scaled resolution
    assert k2[0, 0, 0] > k[0, 0, 0]
    np.testing.assert_allclose(k2[:, 1, 1], k[:, 1, 1], atol=1e-6)  # height matched

    style = rng.uniform(0, 1, (120, 200, 3)).astype(np.float32)
    s = prepare_style_image(style, 64)
    assert s.shape == (64, 64, 3)


def test_dataset_end_to_end(data_root):
    cfg = DatasetConfig(
        roots=[data_root],
        style_root=data_root / "styles",
        input_image_shape=(32, 32),
        original_image_shape=(H_ORIG, W_ORIG),
        baseline_min=1e-3,
        baseline_max=100.0,
    )
    sampler = ViewSamplerBounded(
        num_context_views=2, num_target_views=3, min_gap=5, max_gap=15
    )
    ds = RE10kStyleDataset(cfg, "train", sampler, seed=0)
    examples = []
    for ex in ds:
        examples.append(ex)
        if len(examples) == 3:
            break
    assert len(examples) == 3
    ex = examples[0]
    assert ex.context.image.shape == (2, 32, 32, 3)
    assert ex.target.image.shape == (3, 32, 32, 3)
    assert ex.style_image.shape == (256, 256, 3)
    # relative pose: context cam 0 is identity
    np.testing.assert_allclose(ex.context.extrinsics[0], np.eye(4), atol=1e-5)
    # baseline 1: context0 -> context-last distance is 1
    d = np.linalg.norm(ex.context.extrinsics[-1][:3, 3])
    np.testing.assert_allclose(d, 1.0, atol=1e-4)
    # near is rescaled by the same factor
    assert ex.context.near[0] != 0.1 or abs(d - 1) < 1e-4


def test_batch_iterator_and_collate(data_root):
    cfg = DatasetConfig(
        roots=[data_root],
        style_root=data_root / "styles",
        input_image_shape=(32, 32),
        original_image_shape=(H_ORIG, W_ORIG),
    )
    sampler = ViewSamplerBounded(num_context_views=2, num_target_views=3, min_gap=5, max_gap=15)
    ds = RE10kStyleDataset(cfg, "train", sampler, seed=1)
    it = batch_iterator(ds, batch_size=2)
    batch = next(it)
    assert batch.context_images.shape == (2, 2, 32, 32, 3)
    assert batch.target_images.shape == (2, 3, 32, 32, 3)
    assert batch.style_image.shape == (2, 256, 256, 3)
    assert batch.target_near.shape == (2, 3)


def test_overfit_to_scene(data_root):
    cfg = DatasetConfig(
        roots=[data_root],
        style_root=data_root / "styles",
        input_image_shape=(32, 32),
        original_image_shape=(H_ORIG, W_ORIG),
        overfit_to_scene="test_scene_1",
    )
    sampler = ViewSamplerBounded(num_context_views=2, num_target_views=2, min_gap=5, max_gap=10)
    ds = RE10kStyleDataset(cfg, "train", sampler, seed=2)
    for i, ex in enumerate(ds):
        assert ex.scene == "test_scene_1"
        if i == 4:
            break


def test_scannet_pose_dataset_synthetic_layout(tmp_path):
    """ScannetPoseDataset over a synthetic ScanNet-shaped directory
    (test.npz pairs + scans_test/<scene>/color + intrinsic_color.txt),
    including the center-principal-point padding and K normalization
    (reference dataset_scannet_pose.py:82-230)."""
    from PIL import Image
    from styl3r_tpu.data.scannet_pose import ScannetPoseDataset, center_principal_point

    rng = np.random.default_rng(13)
    scene = tmp_path / "scans_test" / "scene0707_00"
    (scene / "color").mkdir(parents=True)
    (scene / "intrinsic").mkdir(parents=True)
    h, w = 120, 160
    for fid in (10, 40):
        arr = (rng.uniform(0, 1, (h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(scene / "color" / f"{fid}.jpg")
    # Off-center principal point exercises the padding path.
    k = np.asarray(
        [[140.0, 0, 70.0, 0], [0, 140.0, 68.0, 0], [0, 0, 1, 0], [0, 0, 0, 1]]
    )
    (scene / "intrinsic" / "intrinsic_color.txt").write_text(
        "\n".join(" ".join(str(x) for x in row) for row in k)
    )
    rel = np.eye(4)[:3].reshape(-1)
    rel[3] = 0.3  # translation in the relative pose
    np.savez(
        tmp_path / "test.npz",
        name=np.asarray([[707, 0, 10, 40]]),
        rel_pose=rel[None],
    )

    ds = ScannetPoseDataset(tmp_path, input_image_shape=(64, 64))
    examples = list(ds)
    assert len(examples) == 1
    ex = examples[0]
    assert ex.scene == "scene0707_00"
    assert ex.context.image.shape == (2, 64, 64, 3)
    assert ex.context.extrinsics.shape == (2, 4, 4)
    # view-2 extrinsics = inv(rel_pose): translation -0.3 on x.
    np.testing.assert_allclose(ex.context.extrinsics[1, 0, 3], -0.3, atol=1e-6)
    # principal point centered after padding + crop: cx = cy = 0.5.
    np.testing.assert_allclose(ex.context.intrinsics[0, :2, 2], 0.5, atol=0.02)
    # fx/fy stay positive-normalized.
    assert 0 < ex.context.intrinsics[0, 0, 0] < 10

    # Padding math: a (2, 10, 12, 3) image with cx=3, cy=7 pads right/top.
    imgs = np.ones((2, 10, 12, 3), np.float32)
    out, ncx, ncy = center_principal_point(imgs, 3.0, 7.0)
    assert out.shape[1] >= 10 and out.shape[2] >= 12
    assert ncx == out.shape[2] // 2 and ncy == out.shape[1] // 2

    # Negative shift (principal point right of / below center): the reference
    # crops the source at w+shift_x / h+shift_y, zeroing the far band
    # (dataset_scannet_pose.py:168-174). w=12, cx=8 -> shift_x=-2: keep source
    # cols [0, 10) at dest [2, 12), zero-pad cols [0, 2) and [12, 16).
    imgs = np.arange(2 * 10 * 12 * 3, dtype=np.float32).reshape(2, 10, 12, 3)
    out, ncx, ncy = center_principal_point(imgs, 8.0, 5.0)
    assert out.shape == (2, 10, 16, 3)
    np.testing.assert_array_equal(out[:, :, :2], 0.0)
    np.testing.assert_array_equal(out[:, :, 12:], 0.0)
    np.testing.assert_array_equal(out[:, :, 2:12], imgs[:, :, :10])
