"""COLMAP/LLFF ingestion tests, using the reference's bundled test scene when
present (read-only) plus synthetic round trips."""

from pathlib import Path

import numpy as np
import pytest

from styl3r_tpu.data.colmap import (
    auto_orient_and_center_poses,
    camera_intrinsics_normalized,
    llff_intrinsics_normalized,
    qvec2rotmat,
    read_cameras_binary,
    read_cameras_text,
    read_images_text,
    read_llff_poses,
    ColmapCamera,
)

BUNDLED = Path("/root/reference/colmap_test_data/scenes/train")


def test_qvec2rotmat():
    np.testing.assert_allclose(qvec2rotmat(np.array([1.0, 0, 0, 0])), np.eye(3), atol=1e-9)
    # 90 deg about z: q = (cos45, 0, 0, sin45)
    s = np.sin(np.pi / 4)
    r = qvec2rotmat(np.array([s, 0, 0, s]))
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)
    np.testing.assert_allclose(r[:2, :2], [[0, -1], [1, 0]], atol=1e-9)


def test_camera_intrinsics_normalized():
    cam = ColmapCamera(1, "PINHOLE", 640, 480, np.array([320.0, 240.0, 320.0, 240.0]))
    k = camera_intrinsics_normalized(cam)
    np.testing.assert_allclose(k[0, 0], 0.5)
    np.testing.assert_allclose(k[1, 1], 0.5)
    np.testing.assert_allclose(k[0, 2], 0.5)


def test_text_parsers(tmp_path):
    (tmp_path / "cameras.txt").write_text(
        "# comment\n1 SIMPLE_PINHOLE 256 256 290.0 128.0 128.0\n"
    )
    cams = read_cameras_text(tmp_path / "cameras.txt")
    assert cams[1].model == "SIMPLE_PINHOLE"
    np.testing.assert_allclose(cams[1].params, [290.0, 128.0, 128.0])

    (tmp_path / "images.txt").write_text(
        "# comment\n1 1 0 0 0 0.5 1.5 2.5 1 img01.png\n100 200 -1\n"
    )
    imgs = read_images_text(tmp_path / "images.txt")
    assert imgs[1].name == "img01.png"
    np.testing.assert_allclose(imgs[1].tvec, [0.5, 1.5, 2.5])


@pytest.mark.skipif(not BUNDLED.exists(), reason="bundled scene absent")
def test_bundled_cameras_binary():
    cams = read_cameras_binary(BUNDLED / "sparse" / "0" / "cameras.bin")
    assert len(cams) == 1
    cam = next(iter(cams.values()))
    assert cam.model == "SIMPLE_PINHOLE"
    assert cam.width == 256 and cam.height == 256
    k = camera_intrinsics_normalized(cam)
    assert 0.4 < k[0, 2] < 0.6  # roughly centered principal point


@pytest.mark.skipif(not BUNDLED.exists(), reason="bundled scene absent")
def test_bundled_llff_poses():
    poses, hwf, bounds = read_llff_poses(BUNDLED / "poses_bounds.npy")
    assert poses.shape == (301, 4, 4)
    # valid rigid transforms
    rot = poses[:, :3, :3]
    eye = rot @ np.swapaxes(rot, -1, -2)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-4)
    det = np.linalg.det(rot)
    np.testing.assert_allclose(det, np.ones(301), atol=1e-4)
    assert (bounds[:, 0] > 0).all()
    k = llff_intrinsics_normalized(hwf)
    assert (k[:, 0, 0] > 0.3).all() and (k[:, 0, 0] < 3.0).all()


def test_auto_orient_and_center():
    rng = np.random.default_rng(0)
    poses = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    poses[:, :3, 3] = rng.normal(size=(5, 3)) + 10.0
    oriented, transform = auto_orient_and_center_poses(poses)
    # Centered: mean origin at ~0
    np.testing.assert_allclose(oriented[:, :3, 3].mean(axis=0), 0, atol=1e-5)
    # Mean up vector (+y col of c2w) aligned with world +z
    up = oriented[:, :3, 1].mean(axis=0)
    up /= np.linalg.norm(up)
    np.testing.assert_allclose(up, [0, 0, 1], atol=1e-5)
