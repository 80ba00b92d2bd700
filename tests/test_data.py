"""Tests: COLMAP parsers, scene readers, camera loading, resolution policy."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from seganygaussians_tpu.data import colmap
from seganygaussians_tpu.data.cameras import compute_resolution, load_camera
from seganygaussians_tpu.data.readers import (
    detect_and_read,
    get_nerfpp_norm,
    read_blender_scene,
    read_colmap_scene,
)


# colmap_scene fixture lives in conftest.py (shared with test_scene.py)


def test_colmap_binary_roundtrip(colmap_scene):
    cams, images, pts = colmap.read_model(os.path.join(colmap_scene, "sparse/0"))
    assert len(cams) == 1 and cams[1].model == "PINHOLE"
    assert len(images) == 6
    assert images[1].name == "img_000.png"
    xyz, rgb, err = pts
    assert xyz.shape == (100, 3) and rgb.shape == (100, 3)


def test_read_colmap_scene(colmap_scene):
    info = read_colmap_scene(colmap_scene, eval_split=True, llffhold=3)
    assert len(info.train_cameras) == 4
    assert len(info.test_cameras) == 2
    assert info.points.shape == (100, 3)
    assert 0.0 <= info.colors.min() and info.colors.max() <= 1.0
    assert info.radius > 0
    # cached PLY created
    assert os.path.exists(os.path.join(colmap_scene, "sparse/0/points3D.ply"))


def test_detect_and_read_colmap(colmap_scene):
    info = detect_and_read(colmap_scene)
    assert len(info.train_cameras) == 6 and not info.test_cameras


def test_sample_rate(colmap_scene):
    info = read_colmap_scene(colmap_scene, sample_rate=0.5)
    # keeps idx%10 < 5 → cameras 0-4 of 6
    assert len(info.train_cameras) == 5


def test_load_camera(colmap_scene):
    info = read_colmap_scene(colmap_scene)
    cam = load_camera(info.train_cameras[0], uid=0, resolution=1)
    assert cam.image.shape == (48, 64, 3)
    assert cam.image.dtype == np.float32
    assert cam.params.width == 64 and cam.params.height == 48
    assert cam.feature_height == int(100 * 48 / 64)
    # camera center should be ~3.04 from origin (circle radius + y offset)
    c = np.asarray(cam.params.cam_center)
    np.testing.assert_allclose(np.linalg.norm(c), np.sqrt(9.25), rtol=1e-4)


def test_nerfpp_norm(colmap_scene):
    info = read_colmap_scene(colmap_scene)
    translate, radius = get_nerfpp_norm(info.train_cameras)
    # cameras on a radius-3 circle at y=0.5 → centroid ≈ (0, 0.5, 0)
    np.testing.assert_allclose(-translate[1], 0.5, atol=1e-6)
    np.testing.assert_allclose(radius, 3.0 * 1.1, rtol=1e-6)


def test_resolution_policy():
    assert compute_resolution(3200, 2400, -1) == (1600, 1200)
    assert compute_resolution(800, 600, -1) == (800, 600)
    assert compute_resolution(800, 600, 2) == (400, 300)
    assert compute_resolution(800, 600, 400) == (400, 300)


@pytest.fixture
def blender_scene(tmp_path):
    root = tmp_path / "lego"
    root.mkdir()
    (root / "train").mkdir()
    frames = []
    rng = np.random.default_rng(1)
    for i in range(4):
        ang = 2 * np.pi * i / 4
        c2w = np.eye(4)
        c2w[:3, 3] = [2 * np.cos(ang), 0.0, 2 * np.sin(ang)]
        name = f"./train/r_{i}"
        frames.append({"file_path": name, "transform_matrix": c2w.tolist()})
        arr = rng.integers(0, 255, (40, 50, 4), dtype=np.uint8)
        Image.fromarray(arr, "RGBA").save(root / "train" / f"r_{i}.png")
    with open(root / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": 0.7, "frames": frames}, f)
    return str(root)


def test_read_blender_scene(blender_scene):
    info = read_blender_scene(blender_scene)
    assert len(info.train_cameras) == 4
    assert info.points.shape == (100_000, 3)
    cam = load_camera(info.train_cameras[0], uid=0, resolution=1,
                      white_background=True)
    assert cam.image.shape == (40, 50, 3)
    # fovy derived from fovx and aspect
    assert info.train_cameras[0].fovy < info.train_cameras[0].fovx


def test_detect_blender(blender_scene):
    info = detect_and_read(blender_scene, white_background=True)
    assert len(info.train_cameras) == 4
