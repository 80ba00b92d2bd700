"""Test config: force an 8-device CPU mesh so sharding tests run anywhere.

Must set env vars before jax is imported anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override: the shell env forces axon/TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# pytest plugins import jax before this conftest runs, so the env var alone is
# not enough — override the (lazily-initialized) platform at runtime too.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def lookat_qvec_tvec(eye, target):
    """World→cam (qvec, tvec) for a camera at `eye` looking at `target`."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, -1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    Rwc = np.stack([right, up2, fwd], axis=0)
    t = -Rwc @ eye
    tr = np.trace(Rwc)
    w = np.sqrt(max(0.0, 1 + tr)) / 2
    x = (Rwc[2, 1] - Rwc[1, 2]) / (4 * w)
    y = (Rwc[0, 2] - Rwc[2, 0]) / (4 * w)
    z = (Rwc[1, 0] - Rwc[0, 1]) / (4 * w)
    return np.array([w, x, y, z]), t


@pytest.fixture
def colmap_scene(tmp_path):
    """Synthetic COLMAP scene: 6 cameras on a circle + 100 colored points."""
    from PIL import Image

    from seganygaussians_tpu.data import colmap

    root = tmp_path / "scene"
    sparse = root / "sparse" / "0"
    images_dir = root / "images"
    sparse.mkdir(parents=True)
    images_dir.mkdir(parents=True)

    w, h, f = 64, 48, 60.0
    cams = {
        1: colmap.ColmapCamera(1, "PINHOLE", w, h, np.array([f, f, w / 2, h / 2]))
    }
    colmap.write_cameras_binary(str(sparse / "cameras.bin"), cams)

    rng = np.random.default_rng(0)
    images = {}
    for i in range(6):
        ang = 2 * np.pi * i / 6
        eye = np.array([3 * np.cos(ang), 0.5, 3 * np.sin(ang)])
        qvec, tvec = lookat_qvec_tvec(eye, np.zeros(3))
        name = f"img_{i:03d}.png"
        images[i + 1] = colmap.ColmapImage(i + 1, qvec, tvec, 1, name)
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(images_dir / name)
    colmap.write_images_binary(str(sparse / "images.bin"), images)

    xyz = rng.normal(scale=0.5, size=(100, 3))
    rgb = rng.integers(0, 255, (100, 3), dtype=np.uint8)
    colmap.write_points3d_binary(str(sparse / "points3D.bin"), xyz, rgb)
    return str(root)
