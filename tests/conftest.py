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
    # Robust rotmat→quat: branch on the largest of (trace, diagonal) so the
    # w≈0 case (180° rotations) never divides by zero — the naive trace-only
    # formula produced a NaN qvec for one camera of the committed synthetic
    # scene, and a single NaN pose poisons Adam state for the whole model.
    m = Rwc
    tr = np.trace(m)
    if tr > 0:
        s = 2.0 * np.sqrt(1.0 + tr)
        w = 0.25 * s
        x = (m[2, 1] - m[1, 2]) / s
        y = (m[0, 2] - m[2, 0]) / s
        z = (m[1, 0] - m[0, 1]) / s
    elif m[0, 0] >= m[1, 1] and m[0, 0] >= m[2, 2]:
        s = 2.0 * np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2])
        w = (m[2, 1] - m[1, 2]) / s
        x = 0.25 * s
        y = (m[0, 1] + m[1, 0]) / s
        z = (m[0, 2] + m[2, 0]) / s
    elif m[1, 1] >= m[2, 2]:
        s = 2.0 * np.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2])
        w = (m[0, 2] - m[2, 0]) / s
        x = (m[0, 1] + m[1, 0]) / s
        y = 0.25 * s
        z = (m[1, 2] + m[2, 1]) / s
    else:
        s = 2.0 * np.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1])
        w = (m[1, 0] - m[0, 1]) / s
        x = (m[0, 2] + m[2, 0]) / s
        y = (m[1, 2] + m[2, 1]) / s
        z = 0.25 * s
    q = np.array([w, x, y, z])
    q /= np.linalg.norm(q)
    return q, t


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
