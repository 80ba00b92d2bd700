"""Generate a small-but-real synthetic COLMAP scene for end-to-end evidence.

Creates `examples/synth_scene/`: a ground-truth Gaussian scene (three colored
blob objects + a ground slab), 48 cameras on two rings, ground-truth images
rendered with the XLA oracle rasterizer, COLMAP sparse/0 binaries (cameras,
images, noisy SfM-like points3D), plus SAM-style per-object instance masks
(`sam_masks/<image>.pt`) and their 3D scales (`mask_scales/<image>.pt`) so
the full SAGA pipeline — scene training (BASELINE config 2 analogue),
depth/scale extraction (config 3), contrastive feature training (config 4) —
runs from files alone, exactly like a reference dataset directory.

Deterministic (seeded); ~1.5 MB on disk.  Usage:
    python tools/make_synth_scene.py [--root examples/synth_scene]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

W, H, F = 200, 150, 180.0
N_CAMS = 48


def gt_scene(rng):
    """Ground-truth Gaussians: 3 colored blobs + ground slab. Returns dict of
    arrays + per-Gaussian object id (0 = ground, 1..3 = objects)."""
    parts = []
    obj_ids = []
    centers = [(-0.8, 0.0, 0.0), (0.6, -0.1, 0.5), (0.0, 0.25, -0.6)]
    base_cols = [(0.9, 0.25, 0.2), (0.2, 0.7, 0.9), (0.85, 0.8, 0.2)]
    for oid, (cx, cy, cz) in enumerate(centers, start=1):
        k = 160
        pts = rng.normal(scale=0.22, size=(k, 3)) * np.array([1.0, 0.8, 1.0])
        pts += np.array([cx, cy, cz])
        cols = np.clip(
            np.array(base_cols[oid - 1]) + rng.normal(scale=0.08, size=(k, 3)),
            0.05, 0.95,
        )
        parts.append((pts, cols, np.full(k, 0.065), np.full(k, 0.92)))
        obj_ids.append(np.full(k, oid))
    # ground slab
    k = 240
    gx = rng.uniform(-1.8, 1.8, k)
    gz = rng.uniform(-1.8, 1.8, k)
    gy = np.full(k, 0.55) + rng.normal(scale=0.01, size=k)
    pts = np.stack([gx, gy, gz], 1)
    shade = rng.uniform(0.35, 0.55, k)
    cols = np.stack([shade, shade * 0.9, shade * 0.75], 1)
    parts.append((pts, cols, np.full(k, 0.11), np.full(k, 0.85)))
    obj_ids.append(np.zeros(k))

    xyz = np.concatenate([p[0] for p in parts]).astype(np.float32)
    rgb = np.concatenate([p[1] for p in parts]).astype(np.float32)
    scale = np.concatenate([p[2] for p in parts]).astype(np.float32)
    opac = np.concatenate([p[3] for p in parts]).astype(np.float32)
    oid = np.concatenate(obj_ids).astype(np.int32)
    return xyz, rgb, scale, opac, oid


def ring_cameras():
    """48 poses: two rings looking at the origin."""
    from tests.conftest import lookat_qvec_tvec  # reuse the fixture math

    poses = []
    for ring, (r, y) in enumerate([(3.2, -0.7), (2.6, -1.4)]):
        for i in range(N_CAMS // 2):
            ang = 2 * np.pi * i / (N_CAMS // 2) + ring * 0.13
            eye = np.array([r * np.cos(ang), y, r * np.sin(ang)])
            qvec, tvec = lookat_qvec_tvec(eye, np.zeros(3))
            poses.append((qvec, tvec))
    return poses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="examples/synth_scene")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax.numpy as jnp
    import torch
    from PIL import Image

    from seganygaussians_tpu.data import colmap
    from seganygaussians_tpu.ops.camera import make_camera
    from seganygaussians_tpu.ops.rasterize import RasterConfig, rasterize

    rng = np.random.default_rng(42)
    xyz, rgb, scale, opac, oid = gt_scene(rng)
    n = len(xyz)
    quats = np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1))

    root = args.root
    sparse = os.path.join(root, "sparse", "0")
    images_dir = os.path.join(root, "images")
    masks_dir = os.path.join(root, "sam_masks")
    scales_dir = os.path.join(root, "mask_scales")
    for d in (sparse, images_dir, masks_dir, scales_dir):
        os.makedirs(d, exist_ok=True)

    cams = {1: colmap.ColmapCamera(
        1, "PINHOLE", W, H, np.array([F, F, W / 2, H / 2]))}
    colmap.write_cameras_binary(os.path.join(sparse, "cameras.bin"), cams)

    cfg = RasterConfig(capacity=1 << 17, backend="xla")
    poses = ring_cameras()
    images = {}
    import math

    fovx = 2 * math.atan(W / (2 * F))
    fovy = 2 * math.atan(H / (2 * F))
    for i, (qvec, tvec) in enumerate(poses):
        name = f"view_{i:03d}.png"
        images[i + 1] = colmap.ColmapImage(i + 1, qvec, tvec, 1, name)
        # R convention matches data/readers.py:76: cam->world rotation.
        cam = make_camera(colmap.qvec2rotmat(qvec).T, tvec,
                          fovx=fovx, fovy=fovy, width=W, height=H)
        out = rasterize(
            jnp.asarray(xyz), jnp.asarray(opac), cam,
            colors=jnp.asarray(rgb),
            scales=jnp.tile(jnp.asarray(scale)[:, None], (1, 3)),
            rotations=jnp.asarray(quats), bg=jnp.zeros(3), config=cfg,
        )
        img = np.clip(np.asarray(out.color), 0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(images_dir, name)
        )

        # SAM-style masks: alpha-composited per-object coverage, binarized.
        onehot = (oid[:, None] == np.arange(1, 4)[None, :]).astype(np.float32)
        mout = rasterize(
            jnp.asarray(xyz), jnp.asarray(opac), cam,
            colors=jnp.asarray(onehot),
            scales=jnp.tile(jnp.asarray(scale)[:, None], (1, 3)),
            rotations=jnp.asarray(quats), bg=jnp.zeros(3), config=cfg,
        )
        cov = np.asarray(mout.color)  # (H, W, 3) per-object coverage
        masks = (cov > 0.5).transpose(2, 0, 1)  # (3, H, W)
        keep = masks.reshape(3, -1).sum(1) > 40
        masks = masks[keep]
        torch.save(torch.tensor(masks),
                   os.path.join(masks_dir, f"view_{i:03d}.pt"))
        # 3D mask scales: 2×std-norm of each object's GT points (the
        # get_scale.py definition applied to the true geometry).
        mscales = []
        for o in np.arange(1, 4)[keep]:
            p = xyz[oid == o]
            mscales.append(float(np.linalg.norm(2.0 * p.std(axis=0))))
        torch.save(torch.tensor(np.asarray(mscales, np.float32)),
                   os.path.join(scales_dir, f"view_{i:03d}.pt"))
        if (i + 1) % 12 == 0:
            print(f"rendered {i + 1}/{len(poses)} views", flush=True)

    colmap.write_images_binary(os.path.join(sparse, "images.bin"), images)

    # SfM-like sparse points: noisy subset of the GT means.
    sel = rng.random(n) < 0.6
    pts3d = xyz[sel] + rng.normal(scale=0.01, size=(sel.sum(), 3))
    cols3d = np.clip(rgb[sel] * 255, 0, 255).astype(np.uint8)
    colmap.write_points3d_binary(
        os.path.join(sparse, "points3D.bin"), pts3d, cols3d
    )
    print(f"scene written to {root}: {len(poses)} views, "
          f"{sel.sum()} sfm points, gt gaussians {n}")


if __name__ == "__main__":
    main()
