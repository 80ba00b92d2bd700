"""Batch rendering CLI (parity: `render.py`).

Renders train/test views for a target ∈ {scene, seg, feature,
contrastive_feature}; `seg` additionally writes binarised 2D masks
(`render.py:46-58`), and a precomputed 3D mask (.pt/.npy) can be applied to
segment the Gaussians before rendering (`render.py:75-93`).
"""

from __future__ import annotations

import os
import sys

import numpy as np


def main(argv=None):
    import jax.numpy as jnp
    from PIL import Image

    from seganygaussians_tpu import render as R
    from seganygaussians_tpu.config import extract, load_cfg, make_parser
    from seganygaussians_tpu.models import feature_gaussians as fgm
    from seganygaussians_tpu.models import gaussians as gm
    from seganygaussians_tpu.ops.rasterize import RasterConfig, rasterize
    from seganygaussians_tpu.scene import ModelConfig, Scene

    parser = make_parser("Batch rendering")
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--target", type=str, default="scene")
    parser.add_argument("--segment", action="store_true")
    parser.add_argument("--precomputed_mask", type=str, default=None)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--backend", type=str, default="auto")
    parser.add_argument("--raster_capacity", type=int, default=1 << 20)
    args = parser.parse_args(argv)

    cfg = extract(ModelConfig, args)
    saved = load_cfg(cfg.model_path, "cfg_args")
    if saved and not cfg.source_path and "model" in saved:
        cfg.source_path = saved["model"].get("source_path", "")

    feature_mode = "feature" in args.target
    scene = Scene(
        cfg,
        need_scene=not feature_mode,
        need_features_model=feature_mode,
        load_iteration=args.iteration,
        feature_load_iteration=args.iteration if feature_mode else None,
        target=args.target,
        mode="eval",
        shuffle=False,
    )
    raster_cfg = RasterConfig(capacity=args.raster_capacity, backend=args.backend)
    bg = jnp.asarray(
        [1.0, 1.0, 1.0] if cfg.white_background else [0.0, 0.0, 0.0], jnp.float32
    )

    mask3d = None
    if args.precomputed_mask:
        if args.precomputed_mask.endswith(".pt"):
            import torch

            mask3d = np.asarray(
                torch.load(args.precomputed_mask, map_location="cpu",
                           weights_only=False)
            ).astype(bool)
        else:
            mask3d = np.load(args.precomputed_mask).astype(bool)
        if scene.gaussians is not None:
            cap = scene.gaussians.alive.shape[0]
            m = np.zeros(cap, bool)
            m[: len(mask3d)] = mask3d
            scene.gaussians = gm.segment(scene.gaussians, jnp.asarray(m))

    it = scene.loaded_iter or scene.feature_loaded_iter or args.iteration
    splits = []
    if not args.skip_train:
        splits.append(("train", scene.get_train_cameras()))
    if not args.skip_test and scene.get_test_cameras():
        splits.append(("test", scene.get_test_cameras()))

    for split, cams in splits:
        out_dir = os.path.join(
            cfg.model_path, args.target, f"ours_{it}", split, "renders"
        )
        os.makedirs(out_dir, exist_ok=True)
        for idx, cam in enumerate(cams):
            if feature_mode:
                fs = scene.feature_gaussians
                out = rasterize(
                    jnp.asarray(fs.geom.xyz),
                    jnp.asarray(fgm.get_opacity(fs.geom))[:, 0],
                    cam.params,
                    colors=jnp.asarray(fs.point_features),
                    scales=jnp.asarray(fgm.get_scaling(fs.geom)),
                    rotations=jnp.asarray(fgm.get_rotation(fs.geom)),
                    bg=jnp.zeros((fs.point_features.shape[-1],), jnp.float32),
                    config=raster_cfg,
                )
                np.save(
                    os.path.join(out_dir, f"{idx:05d}.npy"), np.asarray(out.color)
                )
            else:
                pkg = R.render(cam.params, scene.gaussians, bg, config=raster_cfg)
                img = np.clip(np.asarray(pkg["render"]), 0, 1)
                Image.fromarray((img * 255).astype(np.uint8)).save(
                    os.path.join(out_dir, f"{idx:05d}.png")
                )
                if args.target == "seg":
                    mpkg = R.render_mask(cam.params, scene.gaussians, bg,
                                         config=raster_cfg)
                    m2d = (np.asarray(mpkg["mask"]) > 0.5).astype(np.uint8) * 255
                    mask_dir = out_dir.replace("renders", "masks")
                    os.makedirs(mask_dir, exist_ok=True)
                    Image.fromarray(m2d).save(
                        os.path.join(mask_dir, f"{idx:05d}.png")
                    )
        print(f"rendered {len(cams)} {split} views → {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
