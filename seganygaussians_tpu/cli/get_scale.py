"""Per-mask 3D scale extraction CLI (parity: `get_scale.py`).

Reads `sam_masks/<image>.pt`, renders depth through the trained scene model,
writes `mask_scales/<image>.pt` (torch tensors, reference-compatible).
"""

from __future__ import annotations

import os
import sys

import numpy as np


def main(argv=None):
    import torch

    from seganygaussians_tpu.config import extract, load_cfg, make_parser
    from seganygaussians_tpu.ops.rasterize import RasterConfig
    from seganygaussians_tpu.preprocess import compute_mask_scales
    from seganygaussians_tpu.scene import ModelConfig, Scene

    parser = make_parser("Mask scale extraction")
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--backend", type=str, default="auto")
    parser.add_argument("--raster_capacity", type=int, default=1 << 20)
    args = parser.parse_args(argv)

    cfg = extract(ModelConfig, args)
    saved = load_cfg(cfg.model_path, "cfg_args")
    if saved and not cfg.source_path and "model" in saved:
        cfg.source_path = saved["model"].get("source_path", "")
    cfg.need_masks = True

    scene = Scene(cfg, load_iteration=args.iteration, mode="train",
                  target="scene", shuffle=False)
    raster_cfg = RasterConfig(capacity=args.raster_capacity, backend=args.backend)

    out_dir = os.path.join(cfg.source_path, "mask_scales")
    os.makedirs(out_dir, exist_ok=True)
    for cam in scene.get_train_cameras():
        masks = cam.sam_masks
        if masks is None:
            print(f"skip {cam.image_name}: no sam_masks sidecar")
            continue
        scales = np.asarray(
            compute_mask_scales(cam, scene.gaussians, masks, raster_cfg)
        )
        torch.save(torch.tensor(scales), os.path.join(out_dir, cam.image_name + ".pt"))
        print(f"{cam.image_name}: {len(scales)} masks, "
              f"scale range [{scales.min():.3f}, {scales.max():.3f}]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
