"""SAM segment-everything mask extraction CLI
(parity: `extract_segment_everything_masks.py`).

Runs ``SamAutomaticMaskGenerator`` (ViT-H, 32×32 point grid, pred_iou 0.88,
stability 0.95 — `extract_segment_everything_masks.py:29-38`) on every image
and saves a bool mask stack to ``sam_masks/<image>.pt``.  SAM is a frozen
offline preprocessing model (SURVEY.md §2.4); it needs the ``segment_anything``
package + a ViT-H checkpoint on disk — both optional dependencies of this
framework.  Downsampling modes match `:40-48,67-71`.
"""

from __future__ import annotations

import os
import sys


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--image_root", type=str, required=True)
    parser.add_argument("--sam_checkpoint_path", type=str, required=True)
    parser.add_argument("--sam_arch", type=str, default="vit_h")
    parser.add_argument("--downsample", type=str, default="1",
                        choices=["1", "2", "4", "8"])
    parser.add_argument(
        "--downsample_type", type=str, default="image", choices=["image", "mask"]
    )
    args = parser.parse_args(argv)

    try:
        import torch
        from segment_anything import SamAutomaticMaskGenerator, sam_model_registry
    except ImportError as e:
        print(
            "segment_anything is not installed — SAM extraction is an offline "
            "preprocessing step; install it (and download a ViT-H checkpoint) "
            "or bring precomputed sam_masks/*.pt sidecars.",
            file=sys.stderr,
        )
        raise SystemExit(2) from e

    import numpy as np
    from PIL import Image

    downsample = int(args.downsample)
    sam = sam_model_registry[args.sam_arch](checkpoint=args.sam_checkpoint_path)
    if torch.cuda.is_available():
        sam = sam.cuda()
    generator = SamAutomaticMaskGenerator(
        model=sam,
        points_per_side=32,
        pred_iou_thresh=0.88,
        box_nms_thresh=0.7,
        stability_score_thresh=0.95,
        crop_n_layers=0,
        crop_n_points_downscale_factor=1,
        min_mask_region_area=100,
    )

    images_dir = os.path.join(args.image_root, "images")
    out_dir = os.path.join(args.image_root, "sam_masks")
    os.makedirs(out_dir, exist_ok=True)
    for name in sorted(os.listdir(images_dir)):
        img = np.array(Image.open(os.path.join(images_dir, name)).convert("RGB"))
        if args.downsample_type == "image" and downsample > 1:
            h, w = img.shape[:2]
            img = np.array(
                Image.fromarray(img).resize((w // downsample, h // downsample))
            )
        masks = generator.generate(img)
        stack = torch.from_numpy(
            np.stack([m["segmentation"] for m in masks])
        ).bool()
        if args.downsample_type == "mask" and downsample > 1:
            stack = torch.nn.functional.interpolate(
                stack[None].float(),
                (stack.shape[-2] // downsample, stack.shape[-1] // downsample),
                mode="nearest",
            )[0].bool()
        torch.save(stack, os.path.join(out_dir, name.split(".")[0] + ".pt"))
        print(f"{name}: {len(stack)} masks")
    return 0


if __name__ == "__main__":
    sys.exit(main())
