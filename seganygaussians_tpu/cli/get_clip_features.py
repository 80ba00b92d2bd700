"""Per-mask CLIP feature extraction CLI (parity: `get_clip_features.py`).

Reads ``images/`` + ``sam_masks/<image>.pt``, blanks the background of each
mask, crops to its bbox, CLIP-encodes the crop, and writes reference-
compatible ``clip_features/<image>.pt`` stacks — completing the text-prompt
pipeline (BASELINE config 5) from images + masks alone.
"""

from __future__ import annotations

import sys
from argparse import ArgumentParser


def main(argv=None):
    parser = ArgumentParser(description="Get CLIP features with SAM masks")
    parser.add_argument("--image_root", type=str, required=True)
    parser.add_argument(
        "--background", type=float, default=0.0,
        help="blanked-background gray level in [0,1] (reference uses 0)",
    )
    parser.add_argument(
        "--model_name", type=str, default="openai/clip-vit-base-patch16"
    )
    args = parser.parse_args(argv)

    from seganygaussians_tpu.seg.clip_image import extract_scene_clip_features
    from seganygaussians_tpu.seg.clip_text import ClipEncoder

    encoder = ClipEncoder(args.model_name)
    written = extract_scene_clip_features(
        args.image_root, encoder, background=args.background
    )
    print(f"wrote {len(written)} clip_features sidecars")
    return 0


if __name__ == "__main__":
    sys.exit(main())
