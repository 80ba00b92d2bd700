#!/usr/bin/env bash
# Per-scene preprocessing chain (parity: reference `prepare_data.sh`):
# SAM masks -> per-mask 3D scales -> per-mask CLIP features.
#   usage: scripts/prepare_data.sh <image_root> <model_path> <sam_checkpoint>
set -e
python -m seganygaussians_tpu.cli.extract_segment_everything_masks \
  --image_root "$1" --downsample 4 --sam_checkpoint_path "$3"
python -m seganygaussians_tpu.cli.get_scale --source_path "$1" --model_path "$2"
python -m seganygaussians_tpu.cli.get_clip_features --image_root "$1"
