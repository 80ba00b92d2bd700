#!/usr/bin/env bash
# Contrastive-feature training sweep (parity: reference `training_scripts/`):
# 10k iterations, feature_lr 2.5e-3, 1000 rays per scene model under $1.
# Replica-style scenes (pass --replica) use 1600 rays + smooth_K 8
# (`training_scripts/train_replica.sh`).
set -e
ROOT=${1:-./output}
RAYS=1000; SMOOTH_K=16
if [ "${2:-}" = "--replica" ]; then RAYS=1600; SMOOTH_K=8; fi
for m in "$ROOT"/*/; do
  echo "=== $m"
  python -m seganygaussians_tpu.cli.train_contrastive_feature \
    --model_path "$m" --iterations 10000 --feature_lr 0.0025 \
    --num_sampled_rays "$RAYS" --smooth_k "$SMOOTH_K"
done
