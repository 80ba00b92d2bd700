#!/usr/bin/env bash
# Full end-to-end evidence run on the committed synthetic scene
# (BASELINE configs 2-4 analogues). Usage: scripts/run_synth_e2e.sh [iters]
set -e
ITERS=${1:-4000}
SRC=examples/synth_scene
OUT=output/synth_scene
python -m seganygaussians_tpu.cli.train_scene -s "$SRC" -m "$OUT" \
  --iterations "$ITERS" --eval --test_iterations $((ITERS/2)) "$ITERS" \
  --save_iterations "$ITERS" --disable_viewer
python -m seganygaussians_tpu.cli.get_scale --source_path "$SRC" --model_path "$OUT"
python -m seganygaussians_tpu.cli.train_contrastive_feature \
  --model_path "$OUT" --iterations 1500 --num_sampled_rays 512
