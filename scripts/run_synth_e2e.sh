#!/usr/bin/env bash
# Full end-to-end evidence run on the committed synthetic scene
# (BASELINE configs 2-4 analogues). Usage: scripts/run_synth_e2e.sh [iters]
#
# Hyperparameters are scene-scaled, exactly as 3DGS users tune per capture:
# - densify_grad_threshold: the densifier thresholds MEAN NDC-space gradient
#   norms, and dL/d(ndc) of a mean-reduced image loss scales like 1/(2H)
#   (`scene/gaussian_model.py:566`, `backward.cu:460-461`).  The reference
#   default 0.0002 is tuned for H≈700-1000 captures; at this scene's H=150
#   the same per-pixel error yields ~5x larger NDC grads, over-densifying
#   83% of the model at the first step (measured: diverges).  0.001 ≈
#   0.0002·(750/150) restores the intended selectivity (measured: 40+ dB
#   before the opacity reset).
# - iterations 2900: the opacity reset (`train_scene.py:133-134`, every
#   3000) floors test PSNR by design and its recovery horizon is thousands
#   of iterations (the reference's eval points at 7000/30000 sit 1000-24000
#   iterations past a reset within a 30k budget; measured here: 40.5 dB at
#   2500 → 9.0 right after the 3000 reset → 23.0 by 5500).  A short
#   evidence run therefore stops just before the first reset, with
#   densification fully exercised in [500, 2900].
set -e
ITERS=${1:-2900}
SRC=examples/synth_scene
OUT=output/synth_scene
python -m seganygaussians_tpu.cli.train_scene -s "$SRC" -m "$OUT" \
  --iterations "$ITERS" --eval \
  --test_iterations 500 1000 1500 2000 2500 "$ITERS" \
  --densify_grad_threshold 0.001 \
  --save_iterations "$ITERS" --disable_viewer
python -m seganygaussians_tpu.cli.get_scale --source_path "$SRC" --model_path "$OUT"
# XLA backend for the contrastive stage: the fused C=32 Pallas step's
# on-TPU compile exceeds any practical budget at feature resolution (>50
# min observed; the isolated kernels compile in ~8 min but the fused
# train-step program does not converge) while the XLA blend at the small
# feature resolution (~100x75) compiles in seconds and runs fast.
python -m seganygaussians_tpu.cli.train_contrastive_feature \
  --model_path "$OUT" --iterations 1500 --num_sampled_rays 512 \
  --backend xla --raster_capacity 32768
