"""SAGA contrastive-feature training CLI (parity: `train_contrastive_feature.py`).

Usage: python -m seganygaussians_tpu.cli.train_contrastive_feature \
    -s <data> -m <model_out> [--iterations N ...]
"""

from __future__ import annotations

import os
import sys

import jax


def main(argv=None):
    from seganygaussians_tpu.config import (
        extract,
        load_cfg,
        make_contrastive_parser,
        save_cfg,
    )
    from seganygaussians_tpu.ops.rasterize import RasterConfig
    from seganygaussians_tpu.scene import ModelConfig, Scene
    from seganygaussians_tpu.seg.scale_gate import init_scale_gate, save_scale_gate
    from seganygaussians_tpu.train.contrastive_trainer import (
        ContrastiveHyper,
        ContrastiveTrainer,
    )

    parser = make_contrastive_parser("Contrastive feature training")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--backend", type=str, default="auto")
    parser.add_argument("--raster_capacity", type=int, default=1 << 20)
    parser.add_argument("--target", type=str, default="contrastive_feature")
    args = parser.parse_args(argv)

    cfg = extract(ModelConfig, args)
    hyper = extract(ContrastiveHyper, args)
    # merge source path from the scene-training config if present (`get_combined_args`)
    saved = load_cfg(cfg.model_path, "cfg_args")
    if saved and not cfg.source_path and "model" in saved:
        cfg.source_path = saved["model"].get("source_path", cfg.source_path)
    cfg.need_masks = True  # `train_contrastive_feature.py:71`

    sample_rate = 0.2 if "Replica" in cfg.source_path else 1.0  # `:78`
    scene = Scene(
        cfg,
        need_scene=False,
        need_features_model=True,
        load_iteration=-1,
        target=args.target,
        mode="train",
        sample_rate=sample_rate,
        seed=args.seed,
    )
    save_cfg(cfg.model_path, {"model": cfg, "opt": hyper}, "feature_cfg_args")

    gate = init_scale_gate(jax.random.PRNGKey(args.seed), cfg.feature_dim)
    trainer = ContrastiveTrainer(
        feat_state=scene.feature_gaussians,
        gate_params=gate,
        cameras=scene.get_train_cameras(),
        hyper=hyper,
        config=RasterConfig(capacity=args.raster_capacity, backend=args.backend),
        seed=args.seed,
    )
    trainer.run(log_every=100)
    # RFN / pos-cos / neg-cos trajectories → metrics.jsonl + TensorBoard
    # (the tqdm-postfix analogue, `train_contrastive_feature.py:308-315`).
    from seganygaussians_tpu.utils.reporting import TrainingReporter

    reporter = TrainingReporter(cfg.model_path)
    for m in trainer.metrics_history:
        reporter.scalars(
            m["iter"],
            {"contrastive/loss": m["loss"], "contrastive/rfn": m["rfn"],
             "contrastive/cos_pos": m["cosine_pos"],
             "contrastive/cos_neg": m["cosine_neg"]},
        )
    reporter.close()
    for m in trainer.metrics_history[-3:]:
        print(
            f"[ITER {m['iter']}] loss={m['loss']:.4f} RFN={m['rfn']:.3f} "
            f"cos+={m['cosine_pos']:.3f} cos-={m['cosine_neg']:.3f}"
        )

    scene.feature_gaussians = trainer.feat_state
    path = scene.save_feature(
        hyper.iterations, target=args.target, smooth_type=hyper.smooth_type,
        smooth_k=hyper.smooth_k,
        multi_res_maps=trainer.consts.multi_res_maps or None, seed=args.seed,
    )
    gate_path = os.path.join(os.path.dirname(path), "scale_gate.pt")
    save_scale_gate(gate_path, trainer.gate_params)
    print(f"Saved {path} and {gate_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
