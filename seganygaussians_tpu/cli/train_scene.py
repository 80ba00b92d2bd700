"""3DGS scene training CLI (parity: `train_scene.py`).

Usage: python -m seganygaussians_tpu.cli.train_scene -s <data> -m <out> [...]
"""

from __future__ import annotations

import os
import sys

import numpy as np


def main(argv=None):
    from seganygaussians_tpu.config import (
        PipelineConfig,
        extract,
        make_parser,
        save_cfg,
    )
    from seganygaussians_tpu.models.gaussians import TrainHyper
    from seganygaussians_tpu.ops.rasterize import RasterConfig
    from seganygaussians_tpu.scene import ModelConfig, Scene
    from seganygaussians_tpu.train.scene_trainer import SceneTrainer

    parser = make_parser("Scene training")
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--backend", type=str, default="auto")
    parser.add_argument("--raster_capacity", type=int, default=1 << 20)
    args = parser.parse_args(argv)

    cfg = extract(ModelConfig, args)
    hyper = extract(TrainHyper, args)
    pipe = extract(PipelineConfig, args)
    if not cfg.model_path:
        cfg.model_path = os.path.join("./output", os.path.basename(cfg.source_path))
    os.makedirs(cfg.model_path, exist_ok=True)
    save_cfg(cfg.model_path, {"model": cfg, "opt": hyper, "pipe": pipe}, "cfg_args")

    scene = Scene(cfg, seed=args.seed)
    trainer = SceneTrainer(
        state=scene.gaussians,
        cameras=scene.get_train_cameras(),
        spatial_lr_scale=scene.cameras_extent,
        hyper=hyper,
        sh_degree=cfg.sh_degree,
        white_background=cfg.white_background,
        config=RasterConfig(capacity=args.raster_capacity, backend=args.backend),
        seed=args.seed,
    )

    save_at = set(args.save_iterations) | {hyper.iterations}
    test_at = set(args.test_iterations)

    def on_eval(tr, it, metrics):
        if it in test_at and scene.get_test_cameras():
            psnr = tr.psnr_on(scene.get_test_cameras())
            print(f"[ITER {it}] test PSNR {psnr:.2f}")
        if it in save_at:
            scene.gaussians = tr.state
            path = scene.save(it, target="scene")
            print(f"[ITER {it}] saved {path}")
        print(
            f"[ITER {it}] loss={metrics['loss']:.5f} "
            f"n_alive={int(metrics['n_alive'])} "
            f"({metrics['elapsed_s']:.1f}s)"
        )

    trainer.on_eval = on_eval
    trainer.run(iterations=hyper.iterations, log_every=100)
    scene.gaussians = trainer.state
    if hyper.iterations not in save_at:
        scene.save(hyper.iterations, target="scene")
    print("Training complete.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
