"""Interactive segmentation GUI CLI (parity: `saga_gui.py:729-756`).

Loads the trained scene + affinity-feature field + scale gate and serves the
browser-based viewer (`viewer/web_gui.py`) driving a headless SagaSession.

Usage: python -m seganygaussians_tpu.cli.gui -m <model_path> [--port 8060]
"""

from __future__ import annotations

import os
import sys

import numpy as np


def main(argv=None):
    import jax.numpy as jnp

    from seganygaussians_tpu.config import extract, load_cfg, make_parser
    from seganygaussians_tpu.models import feature_gaussians as fgm
    from seganygaussians_tpu.ops.quantile import fit_quantile_transform
    from seganygaussians_tpu.ops.rasterize import RasterConfig
    from seganygaussians_tpu.scene import ModelConfig, Scene
    from seganygaussians_tpu.seg.scale_gate import load_scale_gate
    from seganygaussians_tpu.viewer.interactive import SagaSession
    from seganygaussians_tpu.viewer.web_gui import WebGUI

    parser = make_parser("Interactive segmentation GUI")
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8060)
    parser.add_argument("--backend", type=str, default="auto")
    parser.add_argument("--raster_capacity", type=int, default=1 << 20)
    args = parser.parse_args(argv)

    cfg = extract(ModelConfig, args)
    saved = load_cfg(cfg.model_path, "cfg_args")
    if saved and not cfg.source_path and "model" in saved:
        cfg.source_path = saved["model"].get("source_path", "")
    cfg.need_masks = True

    scene = Scene(
        cfg, need_scene=True, need_features_model=True,
        load_iteration=-1, feature_load_iteration=args.iteration,
        target="contrastive_feature", mode="eval", shuffle=False,
    )
    fs = scene.feature_gaussians
    fs = fgm.FeatureState(
        geom=fgm.FrozenGeometry(*(jnp.asarray(x) for x in fs.geom)),
        point_features=jnp.asarray(fs.point_features),
        smooth_map=jnp.asarray(fs.smooth_map),
        opt=None,
    )
    gate = load_scale_gate(os.path.join(
        cfg.model_path, "point_cloud",
        f"iteration_{scene.feature_loaded_iter}", "scale_gate.pt",
    ))

    all_scales = [
        np.asarray(c.mask_scales).reshape(-1)
        for c in scene.get_train_cameras() if c.mask_scales is not None
    ]
    qt = fit_quantile_transform(
        jnp.asarray(np.concatenate(all_scales))
        if all_scales else jnp.asarray([0.1, 1.0, 10.0])
    )

    session = SagaSession(
        scene_state=scene.gaussians,
        feature_state=fs,
        gate_params=gate,
        scale_qt=qt,
        config=RasterConfig(capacity=args.raster_capacity,
                            backend=args.backend),
    )
    WebGUI(session, host=args.host, port=args.port).serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())
