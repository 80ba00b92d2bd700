"""Scripted prompt segmentation (parity: `prompt_segmenting.ipynb`).

Point-prompt flow (notebook cells 0-31): load trained scene + feature field +
scale gate → render the feature map for a chosen training view → take the
prompt pixel's scale-gated feature → per-Gaussian similarity threshold →
segment → save `segmentation_res/final_mask.pt` + segmented PLY.

Text-prompt flow (cells 41-54): the full language-driven pipeline in
``seg/language.py`` — per-view mask-pooled rendered features + anchor
identifiers, mask-IoU distance clustering, 87-template CLIP scoring to pick
clusters and scales, per-Gaussian similarity threshold 0.85.  The older
direct score-map lifting remains available via ``--simple_lift``.
"""

from __future__ import annotations

import os
import sys

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from seganygaussians_tpu.config import extract, load_cfg, make_parser
    from seganygaussians_tpu.models import feature_gaussians as fgm
    from seganygaussians_tpu.models import gaussians as gm
    from seganygaussians_tpu.ops.quantile import fit_quantile_transform
    from seganygaussians_tpu.ops.rasterize import RasterConfig
    from seganygaussians_tpu.scene import ModelConfig, Scene
    from seganygaussians_tpu.seg import clip_text, queries
    from seganygaussians_tpu.seg.scale_gate import load_scale_gate

    parser = make_parser("Prompt segmentation")
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--view", type=int, default=0)
    parser.add_argument("--point", type=int, nargs=2, default=None,
                        metavar=("X", "Y"))
    parser.add_argument("--text", type=str, default=None)
    parser.add_argument("--scale", type=float, default=0.5,
                        help="quantile-normalised scale in [0,1]")
    parser.add_argument("--threshold", type=float, default=0.75)
    parser.add_argument("--out", type=str, default="./segmentation_res")
    parser.add_argument("--backend", type=str, default="auto")
    parser.add_argument("--raster_capacity", type=int, default=1 << 20)
    parser.add_argument(
        "--simple_lift", action="store_true",
        help="text path: direct 2D score-map lifting instead of the full "
             "cluster-graph pipeline",
    )
    parser.add_argument("--text_threshold", type=float, default=0.85,
                        help="final similarity threshold (notebook cell 53)")
    args = parser.parse_args(argv)

    cfg = extract(ModelConfig, args)
    saved = load_cfg(cfg.model_path, "cfg_args")
    if saved and not cfg.source_path and "model" in saved:
        cfg.source_path = saved["model"].get("source_path", "")
    cfg.need_masks = args.text is not None
    cfg.need_features = args.text is not None

    scene = Scene(
        cfg, need_scene=True, need_features_model=True,
        load_iteration=-1, feature_load_iteration=args.iteration,
        target="contrastive_feature", mode="eval", shuffle=False,
    )
    raster_cfg = RasterConfig(capacity=args.raster_capacity, backend=args.backend)
    fs = scene.feature_gaussians
    fs = fgm.FeatureState(
        geom=fgm.FrozenGeometry(*(jnp.asarray(x) for x in fs.geom)),
        point_features=jnp.asarray(fs.point_features),
        smooth_map=jnp.asarray(fs.smooth_map),
        opt=None,
    )
    gate_dir = os.path.join(
        cfg.model_path, "point_cloud",
        f"iteration_{scene.feature_loaded_iter}", "scale_gate.pt",
    )
    gate = load_scale_gate(gate_dir)
    cams = scene.get_train_cameras()

    if args.point is not None:
        cam = cams[args.view]
        gated = queries.gate_features(
            fs.point_features, gate, jnp.asarray(args.scale)
        )
        from seganygaussians_tpu.ops.rasterize import rasterize

        out = rasterize(
            fs.geom.xyz, fgm.get_opacity(fs.geom)[:, 0], cam.params,
            colors=gated, scales=fgm.get_scaling(fs.geom),
            rotations=fgm.get_rotation(fs.geom),
            bg=jnp.zeros((gated.shape[-1],), jnp.float32),
            active_mask=fs.geom.alive, config=raster_cfg,
        )
        fmap = out.color
        x, y = args.point
        prompt = fmap[y, x]
        prompt = prompt / jnp.linalg.norm(prompt).clip(1e-9)
        mask3d = queries.segment3d(
            fs.point_features, gate, jnp.asarray(args.scale), prompt[None],
            threshold=args.threshold, alive=scene.gaussians.alive,
        )
    elif args.text is not None:
        enc = clip_text.ClipEncoder()
        pos = jnp.asarray(enc.encode_text_with_template([args.text]))
        negs = jnp.asarray(enc.encode_text(list(clip_text.CANONICAL_NEGATIVES)))
        if args.simple_lift:
            # Direct lifting: per-mask scores → 2D score maps → mask-render
            # backprop (`clip_utils/__init__.py:291-330` get_3d_mask).
            views, score_maps = [], []
            for cam in cams:
                feats = cam.clip_features
                masks = cam.sam_masks
                if feats is None or masks is None:
                    continue
                s = clip_text.get_scores(jnp.asarray(feats), pos, negs)
                score_maps.append(
                    clip_text.scores_to_pixel_map(
                        s, jnp.asarray(masks, jnp.float32)
                    )
                )
                views.append(cam)
            mask3d = clip_text.lift_scores_to_3d(
                views, score_maps, scene.gaussians, config=raster_cfg
            )
        else:
            # Full language-driven pipeline (notebook cells 41-54).
            from seganygaussians_tpu.ops.rasterize import rasterize
            from seganygaussians_tpu.seg import language

            # Scale transform fitted on all training-mask scales, matching
            # the training flow (`train_contrastive_feature.py:108-130`).
            all_scales = np.concatenate(
                [np.asarray(c.mask_scales).reshape(-1)
                 for c in cams if c.mask_scales is not None]
            )
            qt = fit_quantile_transform(jnp.asarray(all_scales))

            feats_n = fs.point_features / jnp.linalg.norm(
                fs.point_features, axis=-1, keepdims=True
            ).clip(1e-9)  # norm_point_features=True (cell 42)

            def render_feature_map(cam):
                out = rasterize(
                    fs.geom.xyz, fgm.get_opacity(fs.geom)[:, 0], cam.params,
                    colors=feats_n, scales=fgm.get_scaling(fs.geom),
                    rotations=fgm.get_rotation(fs.geom),
                    bg=jnp.zeros((feats_n.shape[-1],), jnp.float32),
                    active_mask=fs.geom.alive, config=raster_cfg,
                )
                return out.color

            def text_scores(embeds):
                return np.asarray(
                    clip_text.get_scores(jnp.asarray(embeds), pos, negs)
                )

            res = language.text_segment(
                render_feature_map, cams, fs.point_features, gate, qt,
                text_scores, key=jax.random.PRNGKey(0),
                threshold=args.text_threshold,
                alive=scene.gaussians.alive,
            )
            mask3d = res.mask3d
            print(f"clusters: {len(set(res.labels[res.labels >= 0]))} "
                  f"({int((res.labels < 0).sum())} noise masks), "
                  f"query scales {res.query_scales}")
    else:
        parser.error("provide --point X Y or --text 'prompt'")

    os.makedirs(args.out, exist_ok=True)
    import torch

    n_sel = int(jnp.sum(mask3d))
    torch.save(
        torch.tensor(np.asarray(mask3d)), os.path.join(args.out, "final_mask.pt")
    )
    scene.gaussians = gm.segment(scene.gaussians, mask3d)
    ply_path = scene.save(scene.loaded_iter or 0, target="seg")
    print(f"selected {n_sel} gaussians → {args.out}/final_mask.pt and {ply_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
