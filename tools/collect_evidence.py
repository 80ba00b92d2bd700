"""Collect end-to-end evidence from a finished synthetic-scene run.

Reads `output/synth_scene` (produced by scripts/run_synth_e2e.sh), renders a
held-out view from the trained PLY (BASELINE config-1/2 analogue), extracts
the contrastive RFN / cos+ / cos- trajectories (config-4), checks the
mask-scale sidecars the depth variant produced (config-3), and writes
`BENCH_EVIDENCE.json` + a markdown row block to stdout for BASELINE.md.

Usage: python tools/collect_evidence.py [--model output/synth_scene]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="output/synth_scene")
    ap.add_argument("--source", default="examples/synth_scene")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from seganygaussians_tpu.scene import ModelConfig, Scene
    from seganygaussians_tpu.render import render
    from seganygaussians_tpu.ops.rasterize import RasterConfig

    ev = {}

    # --- scene training metrics (config 2 analogue)
    mpath = os.path.join(args.model, "metrics.jsonl")
    scene_rows, feat_rows = [], []
    with open(mpath) as f:
        for line in f:
            r = json.loads(line)
            (feat_rows if any(k.startswith("contrastive/") for k in r) else scene_rows).append(r)
    evals = [r for r in scene_rows if "eval/psnr" in r or "test/psnr" in r]
    if evals:
        ev["scene_eval"] = [
            {"iter": r["iter"],
             "psnr": r.get("eval/psnr", r.get("test/psnr")),
             "l1": r.get("eval/l1", r.get("test/l1"))}
            for r in evals
        ]

    # --- held-out render from the trained PLY (config 1 analogue)
    cfg = ModelConfig(source_path=args.source, model_path=args.model, resolution=1)
    sc = Scene(cfg, load_iteration=-1, mode="eval", shuffle=False)
    test_cams = sc.get_test_cameras() or sc.get_train_cameras()[:4]
    psnrs = []
    for cam in test_cams[:6]:
        out = render(
            cam.params, sc.gaussians, bg_color=jnp.zeros(3), active_sh_degree=3,
            config=RasterConfig(capacity=1 << 18, backend="auto"),
        )
        img = np.clip(np.asarray(out["render"]), 0, 1)
        gt = np.asarray(cam.image)
        if gt.shape[0] == 3:
            gt = gt.transpose(1, 2, 0)
        mse = ((img - gt) ** 2).mean()
        psnrs.append(-10 * np.log10(max(mse, 1e-10)))
    ev["held_out_psnr_mean"] = float(np.mean(psnrs))
    ev["held_out_views"] = len(psnrs)
    try:
        from PIL import Image

        # Committed evidence lives under evidence/, not the gitignored
        # output/ run directory.
        evdir = os.path.join(os.path.dirname(__file__), "..", "evidence")
        os.makedirs(evdir, exist_ok=True)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(evdir, "synth_render.png")
        )
        Image.fromarray((np.clip(gt, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(evdir, "synth_gt.png")
        )
    except Exception:
        pass

    # --- contrastive trajectories (config 4 analogue)
    traj = [r for r in feat_rows if "contrastive/rfn" in r]
    if traj:
        ev["contrastive"] = {
            "iters": len(traj),
            "first": {k: traj[0][k] for k in traj[0] if k.startswith("contrastive/")},
            "last": {k: traj[-1][k] for k in traj[-1] if k.startswith("contrastive/")},
        }

    # --- mask scales produced by the depth variant (config 3 analogue)
    msdir = os.path.join(args.source, "mask_scales")
    if os.path.isdir(msdir):
        ev["mask_scale_files"] = len(os.listdir(msdir))

    # --- feature PLY + scale gate artifacts
    pc = os.path.join(args.model, "point_cloud")
    if os.path.isdir(pc):
        ev["checkpoints"] = sorted(os.listdir(pc))

    out_path = os.path.join(os.path.dirname(__file__), "..", "BENCH_EVIDENCE.json")
    with open(out_path, "w") as f:
        json.dump(ev, f, indent=1)
    print(json.dumps(ev, indent=1))


if __name__ == "__main__":
    main()
