"""Multi-device throughput measurement over a virtual CPU mesh.

The BASELINE "multi-host scaling" row needs a measured rays/s (contrastive)
and Mpix/s (scene DP) per device count.  Real multi-chip hardware is not
available in this environment, so this harness exercises the *measurement
path* on the `--xla_force_host_platform_device_count`-style virtual CPU mesh
(self-provisioned in-process, like `__graft_entry__.dryrun_multichip`):
per-device-count subprocesses time the same jitted DP steps the real pod
would run and report totals.  Virtual devices share one host's cores, so the
absolute numbers and the scaling efficiency are NOT hardware claims — the
value is a committed, reproducible harness whose numbers become meaningful
the moment it runs on a real mesh.

Usage:
    python tools/bench_multichip.py                # parent: sweeps 1,2,4,8
    python tools/bench_multichip.py --child N      # one device count
Writes evidence/multichip_throughput.json from the parent.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def child(n_devices: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_devices)
    import jax.numpy as jnp
    import numpy as np

    from seganygaussians_tpu.models import gaussians as gm
    from seganygaussians_tpu.models import feature_gaussians as fgm
    from seganygaussians_tpu.models import optim
    from seganygaussians_tpu.ops.camera import make_camera
    from seganygaussians_tpu.ops.quantile import fit_quantile_transform
    from seganygaussians_tpu.ops.rasterize import RasterConfig
    from seganygaussians_tpu.parallel import make_mesh
    from seganygaussians_tpu.parallel.data_parallel import (
        make_dp_train_step,
        stack_cameras,
    )
    from seganygaussians_tpu.parallel.contrastive_dp import (
        make_dp_contrastive_step,
        stack_bundles,
    )
    from seganygaussians_tpu.seg.scale_gate import init_scale_gate
    from seganygaussians_tpu.train import contrastive_trainer as ct

    rng = np.random.default_rng(0)
    n = 4096
    pts = np.stack(
        [rng.uniform(-0.8, 0.8, n), rng.uniform(-0.6, 0.6, n),
         3.0 + rng.uniform(-0.5, 0.5, n)], axis=1,
    ).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    state = gm.create_from_points(pts, cols, sh_degree=2, capacity=n)
    geo = {k: np.asarray(getattr(state.params, k)[:1024])
           for k in ("xyz", "scaling", "rotation", "opacity")}

    W, H = 128, 96
    cams = []
    for i in range(n_devices):
        ang = 2 * np.pi * i / max(n_devices, 1)
        eye = np.array([2.5 * np.cos(ang), 0.3, 2.5 * np.sin(ang)])
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        Rwc = np.stack([right, up2, fwd], axis=0)
        cams.append(make_camera(Rwc.T, -Rwc @ eye, fovx=0.9, fovy=0.7,
                                width=W, height=H))
    cam_batch, template = stack_cameras(cams)
    gt = jnp.asarray(rng.uniform(size=(n_devices, H, W, 3)), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)

    mesh = make_mesh(n_devices)
    cfg = RasterConfig(capacity=1 << 15, backend="xla")
    step = make_dp_train_step(
        mesh, template, gm.TrainHyper(), cfg,
        spatial_lr_scale=2.5, active_sh_degree=0,
    )

    def sync(x):
        return float(jnp.sum(x))

    it = jnp.asarray(1, jnp.int32)
    state, loss, _ = step(state, cam_batch, gt, bg, it)  # compile
    sync(state.params.xyz)
    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss, _ = step(state, cam_batch, gt, bg, it)
    sync(state.params.xyz)
    dt_scene = (time.perf_counter() - t0) / iters
    scene_mpix_s = n_devices * W * H / dt_scene / 1e6

    # --- contrastive: ray-sharded over a (data=1, ray=n_devices) mesh
    fs = fgm.from_scene_geometry(
        geo["xyz"], geo["scaling"], geo["rotation"], geo["opacity"],
        feature_dim=16, smooth_k=4,
    )
    h, w = 48, 64
    left = np.zeros((h, w), bool); left[:, : w // 2] = True
    bundle = ct.build_mask_bundle(
        np.stack([np.ones((h, w), bool), left, ~left]),
        np.array([5.0, 1.0, 0.9], np.float32), max_masks=4,
    )
    consts = ct.ContrastiveConsts(
        upper_bound_scale=jnp.asarray(5.0),
        qt=fit_quantile_transform(jnp.asarray([5.0, 1.0, 0.9])),
    )
    gate = init_scale_gate(jax.random.PRNGKey(0), feature_dim=16)
    feat_cam = make_camera(np.eye(3), np.zeros(3), fovx=1.1, fovy=0.9,
                           width=w, height=h)
    cmesh = make_mesh(n_devices, ("data", "ray"), (1, n_devices))
    n_rays = 128 * n_devices
    chyper = ct.ContrastiveHyper(num_sampled_rays=n_rays, smooth_dropout=0.5)
    cstep = make_dp_contrastive_step(cmesh, feat_cam, chyper, cfg)
    keys = jnp.stack([jax.random.PRNGKey(0)])
    bundles = stack_bundles([bundle])
    gate_opt = optim.adam_init(gate)
    # The step donates its state pytrees — rebind every call.
    fs, gate, gate_opt, *_ = cstep(
        fs, gate, gate_opt, [feat_cam], bundles, consts, keys
    )
    sync(fs.point_features)
    t0 = time.perf_counter()
    for _ in range(iters):
        fs, gate, gate_opt, *_ = cstep(
            fs, gate, gate_opt, [feat_cam], bundles, consts, keys
        )
    sync(fs.point_features)
    dt_c = (time.perf_counter() - t0) / iters
    rays_s = n_rays / dt_c

    print(json.dumps({
        "n_devices": n_devices,
        "scene_dp_mpix_per_s": round(scene_mpix_s, 3),
        "scene_dp_step_ms": round(dt_scene * 1e3, 2),
        "contrastive_rays_per_s": round(rays_s, 1),
        "contrastive_step_ms": round(dt_c * 1e3, 2),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=0)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--out", default="evidence/multichip_throughput.json")
    args = ap.parse_args()
    if args.child:
        child(args.child)
        return

    rows = []
    for nd in args.devices:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(nd)],
            capture_output=True, text=True, timeout=1200,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"n={nd} FAILED:\n{r.stderr[-2000:]}", file=sys.stderr)
            continue
        row = json.loads(line[-1])
        rows.append(row)
        print(json.dumps(row), flush=True)

    if rows:
        base = rows[0]
        for row in rows:
            nd = row["n_devices"]
            row["scene_scaling_eff"] = round(
                row["scene_dp_mpix_per_s"]
                / (base["scene_dp_mpix_per_s"] * nd / base["n_devices"]), 3)
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({
                "note": ("virtual CPU mesh (shared host cores) — exercises "
                         "the measurement path; not a hardware scaling claim"),
                "rows": rows,
            }, f, indent=1)
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
