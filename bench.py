"""Benchmark: rasterized Mpixels/s/chip, forward+backward (RGB path).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference publishes no numbers (BASELINE.md); the CUDA
3DGS rasterizer on an A100 renders ~150-250 fps at 1080p on typical scenes
(fwd only) ≈ 400 Mpix/s fwd ≈ ~130 Mpix/s fwd+bwd. We use 130 Mpix/s as the
A100 fwd+bwd stand-in so vs_baseline tracks the ≥3×-A100 north star.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

A100_FWD_BWD_MPIX_S = 130.0


def main(feature32_child: bool = False):
    # keep stdout to exactly one JSON line: route jax's platform warnings
    # (the axon-plugin banner logs to a stdout handler) through stderr
    import logging

    logging.basicConfig(stream=sys.stderr, force=True)

    from seganygaussians_tpu.utils import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from seganygaussians_tpu.models import gaussians as gm
    from seganygaussians_tpu.ops.camera import make_camera
    from seganygaussians_tpu.ops.rasterize import RasterConfig, rasterize

    on_tpu = jax.default_backend() == "tpu"
    W, H = (1024, 768) if on_tpu else (128, 96)
    n = 100_000 if on_tpu else 2_000

    rng = np.random.default_rng(0)
    # A scene-like cloud: points in a view-filling slab, LOD-ish scales.
    pts = np.stack(
        [
            rng.uniform(-1.2, 1.2, n),
            rng.uniform(-0.9, 0.9, n),
            rng.uniform(2.0, 6.0, n),
        ],
        axis=1,
    ).astype(np.float32)
    cols = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
    state = gm.create_from_points(pts, cols, sh_degree=3, capacity=n)
    cam = make_camera(
        np.eye(3), np.zeros(3), fovx=1.1, fovy=0.9, width=W, height=H
    )

    # 32x32 tiles: ~2.7x fewer tile instances than 16x16 at typical
    # footprints, which every instance-scale XLA stage (expansion, payload
    # sort, gradient reduction) pays for linearly — measured 2.5x faster
    # end-to-end on TPU v5e (BASELINE.md round-4 profile).  Output is
    # identical: tile size only partitions the blend.
    TS = 32

    # Size the static instance budget from the true tile-overlap count
    # (the capacity-bucket / recompile-on-growth policy, SURVEY.md §7).
    from seganygaussians_tpu.ops.projection import preprocess

    prep = jax.jit(
        lambda xyz, sc, rot: preprocess(
            xyz,
            cam,
            scales=sc,
            rotations=rot,
            active_mask=state.alive,
            opacities=gm.get_opacity(state.params)[:, 0],
            tile_size=TS,
        )
    )(state.params.xyz, gm.get_scaling(state.params), gm.get_rotation(state.params))
    from seganygaussians_tpu.ops.binning import suggest_capacity

    total = int(np.asarray(jnp.sum(prep.tiles_touched)))
    cap = suggest_capacity(total, headroom=1.05)
    cfg = RasterConfig(capacity=cap, backend="auto", tile_size=TS)
    bg = jnp.zeros(3)
    print(
        f"# gaussians={n} instances={total} capacity={cap}",
        file=sys.stderr,
        flush=True,
    )

    p = state.params

    def fwd_bwd(params):
        def loss(prm):
            out = rasterize(
                prm.xyz,
                gm.get_opacity(prm)[:, 0],
                cam,
                shs=gm.get_shs(prm),
                sh_degree=3,
                scales=gm.get_scaling(prm),
                rotations=gm.get_rotation(prm),
                bg=bg,
                active_mask=state.alive,
                config=cfg,
            )
            return jnp.sum(out.color), out.overflow

        (val, overflow), grads = jax.value_and_grad(loss, has_aux=True)(params)
        return val, overflow, grads.xyz

    def time_step(step, arg):
        """Median-of-5 timed blocks with scalar-readback sync.

        block_until_ready is unreliable through remote-TPU relays, but a
        host transfer cannot complete before the computation (the
        2.2-vs-5.66 single-block spread across rounds 1-3 — BASELINE.md).
        """
        iters = 10 if on_tpu else 3
        blocks = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(iters):
                _, _, g = step(arg)
            float(jnp.sum(g))
            blocks.append((time.perf_counter() - t0) / iters)
        return float(np.median(blocks)), blocks

    if not feature32_child:
        step = jax.jit(fwd_bwd)
        val, overflow, g = step(p)  # compile + warmup
        float(jnp.sum(g))
        assert not bool(overflow), "instance capacity overflow — raise cap"
        dt, blocks = time_step(step, p)
        print(f"# RGB block times (s): {[round(b, 4) for b in blocks]}",
              file=sys.stderr, flush=True)
        mpix_s = (W * H / dt) / 1e6

    # --- 32-dim feature path (the contrastive hot loop: precomputed
    # "colors" = per-Gaussian features, `train_contrastive_feature.py:231` →
    # `diff-gaussian-rasterization_contrastive_f` with NUM_CHANNELS 32).
    # 16x16 tiles: the 32-channel backward kernel at P=1024 (tile 32) blows
    # up the Mosaic compile (observed: >30 min, never finished — same class
    # as the K=256 failure, BASELINE.md); at P=256 it compiles and runs.
    # This matches the contrastive trainer's default RasterConfig.
    TS_F = 16
    prep_f = jax.jit(
        lambda xyz, sc, rot: preprocess(
            xyz, cam, scales=sc, rotations=rot, active_mask=state.alive,
            opacities=gm.get_opacity(state.params)[:, 0], tile_size=TS_F,
        )
    )(state.params.xyz, gm.get_scaling(state.params), gm.get_rotation(state.params))
    cap_f = suggest_capacity(int(np.asarray(jnp.sum(prep_f.tiles_touched))),
                             headroom=1.05)
    cfg_f = RasterConfig(capacity=cap_f, backend="auto", tile_size=TS_F)
    feats = jnp.asarray(rng.normal(size=(n, 32)) * 0.1, jnp.float32)

    def fwd_bwd_feat(f32):
        def loss(fv):
            out = rasterize(
                p.xyz,
                gm.get_opacity(p)[:, 0],
                cam,
                colors=fv,
                scales=gm.get_scaling(p),
                rotations=gm.get_rotation(p),
                bg=jnp.zeros(32),
                active_mask=state.alive,
                config=cfg_f,
            )
            return jnp.sum(out.color), out.overflow

        (val, overflow), grads = jax.value_and_grad(loss, has_aux=True)(f32)
        return val, overflow, grads

    if feature32_child:
        step_f = jax.jit(fwd_bwd_feat)
        _, overflow_f, gf = step_f(feats)
        float(jnp.sum(gf))
        assert not bool(overflow_f)
        dt_f, blocks_f = time_step(step_f, feats)
        print(f"# C=32 block times (s): {[round(b, 4) for b in blocks_f]}",
              file=sys.stderr, flush=True)
        print(json.dumps({"feature32_dt": dt_f}))
        return

    # The C=32 measurement runs in a time-bounded child: a cold Pallas
    # compile of the 32-channel kernels can take ~10 min (cached after), and
    # the primary RGB metric must be emitted even if the child exceeds the
    # budget (SAGA_FEATURE32_TIMEOUT seconds, default 900).
    record = {
        "metric": "raster_fwd_bwd_mpix_per_s",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s/chip",
        "vs_baseline": round(mpix_s / A100_FWD_BWD_MPIX_S, 3),
    }
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--feature32"],
            capture_output=True, text=True,
            timeout=float(os.environ.get("SAGA_FEATURE32_TIMEOUT", 900)),
        )
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                dt_f = json.loads(line)["feature32_dt"]
                record["feature32_mpix_per_s"] = round((W * H / dt_f) / 1e6, 2)
        print(r.stderr[-500:], file=sys.stderr)
    except (subprocess.TimeoutExpired, Exception) as e:  # noqa: BLE001
        print(f"# feature32 child failed/timed out: {e!r}",
              file=sys.stderr, flush=True)
    print(json.dumps(record))


if __name__ == "__main__":
    main(feature32_child="--feature32" in sys.argv)
