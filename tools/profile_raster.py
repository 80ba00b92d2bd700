"""Stage-split profiling of the rasterization pipeline on real hardware.

Times each pipeline stage independently (preprocess / slot expansion / fused
payload sort / fwd kernel / bwd kernel / bwd epilogue) plus the end-to-end
fwd and fwd+bwd steps, so kernel optimization is guided by measurements
instead of guesses.

NOTE on methodology: the remote-TPU relay makes `block_until_ready`
unreliable and a host transfer costs a ~27 ms round trip, so every timing
runs ITERS iterations followed by ONE scalar readback; the readback cost is
measured separately and subtracted.

Usage: python tools/profile_raster.py [--channels 3] [--trace DIR]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from seganygaussians_tpu.utils import enable_persistent_cache

enable_persistent_cache()

ITERS = 20
_SYNC_MS = 0.0  # measured D2H round-trip, subtracted from every stage


def sync(x):
    """Force completion: host transfer of a scalar reduction."""
    import jax.numpy as jnp

    return float(jnp.sum(x if x.dtype != bool else x.astype(jnp.int32)))


def timeit(fn, *args, iters=ITERS):
    import jax

    for _ in range(3):  # compile + 2 true warmup runs (first-call overhead)
        out = fn(*args)
    leaves = jax.tree.leaves(out)
    sync(leaves[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaves = jax.tree.leaves(out)
    sync(leaves[0])
    raw_ms = (time.perf_counter() - t0) * 1e3
    return max(raw_ms - _SYNC_MS, 0.0) / iters, raw_ms


def report(label, timed):
    ms, raw_ms = timed
    # A stage whose raw total is within ~2x of the sync round-trip is below
    # the measurement floor — say so instead of printing a misleading 0.00.
    floor = " (below measurement floor)" if raw_ms < 2.0 * max(_SYNC_MS, 1e-9) else ""
    print(f"{label:<22}{ms:8.2f} ms{floor}", flush=True)


def measure_sync_overhead():
    """One tiny-op timing loop: its total time ≈ the D2H round trip."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.ones((8,))
    sync(f(x))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        x = f(x)
    sync(x)
    return (time.perf_counter() - t0) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=3)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--height", type=int, default=768)
    ap.add_argument("--trace", type=str, default=None)
    ap.add_argument("--backend", type=str, default="pallas")
    ap.add_argument("--tile-size", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=None,
                    help="override blend_pallas.CHUNK (instances per inner step)")
    ap.add_argument("--headroom", type=float, default=1.15)
    ap.add_argument("--skip-e2e", action="store_true")
    args = ap.parse_args()

    import logging

    logging.basicConfig(stream=sys.stderr, force=True)

    import jax
    import jax.numpy as jnp

    from seganygaussians_tpu.models import gaussians as gm
    from seganygaussians_tpu.ops.camera import make_camera
    from seganygaussians_tpu.ops.binning import suggest_capacity
    from seganygaussians_tpu.ops.projection import preprocess
    from seganygaussians_tpu.ops.rasterize import RasterConfig, rasterize
    from seganygaussians_tpu.ops import blend_pallas

    global _SYNC_MS
    _SYNC_MS = measure_sync_overhead()
    print(f"# D2H sync overhead {_SYNC_MS:.1f} ms (subtracted)", flush=True)

    if args.chunk is not None:
        from seganygaussians_tpu.ops import blend_pallas as _bp

        _bp.CHUNK = args.chunk

    TS = args.tile_size
    W, H, n = args.width, args.height, args.n
    C = args.channels
    rng = np.random.default_rng(0)
    pts = np.stack(
        [rng.uniform(-1.2, 1.2, n), rng.uniform(-0.9, 0.9, n), rng.uniform(2.0, 6.0, n)],
        axis=1,
    ).astype(np.float32)
    cols = rng.uniform(0.0, 1.0, (n, C)).astype(np.float32)
    state = gm.create_from_points(pts, cols[:, :3], sh_degree=3, capacity=n)
    cam = make_camera(np.eye(3), np.zeros(3), fovx=1.1, fovy=0.9, width=W, height=H)
    xyz = state.params.xyz
    scales = gm.get_scaling(state.params)
    rots = gm.get_rotation(state.params)
    opac = gm.get_opacity(state.params)[:, 0]
    colors = jnp.asarray(cols)
    alive = state.alive
    bg = jnp.zeros(C)

    # --- stage 1: preprocess
    prep_fn = jax.jit(
        lambda xyz, sc, rot: preprocess(
            xyz, cam, scales=sc, rotations=rot, active_mask=alive, opacities=opac,
            tile_size=TS,
        )
    )
    prep = prep_fn(xyz, scales, rots)
    total = int(np.asarray(jnp.sum(prep.tiles_touched)))
    cap = suggest_capacity(total, headroom=args.headroom)
    grid_x = (W + TS - 1) // TS
    grid_y = (H + TS - 1) // TS
    print(f"# N={n} instances={total} capacity={cap} tiles={grid_x*grid_y} C={C}", flush=True)

    report("preprocess", timeit(prep_fn, xyz, scales, rots))

    # --- stage 2: slot expansion
    from seganygaussians_tpu.ops.binning import expand_slots

    plan_fn = jax.jit(lambda p: expand_slots(p, grid_x, grid_y, cap))
    plan = plan_fn(prep)
    report("expand_slots", timeit(plan_fn, prep))

    # depth-sorted field columns
    perm = plan.depth_perm
    means2d_d = prep.means2d[perm]
    conics_d = prep.conics[perm]
    opac_d = opac[perm]
    colors_d = colors[perm]
    fields = (
        means2d_d[:, 0], means2d_d[:, 1],
        conics_d[:, 0], conics_d[:, 1], conics_d[:, 2], opac_d,
    ) + tuple(colors_d[:, i] for i in range(C))

    # --- stage 3: fused pack (row-gather) + sort + blend fwd
    def f_fwd(*fs):
        out, _ = blend_pallas._fused_fwd(
            plan.slot_rank, plan.slot_tile, tuple(fs), bg, C,
            grid_x, grid_y, TS,
        )
        return out.tiles

    report("blend fwd (pack+sort+kern)", timeit(jax.jit(f_fwd), *fields))

    # --- stage 4b: forward kernel alone (on packed inputs)
    out0, res0 = jax.jit(
        lambda *fs: blend_pallas._fused_fwd(
            plan.slot_rank, plan.slot_tile, tuple(fs), bg, C,
            grid_x, grid_y, TS,
        )
    )(*fields)
    gauss_s, tile_starts, inst, tiles_r, final_t_r, bg_pad, _, _ = res0
    c_pad = blend_pallas._pad_channels(C)

    fwd_kern = jax.jit(
        lambda i, ts: blend_pallas._fwd_call(
            i, ts, bg_pad,
            num_tiles=grid_x * grid_y, grid_x=grid_x, tile_size=TS, c_pad=c_pad,
        )[0]
    )
    report("  fwd kernel alone", timeit(fwd_kern, inst, tile_starts))

    # --- stage 5: backward kernel alone
    p = TS * TS
    num_tiles = grid_x * grid_y
    g_tiles = jnp.ones((num_tiles, p, c_pad), jnp.float32)
    g_ft = jnp.zeros((num_tiles, p, 1), jnp.float32)
    bwd_kern = jax.jit(
        lambda i, ts, gt: blend_pallas._bwd_call(
            i, ts, gt, g_ft, tiles_r, final_t_r, bg_pad,
            num_tiles=num_tiles, grid_x=grid_x, tile_size=TS, c_pad=c_pad,
        )
    )
    report("  bwd kernel alone", timeit(bwd_kern, inst, tile_starts, g_tiles))

    # --- stage 6: bwd epilogue (sort + cumsum segment reduce)
    dinst0 = bwd_kern(inst, tile_starts, g_tiles)  # representative magnitudes

    def epilogue(d):
        rows = list(range(6)) + list(
            range(blend_pallas.COLOR_OFFSET, blend_pallas.COLOR_OFFSET + C)
        )
        return blend_pallas.segment_reduce_by_rank(
            d, gauss_s, rows, n, tile_starts[-1]
        )

    report("  bwd epilogue", timeit(jax.jit(epilogue), dinst0))

    # --- blend fwd+bwd via custom vjp
    def blend_loss(*fs):
        out = blend_pallas.blend_fused(
            plan.slot_rank, plan.slot_tile, tuple(fs), bg, grid_x, grid_y, TS
        )
        return jnp.sum(out.tiles)

    blend_gr = jax.jit(jax.grad(blend_loss, argnums=tuple(range(6 + C))))
    report("blend fwd+bwd (full)", timeit(blend_gr, *fields))

    if args.skip_e2e:
        return

    # --- end-to-end
    cfg = RasterConfig(capacity=cap, backend=args.backend, tile_size=TS)

    def full_fwd(xyz, sc, rot, op, col):
        out = rasterize(
            xyz, op, cam, colors=col, scales=sc, rotations=rot, bg=bg,
            active_mask=alive, config=cfg,
        )
        return out.color

    report("e2e fwd", timeit(jax.jit(full_fwd), xyz, scales, rots, opac, colors))

    def full_loss(xyz, sc, rot, op, col):
        return jnp.sum(full_fwd(xyz, sc, rot, op, col))

    grad_fn = jax.jit(jax.grad(full_loss, argnums=(0, 1, 2, 3, 4)))
    t, _raw = timeit(grad_fn, xyz, scales, rots, opac, colors)
    mpix = W * H / (t / 1e3) / 1e6
    print(f"e2e fwd+bwd           {t:8.2f} ms   = {mpix:.1f} Mpix/s", flush=True)

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                out = grad_fn(xyz, scales, rots, opac, colors)
            jax.block_until_ready(out)
        print(f"# trace written to {args.trace}", flush=True)


if __name__ == "__main__":
    main()
