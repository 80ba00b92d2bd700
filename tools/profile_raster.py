"""Stage-split profiling of the rasterization pipeline on real hardware.

Times each pipeline stage independently (preprocess / binning / pack /
fwd-kernel / bwd-kernel / bwd-epilogue) plus the end-to-end fwd and fwd+bwd
steps, so kernel optimization is guided by measurements instead of guesses
(VERDICT.md Weak #1: "No profile exists to confirm the split").

Usage: python tools/profile_raster.py [--channels 3] [--trace DIR]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sync(x):
    """Force completion: host transfer of a scalar reduction."""
    import jax.numpy as jnp

    return float(jnp.sum(x if x.dtype != bool else x.astype(jnp.int32)))


def timeit(fn, *args, iters=10, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    leaves = jax.tree.leaves(out)
    sync(leaves[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaves = jax.tree.leaves(out)
    sync(leaves[0])
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=3)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--height", type=int, default=768)
    ap.add_argument("--trace", type=str, default=None)
    ap.add_argument("--backend", type=str, default="pallas")
    args = ap.parse_args()

    import logging

    logging.basicConfig(stream=sys.stderr, force=True)

    import jax
    import jax.numpy as jnp

    from seganygaussians_tpu.models import gaussians as gm
    from seganygaussians_tpu.ops.camera import make_camera
    from seganygaussians_tpu.ops.binning import bin_gaussians
    from seganygaussians_tpu.ops.projection import preprocess
    from seganygaussians_tpu.ops.rasterize import RasterConfig, rasterize
    from seganygaussians_tpu.ops import blend_pallas

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
        lambda xyz, sc, rot: preprocess(xyz, cam, scales=sc, rotations=rot, active_mask=alive)
    )
    prep = prep_fn(xyz, scales, rots)
    total = int(np.asarray(jnp.sum(prep.tiles_touched)))
    cap = 1 << 18
    while cap < total:
        cap *= 2
    grid_x = (W + 15) // 16
    grid_y = (H + 15) // 16
    print(f"# N={n} instances={total} capacity={cap} tiles={grid_x*grid_y} C={C}")

    t = timeit(prep_fn, xyz, scales, rots)
    print(f"preprocess            {t:8.2f} ms")

    # --- stage 2: binning
    bin_fn = jax.jit(lambda p: bin_gaussians(p, grid_x, grid_y, cap))
    binned = bin_fn(prep)
    t = timeit(bin_fn, prep)
    print(f"binning               {t:8.2f} ms")

    # --- stage 3+4: blend fwd via pallas (includes pack gather)
    perm = binned.depth_perm
    means2d_d = prep.means2d[perm]
    conics_d = prep.conics[perm]
    opac_d = opac[perm]
    colors_d = colors[perm]

    def fwd_only(m2d, con, op, col):
        return blend_pallas._blend_fwd(
            binned.gauss_id, binned.tile_id, binned.tile_starts,
            m2d, con, op, col, bg, grid_x, grid_y, 16,
        )[0].tiles

    fwd_jit = jax.jit(fwd_only)
    t = timeit(fwd_jit, means2d_d, conics_d, opac_d, colors_d)
    print(f"blend fwd (pack+kern) {t:8.2f} ms")

    # pack alone
    m_pad = ((cap + blend_pallas.CHUNK - 1) // blend_pallas.CHUNK) * blend_pallas.CHUNK
    pack_jit = jax.jit(
        lambda m2d, con, op, col: blend_pallas._pack_instances(
            binned.gauss_id, m2d, con, op, col, m_pad
        )
    )
    t = timeit(pack_jit, means2d_d, conics_d, opac_d, colors_d)
    print(f"  pack_instances      {t:8.2f} ms")

    # --- blend fwd+bwd
    def blend_loss(m2d, con, op, col):
        out = blend_pallas.blend(
            binned.gauss_id, binned.tile_id, binned.tile_starts,
            m2d, con, op, col, bg, grid_x, grid_y, 16,
        )
        return jnp.sum(out.tiles)

    blend_gr = jax.jit(jax.grad(blend_loss, argnums=(0, 1, 2, 3)))
    t = timeit(blend_gr, means2d_d, conics_d, opac_d, colors_d)
    print(f"blend fwd+bwd (full)  {t:8.2f} ms")

    # --- epilogue pieces: the M-sized sort and segment reduction
    key = binned.gauss_id

    def sort_cost(d):
        sorted_ = jax.lax.sort((key,) + tuple(d[i] for i in range(6 + C)), num_keys=1, is_stable=True)
        return sorted_[1]

    dinst = jnp.ones((6 + C, m_pad if m_pad == key.shape[0] else key.shape[0]), jnp.float32)
    sort_jit = jax.jit(sort_cost)
    t = timeit(sort_jit, dinst)
    print(f"  bwd epilogue sort   {t:8.2f} ms  ({6+C} payload cols)")

    def cumsum_cost(d):
        return jnp.stack([jnp.cumsum(d[i]) for i in range(6 + C)])

    t = timeit(jax.jit(cumsum_cost), dinst)
    print(f"  bwd epilogue cumsum {t:8.2f} ms")

    # gather alternative: one (M, F) row gather
    inv = jnp.argsort(key)

    def gather_cost(d):
        return d.T[inv]

    t = timeit(jax.jit(gather_cost), dinst)
    print(f"  (M,F) row gather    {t:8.2f} ms  [epilogue alternative]")

    # --- end-to-end
    cfg = RasterConfig(capacity=cap, backend=args.backend)

    def full_fwd(xyz, sc, rot, op, col):
        out = rasterize(
            xyz, op, cam, colors=col, scales=sc, rotations=rot, bg=bg,
            active_mask=alive, config=cfg,
        )
        return out.color

    t = timeit(jax.jit(full_fwd), xyz, scales, rots, opac, colors)
    print(f"e2e fwd               {t:8.2f} ms")

    def full_loss(xyz, sc, rot, op, col):
        return jnp.sum(full_fwd(xyz, sc, rot, op, col))

    grad_fn = jax.jit(jax.grad(full_loss, argnums=(0, 1, 2, 3, 4)))
    t = timeit(grad_fn, xyz, scales, rots, opac, colors)
    mpix = W * H / (t / 1e3) / 1e6
    print(f"e2e fwd+bwd           {t:8.2f} ms   = {mpix:.1f} Mpix/s")

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                out = grad_fn(xyz, scales, rots, opac, colors)
            jax.block_until_ready(out)
        print(f"# trace written to {args.trace}")


if __name__ == "__main__":
    main()
