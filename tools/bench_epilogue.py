"""Microbench: backward-epilogue alternatives at real instance scale.

The round-4 profile (BASELINE.md) put the bwd epilogue — stable 10-payload
sort by Gaussian rank + cumsum + boundary diff (`blend_pallas.
segment_reduce_by_rank`) — at 19.8 ms of the 59 ms frame.  Candidates:

  A. current: stable sort (rank, 10 f32 payloads) + (F, M) cumsum + diff
  B. transpose (F, M) → (M, F) + ONE row scatter-add by rank → (N, F)
  C. 1-col sort (rank, iota) → perm + (M, F) row-gather + cumsum/diff
  D. unstable variant of A

Run on the real chip: python tools/bench_epilogue.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from seganygaussians_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    n = 100_000
    m = 687_716
    f = 9  # 6 geometry rows + C=3 colors

    # realistic piecewise-ascending ranks: tile-major, ascending within tile
    tiles = 768
    per_tile = np.sort(rng.integers(0, n, size=m).astype(np.int32))
    tile_of = np.sort(rng.integers(0, tiles, size=m).astype(np.int32))
    order = np.lexsort((per_tile, tile_of))
    key_ranks = jnp.asarray(per_tile[order])
    dinst = jnp.asarray(rng.normal(size=(f, m)), jnp.float32)
    total = jnp.asarray(m, jnp.int32)

    def sync(x):
        return float(jnp.sum(x))

    def timeit(fn, *args, iters=10):
        out = fn(*args)
        sync(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(jax.tree.leaves(out)[0])
        return (time.perf_counter() - t0) / iters * 1e3

    from seganygaussians_tpu.ops.blend_pallas import segment_reduce_by_rank

    a = jax.jit(lambda d, k: segment_reduce_by_rank(d, k, list(range(f)), n, total))
    print(f"A sort+cumsum (stable, {f} payloads): {timeit(a, dinst, key_ranks):.2f} ms", flush=True)

    def b(d, k):
        dt = d.T  # (M, F)
        return jnp.zeros((n, f), jnp.float32).at[k].add(dt, mode="drop")

    print(f"B transpose+row-scatter-add:          {timeit(jax.jit(b), dinst, key_ranks):.2f} ms", flush=True)

    def b2(d, k):  # scatter-add without the transpose cost (if kernel wrote (M,F))
        return jnp.zeros((n, f), jnp.float32).at[k].add(d, mode="drop")

    dinst_t = jnp.asarray(np.asarray(dinst).T)
    print(f"B2 row-scatter-add only ((M,F) in):   {timeit(jax.jit(b2), dinst_t, key_ranks):.2f} ms", flush=True)

    def b3(d):  # transpose alone
        return d.T + 0.0

    print(f"B3 (F,M)->(M,F) transpose alone:      {timeit(jax.jit(b3), dinst):.2f} ms", flush=True)

    def c(d, k):
        _, perm = lax.sort_key_val(k, jnp.arange(m, dtype=jnp.int32))
        dt = d.T[perm]  # (M, F) row gather
        skey = k[perm]
        bound = jnp.searchsorted(skey, jnp.arange(n + 1, dtype=jnp.int32)).astype(jnp.int32)
        csum = jnp.concatenate([jnp.zeros((1, f), jnp.float32), jnp.cumsum(dt, axis=0)])
        return csum[bound[1:]] - csum[bound[:-1]]

    print(f"C 1-col sort + row-gather + cumsum:   {timeit(jax.jit(c), dinst, key_ranks):.2f} ms", flush=True)

    def d_(d, k):
        sorted_ = lax.sort((k,) + tuple(d[r] for r in range(f)), num_keys=1, is_stable=False)
        skey = sorted_[0]
        bound = jnp.searchsorted(skey, jnp.arange(n + 1, dtype=jnp.int32)).astype(jnp.int32)
        stacked = jnp.stack(sorted_[1:], axis=0)
        csum = jnp.concatenate(
            [jnp.zeros((f, 1), jnp.float32), jnp.cumsum(stacked, axis=1)], axis=1
        ).T
        return csum[bound[1:]] - csum[bound[:-1]]

    print(f"D unstable sort variant of A:         {timeit(jax.jit(d_), dinst, key_ranks):.2f} ms", flush=True)

    # correctness cross-check (numpy oracle)
    ref = np.zeros((n, f), np.float32)
    np.add.at(ref, np.asarray(key_ranks), np.asarray(dinst).T)
    for name, fn, args in (("A", a, (dinst, key_ranks)), ("B", jax.jit(b), (dinst, key_ranks)),
                           ("C", jax.jit(c), (dinst, key_ranks))):
        got = np.asarray(fn(*args))
        err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
        print(f"{name} max rel err vs oracle: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
