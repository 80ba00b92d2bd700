"""Microbenchmarks of the XLA primitives the binning/pack/epilogue stages use.

Informs the round-2 redesign: which of scatter / cumsum / sort / 1D-gather /
row-gather are viable at instance scale (M ~ 4M) on this chip.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    M = 1 << 22  # 4M
    N = 100_000
    T = 3072
    rng = np.random.default_rng(0)

    idx_n = jnp.asarray(np.sort(rng.integers(0, M, N)).astype(np.int32))
    deltas = jnp.asarray(rng.integers(-100, 100, N).astype(np.int32))
    arr_i = jnp.asarray(rng.integers(0, T, M).astype(np.int32))
    arr_f = jnp.asarray(rng.random(M).astype(np.float32))
    vals = jnp.asarray(np.arange(M, dtype=np.int32))
    table = jnp.asarray(rng.random(N).astype(np.float32))
    gid = jnp.asarray(np.sort(rng.integers(0, N, M)).astype(np.int32))
    gid_rand = jnp.asarray(rng.integers(0, N, M).astype(np.int32))
    perm = jnp.asarray(rng.permutation(M).astype(np.int32))
    fields = jnp.asarray(rng.random((N, 16)).astype(np.float32))

    print(f"# M={M} N={N} T={T}")

    t = timeit(jax.jit(lambda x: x + 1), jnp.ones((8,)))
    print(f"tiny-op dispatch overhead   {t:7.3f} ms")

    t = timeit(jax.jit(lambda i, d: jnp.zeros((M,), jnp.int32).at[i].add(d, mode="drop")), idx_n, deltas)
    print(f"scatter-add 100k into 4M    {t:7.3f} ms")

    t = timeit(jax.jit(lambda x: jnp.cumsum(x)), arr_i)
    print(f"cumsum int32 4M             {t:7.3f} ms")

    t = timeit(jax.jit(lambda x: jnp.cumsum(x)), arr_f)
    print(f"cumsum f32 4M               {t:7.3f} ms")

    t = timeit(jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1, is_stable=True)), arr_i, vals)
    print(f"sort 4M key+1 int           {t:7.3f} ms")

    t = timeit(
        jax.jit(lambda k, v, w: jax.lax.sort((k, v, w), num_keys=1, is_stable=True)),
        arr_i, vals, vals,
    )
    print(f"sort 4M key+2 int           {t:7.3f} ms")

    t = timeit(jax.jit(lambda t_, g: table[gid]), table, gid)
    print(f"1D gather 4M from 100k (sorted idx)  {t:7.3f} ms")

    t = timeit(jax.jit(lambda t_, g: table[g]), table, gid_rand)
    print(f"1D gather 4M from 100k (random idx)  {t:7.3f} ms")

    t = timeit(jax.jit(lambda a, p: a[p]), arr_f, perm)
    print(f"1D gather 4M from 4M (perm) {t:7.3f} ms")

    t = timeit(jax.jit(lambda a, p: jnp.zeros((M,), jnp.float32).at[p].set(a)), arr_f, perm)
    print(f"1D scatter-set 4M perm      {t:7.3f} ms")

    t = timeit(jax.jit(lambda f, g: f[g]), fields, gid)
    print(f"row gather (4M,16) from (100k,16)    {t:7.3f} ms")

    t = timeit(jax.jit(lambda f, g: f[g]), fields.T.reshape(16, N).T, gid)  # same thing
    sorted_tiles = jnp.sort(arr_i)
    t = timeit(
        jax.jit(lambda s: jnp.searchsorted(s, jnp.arange(T + 1, dtype=jnp.int32)).astype(jnp.int32)),
        sorted_tiles,
    )
    print(f"searchsorted T+1 into 4M    {t:7.3f} ms")

    big = jnp.asarray(rng.random((16, M)).astype(np.float32))
    t = timeit(jax.jit(lambda x: x.T + 0.0), big)
    print(f"transpose (16,4M)->(4M,16)  {t:7.3f} ms")

    # segment-sum via sort+cumsum (current epilogue) for reference
    cols9 = jnp.asarray(rng.random((9, M)).astype(np.float32))

    def epi(key, d):
        s = jax.lax.sort((key,) + tuple(d[i] for i in range(9)), num_keys=1, is_stable=True)
        return s[1]

    t = timeit(jax.jit(epi), gid_rand, cols9)
    print(f"sort 4M key+9 f32 payload   {t:7.3f} ms")

    # multi-column cumsum fused
    def cs9(d):
        return jnp.cumsum(d, axis=1)

    t = timeit(jax.jit(cs9), cols9)
    print(f"cumsum (9,4M) axis=1        {t:7.3f} ms")


if __name__ == "__main__":
    main()
