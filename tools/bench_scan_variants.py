"""Micro-benchmark of per-chunk transmittance-scan strategies for the blend
kernel: which way of computing a cumulative product along the instance axis
is fastest on this chip?

Variants (all compute T_before for a (P, K) alpha block, looped N_CHUNK times
on VMEM-resident data — pure compute, no DMA):
  exp_only    floor: just alpha = exp(s) and a sum (no scan)
  log_tri     round-2 design: log1p → (P,K)x(K,K) tri matmul → exp
  roll_lane   Hillis-Steele cumprod via pltpu.roll along lanes (K axis)
  roll_sub    Hillis-Steele cumprod via pltpu.roll along sublanes,
              transposed (K, P) layout
  log_tri_hs  log_tri but tri matmul in HIGHEST precision (6-pass)
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from seganygaussians_tpu.utils import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, K, N_CHUNK = 256, 256, 1000


def _tri(k):
    row = lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (row < col).astype(jnp.float32)


def kernel(s_ref, out_ref, *, variant):
    s0 = s_ref[:]
    tri = _tri(K)

    def body(i, acc):
        s = s0 + acc[:, :1] * 1e-6  # defeat loop-invariant hoisting
        alpha = jnp.minimum(0.99, jnp.exp(s))
        if variant == "exp_only":
            return acc + alpha
        if variant in ("log_tri", "log_tri_hs"):
            log1m = jnp.log1p(-alpha)
            prec = (
                jax.lax.Precision.HIGHEST if variant == "log_tri_hs" else None
            )
            cum = lax.dot_general(
                log1m, tri,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            t_before = jnp.exp(cum)
            return acc + alpha * t_before
        if variant == "roll_lane":
            one_m = 1.0 - alpha
            col = lax.broadcasted_iota(jnp.int32, (P, K), 1)
            x = one_m
            sh = 1
            while sh < K:
                x = x * jnp.where(col >= sh, pltpu.roll(x, sh, axis=1), 1.0)
                sh *= 2
            t_before = jnp.where(col >= 1, pltpu.roll(x, 1, axis=1), 1.0)
            return acc + alpha * t_before
        if variant == "roll_sub":
            # transposed layout: (K, P), scan along sublanes (axis 0)
            alpha_t = alpha  # pretend (K, P): same shape P==K here
            one_m = 1.0 - alpha_t
            row = lax.broadcasted_iota(jnp.int32, (K, P), 0)
            x = one_m
            sh = 1
            while sh < K:
                x = x * jnp.where(row >= sh, pltpu.roll(x, sh, axis=0), 1.0)
                sh *= 2
            t_before = jnp.where(row >= 1, pltpu.roll(x, 1, axis=0), 1.0)
            return acc + alpha_t * t_before
        raise ValueError(variant)

    out_ref[:] = lax.fori_loop(0, N_CHUNK, body, jnp.zeros((P, K), jnp.float32))


def run(variant):
    s = jnp.asarray(
        np.random.default_rng(0).uniform(-8, -0.5, (P, K)).astype(np.float32)
    )
    f = pl.pallas_call(
        functools.partial(kernel, variant=variant),
        out_shape=jax.ShapeDtypeStruct((P, K), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    g = jax.jit(f)
    out = g(s)
    # block_until_ready is unreliable through the remote-TPU relay; a host
    # transfer cannot complete before the computation does.
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(5):
        out = g(s)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / 5 / N_CHUNK * 1e6
    print(f"{variant:12s} {dt:8.3f} us/chunk  ({P}x{K})", flush=True)


if __name__ == "__main__":
    for v in ["exp_only", "log_tri", "log_tri_hs", "roll_lane", "roll_sub"]:
        run(v)
