"""Tile alpha-blending — pure-XLA reference implementation (differentiable).

Re-derivation of the CUDA per-tile front-to-back march
(`cuda_rasterizer/forward.cu:261-374`) into data-parallel form:

With instances sorted by (tile, depth), a pixel's transmittance before
instance m is  T_m = Π_{k<m, same tile} (1 − α_k)  — i.e. an *exclusive
segment-cumulative-product*, which we evaluate as exp of a cumulative sum of
log(1−α) minus the value at the segment start.  The final color is then the
weighted sum  Σ α_m·T_m·c_m + T_end·bg — a matmul between weights and colors.
This removes all sequential control flow: the whole blend is cumsum + exp +
segment-sum, every op vectorized over (instances × 256 tile pixels).

Early-termination parity: the CUDA kernel skips the contribution that would
bring T below 1e-4 and stops (`forward.cu:346-351`).  Because T is monotone
non-increasing, the set of surviving contributions is exactly the prefix where
T·(1−α) ≥ 1e-4, so a mask reproduces the semantics exactly; `final_T` is
accumulated over *included* instances only, matching the CUDA running T.

Per-instance skip parity (`forward.cu:331-345`): power > 0 skip, α = min(0.99,
opacity·exp(power)), α < 1/255 skip — all reproduced as masks.

This module is the correctness oracle for the Pallas kernels in
``blend_pallas.py`` and is itself end-to-end differentiable via JAX autodiff
(cumsum/exp/segment_sum all have exact adjoints), so the whole rasterizer
works on any backend (CPU tests) without custom gradients.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

T_EPS = 1e-4  # termination threshold (`forward.cu:346`)
ALPHA_MIN = 1.0 / 255.0  # contribution threshold (`forward.cu:340`)
ALPHA_MAX = 0.99  # clamp (`forward.cu:339`)


class BlendOutput(NamedTuple):
    tiles: jnp.ndarray  # (T, P, C) composited tile pixels (incl. bg term)
    final_t: jnp.ndarray  # (T, P) remaining transmittance
    n_contrib: jnp.ndarray  # (T, P) int32 count of included contributions


def instance_alphas(
    gauss_id: jnp.ndarray,  # (M,)
    tile_id: jnp.ndarray,  # (M,) == num_tiles for padding slots
    means2d: jnp.ndarray,  # (N, 2) pixel coords
    conics: jnp.ndarray,  # (N, 3)
    opacities: jnp.ndarray,  # (N,)
    grid_x: int,
    tile_size: int,
) -> jnp.ndarray:
    """Per-(instance, tile-pixel) alpha with the CUDA skip rules applied.

    Returns (M, P) with P = tile_size².  Padding instances get all-zero alpha.
    """
    p = tile_size * tile_size
    tx = (tile_id % grid_x).astype(jnp.float32)
    ty = (tile_id // grid_x).astype(jnp.float32)
    # Pixel centers are integer coordinates (pixf in `forward.cu:287`).
    px_local = jnp.arange(p, dtype=jnp.float32) % tile_size
    py_local = jnp.arange(p, dtype=jnp.float32) // tile_size
    px = tx[:, None] * tile_size + px_local[None, :]  # (M, P)
    py = ty[:, None] * tile_size + py_local[None, :]

    g = gauss_id
    dx = means2d[g, 0][:, None] - px
    dy = means2d[g, 1][:, None] - py
    a = conics[g, 0][:, None]
    b = conics[g, 1][:, None]
    c = conics[g, 2][:, None]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, opacities[g][:, None] * jnp.exp(power))
    contributes = (power <= 0.0) & (alpha >= ALPHA_MIN)
    return jnp.where(contributes, alpha, 0.0)


def blend(
    gauss_id: jnp.ndarray,  # (M,) sorted instance → Gaussian
    tile_id: jnp.ndarray,  # (M,) sorted instance → tile (num_tiles = padding)
    tile_starts: jnp.ndarray,  # (T+1,)
    means2d: jnp.ndarray,
    conics: jnp.ndarray,
    opacities: jnp.ndarray,
    colors: jnp.ndarray,  # (N, C) — may include extra channels (depth, mask)
    bg: jnp.ndarray,  # (C,)
    grid_x: int,
    grid_y: int,
    tile_size: int,
) -> BlendOutput:
    num_tiles = grid_x * grid_y
    p = tile_size * tile_size
    m = gauss_id.shape[0]

    alpha = instance_alphas(
        gauss_id, tile_id, means2d, conics, opacities, grid_x, tile_size
    )  # (M, P)

    log1m = jnp.log1p(-alpha)  # 0 for skipped/padding instances
    cum = jnp.cumsum(log1m, axis=0)  # inclusive
    cum_excl = cum - log1m
    # Segment base: cumulative value just before the instance's tile segment.
    tile_safe = jnp.minimum(tile_id, num_tiles - 1)
    seg_start = tile_starts[tile_safe]  # (M,)
    base = jnp.where(
        (seg_start > 0)[:, None], cum[jnp.maximum(seg_start - 1, 0)], 0.0
    )  # (M, P)
    log_t_before = cum_excl - base
    t_before = jnp.exp(log_t_before)
    t_after = t_before * (1.0 - alpha)
    include = (t_after >= T_EPS) & (alpha > 0.0)

    weights = jnp.where(include, alpha * t_before, 0.0)  # (M, P)

    seg = jnp.minimum(tile_id, num_tiles)  # padding → extra segment
    # Weighted color accumulation: Σ_m w_m ⊗ c_m per tile.
    wc = weights[:, :, None] * colors[gauss_id][:, None, :]  # (M, P, C)
    tiles = jax.ops.segment_sum(wc, seg, num_segments=num_tiles + 1)[:-1]

    # final_T over *included* contributions only (matches the CUDA running T).
    inc_log1m = jnp.where(include, log1m, 0.0)
    final_log_t = jax.ops.segment_sum(inc_log1m, seg, num_segments=num_tiles + 1)[:-1]
    final_t = jnp.exp(final_log_t)

    tiles = tiles + final_t[:, :, None] * bg[None, None, :]

    # n_contrib: number of *included* contributions per pixel.  (CUDA stores
    # the rank-with-skips of the last contributor, `forward.cu:326,365` — an
    # internal buffer never exposed to Python; we count includes instead,
    # which is invariant under the exact-footprint instance culling.)
    n_contrib = jax.ops.segment_sum(
        include.astype(jnp.int32), seg, num_segments=num_tiles + 1
    )[:-1]

    return BlendOutput(tiles=tiles, final_t=final_t, n_contrib=n_contrib)


def tiles_to_image(
    tiles: jnp.ndarray, grid_x: int, grid_y: int, tile_size: int, width: int, height: int
) -> jnp.ndarray:
    """(T, P, C) tile pixels → (H, W, C) image (cropping edge-tile padding)."""
    c = tiles.shape[-1]
    img = tiles.reshape(grid_y, grid_x, tile_size, tile_size, c)
    img = img.transpose(0, 2, 1, 3, 4).reshape(
        grid_y * tile_size, grid_x * tile_size, c
    )
    return img[:height, :width]
