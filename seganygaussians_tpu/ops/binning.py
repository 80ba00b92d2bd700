"""Tile binning: duplicate-with-keys, depth sort, per-tile ranges — in XLA.

TPU-first re-design of the CUDA binning stage
(`rasterizer_impl.cu:70-138, 279-308`): CUDA duplicates each Gaussian once per
touched tile with a scatter and radix-sorts 64-bit (tile, depth) keys.  On TPU
we avoid the scatter entirely:

  1. exclusive prefix-sum of ``tiles_touched`` gives per-Gaussian offsets;
  2. every instance slot m ∈ [0, capacity) *gathers* its owning Gaussian with a
     vectorized ``searchsorted`` into the prefix sums (the inverse map of the
     CUDA scatter), and derives its tile from the local rank within the
     Gaussian's tile rect;
  3. one ``lax.sort`` with two keys (tile, depth) replaces the radix sort;
  4. per-tile [start, end) ranges come from ``searchsorted`` over the sorted
     tile ids (replacing ``identifyTileRanges``).

Shapes are static: ``capacity`` is a compile-time instance budget; slots past
the true instance count get a sentinel tile id that sorts to the tail and an
overflow flag is returned so the host can grow the budget and recompile
(the XLA analogue of the CUDA resizable-buffer trick,
`rasterize_points.cu:27-33`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from seganygaussians_tpu.ops.projection import Preprocessed


class Binned(NamedTuple):
    gauss_id: jnp.ndarray  # (M,) int32 Gaussian index per sorted instance
    tile_id: jnp.ndarray  # (M,) int32 tile per sorted instance (== num_tiles ⇒ padding)
    tile_starts: jnp.ndarray  # (T+1,) int32; tile t occupies [starts[t], starts[t+1])
    num_instances: jnp.ndarray  # () int32 true instance count (may exceed capacity)
    overflow: jnp.ndarray  # () bool — capacity exceeded, results truncated


def bin_gaussians(prep: Preprocessed, grid_x: int, grid_y: int, capacity: int) -> Binned:
    """Expand Gaussians into per-tile instances and sort by (tile, depth)."""
    n = prep.tiles_touched.shape[0]
    num_tiles = grid_x * grid_y

    tiles = prep.tiles_touched
    cum = jnp.cumsum(tiles)  # inclusive
    total = cum[-1]
    offsets = cum - tiles  # exclusive prefix sum

    # Instance slot → owning Gaussian: first g with cum[g] > m.
    slots = jnp.arange(capacity, dtype=jnp.int32)
    gauss = jnp.searchsorted(cum, slots, side="right").astype(jnp.int32)
    gauss = jnp.minimum(gauss, n - 1)
    in_range = slots < total

    # Local rank inside the Gaussian's tile rect (row-major, matching
    # duplicateWithKeys' y-then-x loop, `rasterizer_impl.cu:86-101`).
    rank = slots - offsets[gauss]
    rect_w = jnp.maximum(prep.rect_max[gauss, 0] - prep.rect_min[gauss, 0], 1)
    tx = prep.rect_min[gauss, 0] + rank % rect_w
    ty = prep.rect_min[gauss, 1] + rank // rect_w
    tile = ty * grid_x + tx

    tile = jnp.where(in_range, tile, num_tiles).astype(jnp.int32)
    depth = jnp.where(in_range, prep.depths[gauss], jnp.inf).astype(jnp.float32)

    tile_s, _, gauss_s = lax.sort((tile, depth, gauss), num_keys=2)

    tile_starts = jnp.searchsorted(
        tile_s, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    return Binned(
        gauss_id=gauss_s,
        tile_id=tile_s,
        tile_starts=tile_starts,
        num_instances=jnp.minimum(total, capacity),
        overflow=total > capacity,
    )
