"""Tile binning: duplicate-with-keys, depth sort, per-tile ranges — in XLA.

TPU-first re-design of the CUDA binning stage
(`rasterizer_impl.cu:70-138, 279-308`).  CUDA duplicates each Gaussian once
per touched tile with a scatter and radix-sorts 64-bit (tile|depth) keys.  On
TPU, random gathers/scatters of instance-sized arrays are the expensive
primitive (XLA lowers them to serialized element copies), so the design
avoids them entirely:

  1. Gaussians are depth-sorted *first* (an N-sized sort) so instance slots
     enumerated in Gaussian order are already depth-ordered.
  2. Instance expansion is computed with *exact integer* scatter-add +
     cumulative sums: a prefix-sum of ``tiles_touched`` gives per-Gaussian
     slot offsets; scattering +1 (and integer field deltas) at those offsets
     and cumsumming yields, for every slot, its owning Gaussian and tile rect
     — no per-slot gather, no searchsorted, and no float error.
  3. One single-key *stable* sort by tile id then produces (tile, depth)
     order: stability preserves the depth-major slot order within each tile,
     replacing the CUDA 64-bit radix sort with a cheaper 1-key sort.
  4. Per-tile [start, end) ranges come from a small searchsorted over the
     sorted tile ids (T+1 queries), replacing ``identifyTileRanges``.

Shapes are static: ``capacity`` is a compile-time instance budget; slots past
the true instance count get a sentinel tile id that sorts to the tail and an
overflow flag is returned so the host can grow the budget and recompile (the
XLA analogue of the CUDA resizable-buffer trick, `rasterize_points.cu:27-33`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from seganygaussians_tpu.ops.projection import Preprocessed


class Binned(NamedTuple):
    gauss_id: jnp.ndarray  # (M,) int32: sorted instance → *depth rank*
    tile_id: jnp.ndarray  # (M,) int32 sorted tile (== num_tiles ⇒ padding)
    tile_starts: jnp.ndarray  # (T+1,) int32; tile t occupies [starts[t], starts[t+1])
    depth_perm: jnp.ndarray  # (N,) int32: depth rank → original Gaussian index
    num_instances: jnp.ndarray  # () int32 true instance count (≤ capacity reported)
    overflow: jnp.ndarray  # () bool — capacity exceeded, results truncated


def _expand_int(field: jnp.ndarray, offsets: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Expand a per-Gaussian int field to slots: slot m gets field[g*] where
    g* = max{g : offsets[g] ≤ m} — for slots inside a non-empty Gaussian's
    range this is exactly the owner (empty Gaussians share the next offset and
    telescope away).  Exact integer scatter-add of deltas at segment starts
    followed by an inclusive cumsum — no per-slot gathers."""
    deltas = jnp.diff(field, prepend=jnp.zeros((1,), field.dtype))
    base = jnp.zeros((capacity,), field.dtype).at[jnp.minimum(offsets, capacity - 1)].add(
        deltas, mode="drop"
    )
    return jnp.cumsum(base)


def bin_gaussians(prep: Preprocessed, grid_x: int, grid_y: int, capacity: int) -> Binned:
    """Expand Gaussians into per-tile instances sorted by (tile, depth)."""
    n = prep.tiles_touched.shape[0]
    num_tiles = grid_x * grid_y

    # 1. Depth-sort Gaussians (culled ones → +inf, zero tiles).
    depth_key = jnp.where(prep.valid, prep.depths, jnp.inf)
    _, depth_perm = lax.sort_key_val(depth_key, jnp.arange(n, dtype=jnp.int32))
    tiles = prep.tiles_touched[depth_perm]  # N-sized gathers: cheap
    rect_min = prep.rect_min[depth_perm]
    rect_max = prep.rect_max[depth_perm]

    # 2. Exact integer expansion.
    cum = jnp.cumsum(tiles)
    total = cum[-1]
    offsets = cum - tiles  # exclusive prefix (first element 0)

    gauss_rank = _expand_int(jnp.arange(n, dtype=jnp.int32), offsets, capacity)
    off_slot = _expand_int(offsets, offsets, capacity)
    x0_slot = _expand_int(rect_min[:, 0], offsets, capacity)
    y0_slot = _expand_int(rect_min[:, 1], offsets, capacity)
    w_slot = _expand_int(rect_max[:, 0] - rect_min[:, 0], offsets, capacity)
    w_slot = jnp.maximum(w_slot, 1)

    slots = jnp.arange(capacity, dtype=jnp.int32)
    rank = slots - off_slot
    tx = x0_slot + rank % w_slot
    ty = y0_slot + rank // w_slot
    tile = ty * grid_x + tx

    in_range = slots < total
    tile = jnp.clip(jnp.where(in_range, tile, num_tiles), 0, num_tiles).astype(jnp.int32)

    # 3. Single-key stable sort by tile: within a tile, slots keep depth order.
    tile_s, gauss_s = lax.sort(
        (tile, gauss_rank.astype(jnp.int32)), num_keys=1, is_stable=True
    )

    # 4. Tile ranges.
    tile_starts = jnp.searchsorted(
        tile_s, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    return Binned(
        gauss_id=gauss_s,
        tile_id=tile_s,
        tile_starts=tile_starts,
        depth_perm=depth_perm,
        num_instances=jnp.minimum(total, capacity),
        overflow=total > capacity,
    )
