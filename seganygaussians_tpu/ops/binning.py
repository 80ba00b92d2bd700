"""Tile binning: duplicate-with-keys, depth sort, per-tile ranges — in XLA.

TPU-first re-design of the CUDA binning stage
(`rasterizer_impl.cu:70-138, 279-308`).  CUDA duplicates each Gaussian once
per touched tile with a scatter and radix-sorts 64-bit (tile|depth) keys.  On
TPU, random-order gathers/scatters of instance-sized arrays are the expensive
primitive (measured 15-30x slower than sorts at M ~ 4M,
tools/bench_primitives.py), so the design avoids them:

  1. Gaussians are depth-sorted *first* (an N-sized sort) so instance slots
     enumerated in Gaussian order are already depth-ordered.
  2. Instance expansion: a prefix-sum of ``tiles_touched`` gives per-Gaussian
     slot offsets; ONE exact integer scatter-add + cumulative sum expands the
     owning depth rank to every slot; the remaining per-Gaussian fields
     (offset + bit-packed tile rect) ride a single 2-column row gather whose
     indices are ascending — the memory-coherent gather fast path.
  3. One *single-array* sort of a bit-packed int32 key (tile ≪ rank_bits |
     rank) produces (tile, depth) order — instance pairs are unique, so no
     stability or payload columns are needed (falls back to a 2-array stable
     sort when tile·rank bits exceed 31).
  4. Per-tile [start, end) ranges come from a small searchsorted over the
     sorted keys (T+1 queries), replacing ``identifyTileRanges``.

Shapes are static: ``capacity`` is a compile-time instance budget; slots past
the true instance count get a sentinel key that sorts to the tail and an
overflow flag is returned so the host can grow the budget and recompile (the
XLA analogue of the CUDA resizable-buffer trick, `rasterize_points.cu:27-33`).
Use :func:`suggest_capacity` for tight 1.25x-step buckets — every binning,
packing and gradient-reduction cost scales linearly with capacity.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax.numpy as jnp
from jax import lax

from seganygaussians_tpu.ops.projection import Preprocessed

_BUCKET_STEPS = (1.0, 1.25, 1.5, 1.75)


def suggest_capacity(total: int, headroom: float = 1.15, multiple: int = 256) -> int:
    """Smallest capacity bucket holding ``total`` instances with headroom.

    Buckets step by 1.25x (2^k · {1, 1.25, 1.5, 1.75}) instead of doubling —
    the XLA binning/pack/epilogue stages all scale linearly with capacity, so
    loose pow2 buckets directly cost wall-clock.
    """
    need = max(int(total * headroom), multiple)
    k = int(np.floor(np.log2(need)))
    for kk in (k, k + 1):
        base = 1 << kk
        for s in _BUCKET_STEPS:
            cap = int(base * s)
            if cap >= need:
                return ((cap + multiple - 1) // multiple) * multiple
    return ((need + multiple - 1) // multiple) * multiple  # unreachable


class SlotPlan(NamedTuple):
    """Slot-order instance expansion, BEFORE the (tile, depth) sort.

    Slot order groups each Gaussian's instances contiguously (by ascending
    depth rank).  The Pallas path sorts keys *and field payloads together*
    (`blend_pallas.blend_fused`), which replaces the round-2 two-step
    sort-then-row-gather pack (the (M, F) gather was ~40% of forward cost,
    measured in tools/profile_raster.py)."""

    slot_rank: jnp.ndarray  # (M,) int32 ascending depth rank per slot (clipped)
    slot_tile: jnp.ndarray  # (M,) int32 tile per slot (== num_tiles ⇒ padding)
    depth_perm: jnp.ndarray  # (N,) int32: depth rank → original Gaussian index
    num_instances: jnp.ndarray  # () int32 true instance count (≤ capacity)
    overflow: jnp.ndarray  # () bool — capacity exceeded, results truncated


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


def expand_slots(
    prep: Preprocessed, grid_x: int, grid_y: int, capacity: int
) -> SlotPlan:
    """Expand Gaussians into slot-order (rank-grouped) tile instances.

    Steps 1-2 of the binning design (module docstring): depth-sort Gaussians,
    then expand each to one slot per touched tile with a single exact integer
    cumsum pass + one ascending 2-column row gather — no sort yet."""
    n = prep.tiles_touched.shape[0]
    num_tiles = grid_x * grid_y

    # 1. Depth-sort Gaussians (culled ones → +inf, zero tiles).
    depth_key = jnp.where(prep.valid, prep.depths, jnp.inf)
    _, depth_perm = lax.sort_key_val(depth_key, jnp.arange(n, dtype=jnp.int32))
    tiles = prep.tiles_touched[depth_perm]  # N-sized gathers: cheap
    rect_min = prep.rect_min[depth_perm]
    rect_max = prep.rect_max[depth_perm]

    # 2. Expansion: one exact integer cumsum pass for the owning rank, one
    # ascending row gather for the per-Gaussian fields.
    cum = jnp.cumsum(tiles)
    total = cum[-1]
    offsets = cum - tiles  # exclusive prefix (first element 0)

    gauss_rank = _expand_int(jnp.arange(n, dtype=jnp.int32), offsets, capacity)
    gauss_rank = jnp.clip(gauss_rank, 0, n - 1)

    w = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1)
    packed_rect = rect_min[:, 0] | (rect_min[:, 1] << 10) | (w << 20)
    table = jnp.stack([offsets, packed_rect], axis=-1)  # (N, 2) int32
    per_slot = table[gauss_rank]  # ascending-index gather: coherent
    off_slot = per_slot[:, 0]
    pk = per_slot[:, 1]
    x0 = pk & 1023
    y0 = (pk >> 10) & 1023
    ww = jnp.maximum(pk >> 20, 1)

    slots = jnp.arange(capacity, dtype=jnp.int32)
    rank = slots - off_slot
    tx = x0 + rank % ww
    ty = y0 + rank // ww
    tile = ty * grid_x + tx

    in_range = slots < total
    tile = jnp.clip(jnp.where(in_range, tile, num_tiles), 0, num_tiles).astype(jnp.int32)

    return SlotPlan(
        slot_rank=gauss_rank,
        slot_tile=tile,
        depth_perm=depth_perm,
        num_instances=jnp.minimum(total, capacity),
        overflow=total > capacity,
    )


def bin_gaussians(prep: Preprocessed, grid_x: int, grid_y: int, capacity: int) -> Binned:
    """Expand Gaussians into per-tile instances sorted by (tile, depth)."""
    n = prep.tiles_touched.shape[0]
    num_tiles = grid_x * grid_y
    plan = expand_slots(prep, grid_x, grid_y, capacity)
    gauss_rank = plan.slot_rank
    tile = plan.slot_tile
    in_range = jnp.arange(capacity, dtype=jnp.int32) < plan.num_instances

    # 3+4. Sort + tile ranges.
    rank_bits = max(1, int(np.ceil(np.log2(max(n, 2)))))
    tile_bits = int(np.ceil(np.log2(num_tiles + 2)))
    if rank_bits + tile_bits <= 31:
        # Packed single-array sort: (tile, rank) instance pairs are unique.
        key = jnp.where(
            in_range & (tile < num_tiles),
            (tile << rank_bits) | gauss_rank,
            jnp.int32(num_tiles << rank_bits),
        )
        (key_s,) = lax.sort((key,), num_keys=1, is_stable=False)
        tile_starts = jnp.searchsorted(
            key_s,
            (jnp.arange(num_tiles + 1, dtype=jnp.int32) << rank_bits),
            side="left",
        ).astype(jnp.int32)
        gauss_s = key_s & jnp.int32((1 << rank_bits) - 1)
        tile_s = key_s >> rank_bits
    else:
        tile_s, gauss_s = lax.sort(
            (tile, gauss_rank.astype(jnp.int32)), num_keys=1, is_stable=True
        )
        tile_starts = jnp.searchsorted(
            tile_s, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)

    return Binned(
        gauss_id=gauss_s,
        tile_id=tile_s,
        tile_starts=tile_starts,
        depth_perm=plan.depth_perm,
        num_instances=plan.num_instances,
        overflow=plan.overflow,
    )
