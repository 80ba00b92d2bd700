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
    # mode="drop" discards out-of-range offsets (≥ capacity) outright — a
    # clamp to capacity-1 would corrupt the last in-range slot whenever
    # trailing culled/zero-tile Gaussians share offset == capacity.
    base = jnp.zeros((capacity,), field.dtype).at[offsets].add(deltas, mode="drop")
    return jnp.cumsum(base)


def expand_slots(
    prep: Preprocessed, grid_x: int, grid_y: int, capacity: int
) -> SlotPlan:
    """Expand Gaussians into slot-order (rank-grouped) tile instances.

    Steps 1-2 of the binning design (module docstring): depth-sort Gaussians,
    then expand each to one slot per touched tile.  All three per-slot int
    fields (owning rank, slot-range offset, packed rect) are reconstructed by
    ONE fused delta pass: a single (N, 4)→(M, 4) row scatter-add of
    per-Gaussian deltas at segment starts followed by one multi-column
    integer cumsum — integers make the delta/cumsum reconstruction exact,
    and it replaces the previous per-field scatter + instance-scale row
    gather (instance-scale gathers are the slowest XLA primitive on this
    chip; see module docstring)."""
    n = prep.tiles_touched.shape[0]
    num_tiles = grid_x * grid_y

    # 1. Depth-sort Gaussians (culled ones → +inf, zero tiles).
    depth_key = jnp.where(prep.valid, prep.depths, jnp.inf)
    _, depth_perm = lax.sort_key_val(depth_key, jnp.arange(n, dtype=jnp.int32))
    tiles = prep.tiles_touched[depth_perm]  # N-sized gathers: cheap
    rect_min = prep.rect_min[depth_perm]
    rect_max = prep.rect_max[depth_perm]

    # 2. Expansion.
    cum = jnp.cumsum(tiles)
    total = cum[-1]
    offsets = cum - tiles  # exclusive prefix (first element 0)

    if prep.row_pack is not None:
        return _expand_slots_rows(
            prep, depth_perm, tiles, rect_min, rect_max, offsets, total,
            grid_x, grid_y, capacity,
        )

    w = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1)
    packed_rect = rect_min[:, 0] | (rect_min[:, 1] << 10) | (w << 20)

    # Fused delta scatter: slot m receives field[g*] with
    # g* = max{g : offsets[g] ≤ m} for every column at once (empty Gaussians
    # share the next offset and telescope away in the scatter-ADD).
    fields_n = jnp.stack(
        [jnp.arange(n, dtype=jnp.int32), offsets, packed_rect], axis=-1
    )  # (N, 3)
    deltas = jnp.diff(fields_n, axis=0, prepend=jnp.zeros((1, 3), jnp.int32))
    # mode="drop" discards offsets ≥ capacity; clamping them to capacity-1
    # would corrupt the final slot's rank/offset/rect whenever trailing
    # culled Gaussians share offset == capacity (even without overflow).
    base = (
        jnp.zeros((capacity, 3), jnp.int32)
        .at[offsets]
        .add(deltas, mode="drop")
    )
    per_slot = jnp.cumsum(base, axis=0)  # (M, 3) exact int reconstruction
    gauss_rank = jnp.clip(per_slot[:, 0], 0, n - 1)
    off_slot = per_slot[:, 1]
    pk = per_slot[:, 2]
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


def _expand_slots_rows(
    prep, depth_perm, tiles, rect_min, rect_max, offsets, total,
    grid_x: int, grid_y: int, capacity: int,
):
    """Two-level expansion over elliptical per-tile-row intervals.

    With ``prep.row_pack`` present, ``tiles_touched`` counts exact per-row
    interval widths (projection._row_intervals), so slots can no longer be
    decoded from one rectangle: expansion goes Gaussian → tile-row instances
    (level 1, the same delta-scatter trick at N scale) → slots (level 2, the
    trick again at row-instance scale, R ≈ M/2.6).  Both levels are exact
    integer scatter-add + cumsum reconstructions; no sorts, no random
    gathers (the two table gathers are ascending in the owning rank).
    """
    n = tiles.shape[0]
    num_tiles = grid_x * grid_y
    g_idx = jnp.arange(n, dtype=jnp.int32)

    row_pack = prep.row_pack[depth_perm]  # (N, G) — N-scale row gather
    heights = jnp.where(tiles > 0, rect_max[:, 1] - rect_min[:, 1], 0)
    hcum = jnp.cumsum(heights)
    r_total = hcum[-1]
    row_off = hcum - heights

    # Level 1: Gaussian → row-instances (capacity reused as the row budget;
    # R ≤ M_rect, and the overflow flag covers pathological tall footprints).
    f1 = jnp.stack([g_idx, row_off, rect_min[:, 1]], axis=-1)  # (N, 3)
    d1 = jnp.diff(f1, axis=0, prepend=jnp.zeros((1, 3), jnp.int32))
    base1 = jnp.zeros((capacity, 3), jnp.int32).at[row_off].add(d1, mode="drop")
    per_row = jnp.cumsum(base1, axis=0)  # (R_cap, 3)
    g_r = jnp.clip(per_row[:, 0], 0, n - 1)
    roff_r = per_row[:, 1]
    ry0_r = per_row[:, 2]
    rowslots = jnp.arange(capacity, dtype=jnp.int32)
    in_rows = rowslots < r_total
    ty_r = jnp.clip(ry0_r + (rowslots - roff_r), 0, grid_y - 1)

    # Per-row interval + within-Gaussian width prefix: two ascending flat
    # gathers from (N·G) tables.
    wmat = (row_pack >> 10) & 1023  # (N, G)
    wc = jnp.cumsum(wmat, axis=1)  # inclusive row-width prefix per Gaussian
    flat_idx = g_r * grid_y + ty_r
    rp_r = row_pack.reshape(-1)[flat_idx]
    x0_r = rp_r & 1023
    w_r = (rp_r >> 10) & 1023
    excl_w = wc.reshape(-1)[flat_idx] - w_r  # widths of earlier rows of g
    soff_r = offsets[g_r] + excl_w
    # Rows past r_total: constant fields at a soff of `total` so their
    # telescoped deltas land at/after the live slot range (or drop).
    soff_r = jnp.where(in_rows, soff_r, total)
    g_r = jnp.where(in_rows, g_r, 0)
    pk_r = jnp.where(in_rows, x0_r | (ty_r << 10), 0)

    # Level 2: row-instances → slots.
    f2 = jnp.stack([g_r, soff_r, pk_r], axis=-1)  # (R_cap, 3)
    d2 = jnp.diff(f2, axis=0, prepend=jnp.zeros((1, 3), jnp.int32))
    base2 = jnp.zeros((capacity, 3), jnp.int32).at[soff_r].add(d2, mode="drop")
    per_slot = jnp.cumsum(base2, axis=0)
    rank2 = jnp.clip(per_slot[:, 0], 0, n - 1)
    soff2 = per_slot[:, 1]
    pk2 = per_slot[:, 2]
    x0s = pk2 & 1023
    tys = (pk2 >> 10) & 1023
    slots = jnp.arange(capacity, dtype=jnp.int32)
    tx = x0s + (slots - soff2)
    tile = tys * grid_x + tx
    in_range = slots < total
    tile = jnp.clip(
        jnp.where(in_range, tile, num_tiles), 0, num_tiles
    ).astype(jnp.int32)

    return SlotPlan(
        slot_rank=rank2,
        slot_tile=tile,
        depth_perm=depth_perm,
        num_instances=jnp.minimum(total, capacity),
        overflow=(total > capacity) | (r_total > capacity),
    )


class InstancePlan(NamedTuple):
    """Sort-free binning: analytic (tile, depth) destinations.

    ``lax.sort`` at instance scale is the pipeline bottleneck (193 ms of a
    304 ms frame for a 1 key + 9 payload sort at M=2.6M — BASELINE.md round-4
    profile).  But no comparison sort is needed: instances are generated in
    depth order (slots enumerate depth-ranked Gaussians), so (tile, depth)
    order is a *stable partition by tile*, and the destination of slot i is
    closed-form:

        dest[i] = tile_starts[t_i] + #{Gaussians before g_i covering t_i}

    because every Gaussian covers each tile at most once and its footprint is
    an axis-aligned tile rectangle.  The prefix-coverage count splits into a
    per-block term (cumulative per-tile histograms of Gaussian blocks — MXU
    matmuls of separable x/y interval indicators) plus a within-block term
    (≤ BLOCK bound comparisons per instance on the VPU, reading one packed
    bounds row per instance via a block-coherent gather).  Everything is
    histograms, cumsums, one permutation scatter and table gathers — no sort.
    """

    sorted_gauss: jnp.ndarray  # (M,) int32: sorted position → depth rank
    tile_starts: jnp.ndarray  # (T+1,) int32
    dest: jnp.ndarray  # (M,) int32: slot → sorted position
    offsets: jnp.ndarray  # (N,) int32: per-depth-rank slot range start
    depth_perm: jnp.ndarray  # (N,) int32
    num_instances: jnp.ndarray  # () int32
    overflow: jnp.ndarray  # () bool


_RANK_BLOCK = 16  # Gaussians per histogram block (bounds row = 2·B int32)


def plan_instances(
    prep: Preprocessed, grid_x: int, grid_y: int, capacity: int,
    block: int = _RANK_BLOCK,
) -> InstancePlan:
    """Sort-free replacement for :func:`bin_gaussians` (see InstancePlan)."""
    prep = strip_row_footprints(prep)  # analytic destinations decode rects
    assert grid_x < 1024 and grid_y < 1024, "packed bounds hold 10 bits"
    n = prep.tiles_touched.shape[0]
    num_tiles = grid_x * grid_y

    # Depth-sort Gaussians (an N-sized sort — cheap) exactly as expand_slots.
    depth_key = jnp.where(prep.valid, prep.depths, jnp.inf)
    _, depth_perm = lax.sort_key_val(depth_key, jnp.arange(n, dtype=jnp.int32))
    tiles = prep.tiles_touched[depth_perm]
    rect_min = prep.rect_min[depth_perm]
    rect_max = prep.rect_max[depth_perm]

    cum = jnp.cumsum(tiles)
    total = cum[-1]
    offsets = cum - tiles

    # --- per-slot (tile, owning-rank) coordinates, as in expand_slots
    gauss_rank = _expand_int(jnp.arange(n, dtype=jnp.int32), offsets, capacity)
    gauss_rank = jnp.clip(gauss_rank, 0, n - 1)
    w_g = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1)
    packed_rect = rect_min[:, 0] | (rect_min[:, 1] << 10) | (w_g << 20)
    table = jnp.stack([offsets, packed_rect], axis=-1)
    per_slot = table[gauss_rank]  # ascending gather: coherent
    off_slot = per_slot[:, 0]
    pk = per_slot[:, 1]
    x0s = pk & 1023
    y0s = (pk >> 10) & 1023
    wws = jnp.maximum(pk >> 20, 1)
    slots = jnp.arange(capacity, dtype=jnp.int32)
    r = slots - off_slot
    tx = x0s + r % wws
    ty = y0s + r // wws
    tile = ty * grid_x + tx
    in_range = slots < total

    # --- block histograms of rect coverage (MXU): hist[b, ty, tx]
    contrib = tiles > 0
    n_pad = ((n + block - 1) // block) * block
    nb = n_pad // block
    xi = lax.broadcasted_iota(jnp.int32, (n, grid_x), 1)
    yi = lax.broadcasted_iota(jnp.int32, (n, grid_y), 1)
    xind = (
        (xi >= rect_min[:, 0:1]) & (xi < rect_max[:, 0:1]) & contrib[:, None]
    ).astype(jnp.float32)
    yind = (
        (yi >= rect_min[:, 1:2]) & (yi < rect_max[:, 1:2]) & contrib[:, None]
    ).astype(jnp.float32)
    if n_pad != n:
        xind = jnp.pad(xind, ((0, n_pad - n), (0, 0)))
        yind = jnp.pad(yind, ((0, n_pad - n), (0, 0)))
    hist = jnp.einsum(
        "nby,nbx->nyx",
        yind.reshape(nb, block, grid_y),
        xind.reshape(nb, block, grid_x),
        preferred_element_type=jnp.float32,
    )  # exact: counts < 2^24
    hist_flat = hist.reshape(nb, num_tiles)
    base = jnp.cumsum(hist_flat, axis=0) - hist_flat  # exclusive over blocks
    counts = (base[-1] + hist_flat[-1]).astype(jnp.int32)  # (T,)
    # Clamp to capacity: on overflow the deepest instances are truncated
    # (overflow flag → host grows the budget and recompiles) and the kernel
    # must never be pointed past the instance buffer.
    tile_starts = jnp.minimum(
        jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)]),
        capacity,
    )

    # --- within-block prefix coverage per instance (VPU)
    b_i = gauss_rank // block
    l_i = gauss_rank % block
    packx = rect_min[:, 0] | (rect_max[:, 0] << 10)
    packy = rect_min[:, 1] | (rect_max[:, 1] << 10)
    inval = jnp.int32(1023)  # x0=1023,x1=0 ⇒ never covers
    packx = jnp.where(contrib, packx, inval)
    packy = jnp.where(contrib, packy, inval)
    if n_pad != n:
        packx = jnp.pad(packx, (0, n_pad - n), constant_values=int(inval))
        packy = jnp.pad(packy, (0, n_pad - n), constant_values=int(inval))
    packx = packx.reshape(nb, block)
    packy = packy.reshape(nb, block)
    rowx = packx[b_i]  # (M, B) block-coherent gathers
    rowy = packy[b_i]
    bx0 = rowx & 1023
    bx1 = rowx >> 10
    by0 = rowy & 1023
    by1 = rowy >> 10
    lane = lax.broadcasted_iota(jnp.int32, (1, block), 1)
    cover = (
        (tx[:, None] >= bx0)
        & (tx[:, None] < bx1)
        & (ty[:, None] >= by0)
        & (ty[:, None] < by1)
        & (lane < l_i[:, None])
    )
    rank_wb = jnp.sum(cover.astype(jnp.int32), axis=1)

    # --- assemble destinations
    base_g = base.reshape(-1).astype(jnp.int32)[
        jnp.clip(b_i * num_tiles + tile, 0, nb * num_tiles - 1)
    ]
    dest = tile_starts[jnp.clip(tile, 0, num_tiles)] + base_g + rank_wb
    dest = jnp.where(in_range, dest, slots)  # padding slots: identity

    sorted_gauss = (
        jnp.zeros((capacity,), jnp.int32)
        .at[dest]
        .set(gauss_rank, mode="drop", unique_indices=True)
    )
    return InstancePlan(
        sorted_gauss=sorted_gauss,
        tile_starts=tile_starts,
        dest=dest,
        offsets=offsets,
        depth_perm=depth_perm,
        num_instances=jnp.minimum(total, capacity),
        overflow=total > capacity,
    )


def strip_row_footprints(prep: Preprocessed) -> Preprocessed:
    """Rect-consistent view of a ``Preprocessed`` carrying row intervals.

    Consumers that decode slots from one bounding rectangle (the sort-free
    ``plan_instances`` path, tile-slab clipping) must see ``tiles_touched``
    that counts the full rect — drop the row data and recount."""
    if prep.row_pack is None:
        return prep
    w = jnp.maximum(prep.rect_max[:, 0] - prep.rect_min[:, 0], 0)
    h = jnp.maximum(prep.rect_max[:, 1] - prep.rect_min[:, 1], 0)
    touched = jnp.where(prep.valid, w * h, 0).astype(jnp.int32)
    return prep._replace(row_pack=None, tiles_touched=touched)


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
