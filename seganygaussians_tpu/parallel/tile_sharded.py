"""Tile-space sharding of the rasterization grid across a device mesh.

SURVEY.md §2.4 bullet 2 / BASELINE north star ("image tiles … sharded across
a multi-host pod"): for large frames, each device blends a horizontal slab of
tile rows against the full (replicated) Gaussian set.  Gaussian parameters
and the preprocess stage are replicated — preprocess is N-sized and cheap
(3.5 ms of a 300 ms frame, BASELINE.md) — while the expensive instance
expansion + blend run on each device's slab only: a Gaussian's footprint
rectangle is clipped to the slab, so per-device instance counts (and the
blend grid) shrink by ~1/D.  The loss reduces with `psum` over the slab
axis; parameter gradients are summed the same way, giving exact parity with
the single-device rasterizer.

Expressed with `shard_map`: inputs replicated, output image sharded by rows.
No collectives ride inside the blend — one `psum` per loss/grad reduction.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P
from jax import shard_map

from seganygaussians_tpu.ops import blend as blend_xla
from seganygaussians_tpu.ops.camera import CameraParams
from seganygaussians_tpu.ops.projection import Preprocessed, preprocess
from seganygaussians_tpu.ops.rasterize import RasterConfig


def clip_to_tile_rows(prep: Preprocessed, row_lo, row_hi) -> Preprocessed:
    """Intersect every Gaussian's tile rect with tile rows [row_lo, row_hi).

    Returned rects are in LOCAL coordinates (row_lo maps to 0) with
    ``tiles_touched`` recounted; Gaussians missing the slab get 0 tiles."""
    y0 = jnp.maximum(prep.rect_min[:, 1], row_lo) - row_lo
    y1 = jnp.minimum(prep.rect_max[:, 1], row_hi) - row_lo
    h = jnp.maximum(y1 - y0, 0)
    w = jnp.maximum(prep.rect_max[:, 0] - prep.rect_min[:, 0], 0)
    touched = jnp.where(prep.valid, w * h, 0)
    rect_min = jnp.stack([prep.rect_min[:, 0], jnp.maximum(y0, 0)], axis=-1)
    rect_max = jnp.stack([prep.rect_max[:, 0], jnp.maximum(y1, 0)], axis=-1)
    # row_pack is indexed by absolute tile row — stale after the slab shift;
    # the recounted tiles_touched is rect-based, so drop the row data.
    return prep._replace(
        rect_min=rect_min,
        rect_max=rect_max,
        tiles_touched=touched,
        valid=prep.valid & (h > 0),
        row_pack=None,
    )


def _slab_blend(prep_local, fields_builder, bg_full, grid_x, rows_local,
                config: RasterConfig, backend: str):
    """Blend one device's slab: local binning + blend on the clipped prep."""
    capacity = config.capacity
    if backend == "pallas":
        from seganygaussians_tpu.ops import blend_pallas
        from seganygaussians_tpu.ops.binning import expand_slots

        plan = expand_slots(prep_local, grid_x, rows_local, capacity)
        fields = fields_builder(plan.depth_perm)
        out = blend_pallas.blend_fused(
            plan.slot_rank, plan.slot_tile, fields, bg_full,
            grid_x, rows_local, config.tile_size,
        )
        return out, plan.overflow
    from seganygaussians_tpu.ops.binning import bin_gaussians

    binned = bin_gaussians(prep_local, grid_x, rows_local, capacity)
    perm = binned.depth_perm
    fields = fields_builder(perm)
    means2d_d = jnp.stack([fields[0], fields[1]], axis=-1)
    conics_d = jnp.stack([fields[2], fields[3], fields[4]], axis=-1)
    opac_d = fields[5]
    colors_d = jnp.stack(fields[6:], axis=-1)
    out = blend_xla.blend(
        binned.gauss_id, binned.tile_id, binned.tile_starts,
        means2d_d, conics_d, opac_d, colors_d, bg_full,
        grid_x, rows_local, config.tile_size,
    )
    return out, binned.overflow


def make_tile_sharded_render(
    mesh: Mesh,
    axis: str,
    camera: CameraParams,
    config: RasterConfig = RasterConfig(),
    backend: str = "xla",
):
    """Build a jitted tile-row-sharded differentiable render.

    Returns ``render(means3d, opacities, colors, scales, rotations, bg)``
    → (H, W, C) image sharded by rows over ``axis``.  The tile grid's rows
    are padded up to a multiple of the axis size; every device owns
    ``rows_local = grid_y_pad / D`` rows.
    """
    ndev = mesh.shape[axis]
    ts = config.tile_size
    grid_x = (camera.width + ts - 1) // ts
    grid_y = (camera.height + ts - 1) // ts
    grid_y_pad = ((grid_y + ndev - 1) // ndev) * ndev
    rows_local = grid_y_pad // ndev

    def render(means3d, opacities, colors, scales, rotations, bg):
        def per_device(means3d, opacities, colors, scales, rotations, bg):
            d = lax.axis_index(axis)
            row_lo = d * rows_local
            row_hi = row_lo + rows_local
            prep = preprocess(
                means3d, camera, scales=scales, rotations=rotations,
                tile_size=ts, opacities=opacities,
            )
            prep_local = clip_to_tile_rows(prep, row_lo, row_hi)

            c = colors.shape[-1]
            bg_full = bg

            def fields_builder(perm):
                m2 = prep.means2d[perm]
                co = prep.conics[perm]
                # Slab-local pixel coordinates: the local tile grid starts at
                # pixel row row_lo·ts (conics are translation-invariant).
                y_local = m2[:, 1] - (row_lo * ts).astype(m2.dtype)
                return (
                    m2[:, 0], y_local, co[:, 0], co[:, 1], co[:, 2],
                    opacities[perm],
                ) + tuple(colors[perm][:, i] for i in range(c))

            out, overflow = _slab_blend(
                prep_local, fields_builder, bg_full, grid_x, rows_local,
                config, backend,
            )
            # Local slab image: (rows_local*ts, grid_x*ts, C) — full width,
            # this device's rows (height cropping happens after stacking).
            img_local = blend_xla.tiles_to_image(
                out.tiles, grid_x, rows_local, ts,
                grid_x * ts, rows_local * ts,
            )
            return img_local, overflow.reshape(1)

        img, overflow = shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P()),
            out_specs=(P(axis, None, None), P(axis)),
            check_vma=False,
        )(means3d, opacities, colors, scales, rotations, bg)
        return img[: camera.height, : camera.width], jnp.any(overflow)

    return render


def make_tile_sharded_loss_grad(
    mesh: Mesh,
    axis: str,
    camera: CameraParams,
    config: RasterConfig = RasterConfig(),
    backend: str = "xla",
):
    """Differentiable slab loss: Σ_devices ℓ(slab) with exact replicated
    parameter gradients.

    The VJP runs INSIDE the shard_map body (each device backprops its own
    slab; loss and gradients `psum` over the axis).  This is
    shard-map-of-grad, not grad-of-shard-map — besides being the idiomatic
    data-parallel structure (`parallel/data_parallel.py`), it sidesteps a
    mis-transposition we measured when differentiating *through* shard_map
    with replicated in_specs (grad 100-1000x off for footprint-clipped
    Gaussians; shard_map-of-grad matches the single-device gradient to
    fp exactness — see tests/test_parallel.py tile-sharded tests)."""
    ndev = mesh.shape[axis]
    ts = config.tile_size
    grid_x = (camera.width + ts - 1) // ts
    grid_y = (camera.height + ts - 1) // ts
    grid_y_pad = ((grid_y + ndev - 1) // ndev) * ndev
    rows_local = grid_y_pad // ndev
    h_pad = grid_y_pad * ts

    def step(means3d, opacities, colors, scales, rotations, bg, gt):
        # Pad gt to the padded tile grid so it shards evenly by slab.
        gt_pad = jnp.zeros((h_pad, camera.width, gt.shape[-1]), gt.dtype)
        gt_pad = gt_pad.at[: camera.height].set(gt)
        denom = jnp.float32(camera.height * camera.width * gt.shape[-1])

        def per_device(means3d, opacities, colors, scales, rotations, bg, gt_slab):
            d = lax.axis_index(axis)
            row_lo = d * rows_local

            def local_loss(means3d, opacities, colors, scales, rotations):
                prep = preprocess(
                    means3d, camera, scales=scales, rotations=rotations,
                    tile_size=ts, opacities=opacities,
                )
                prep_local = clip_to_tile_rows(prep, row_lo, row_lo + rows_local)
                c = colors.shape[-1]

                def fields_builder(perm):
                    m2 = prep.means2d[perm]
                    co = prep.conics[perm]
                    y_local = m2[:, 1] - (row_lo * ts).astype(m2.dtype)
                    return (
                        m2[:, 0], y_local, co[:, 0], co[:, 1], co[:, 2],
                        opacities[perm],
                    ) + tuple(colors[perm][:, i] for i in range(c))

                out, overflow = _slab_blend(
                    prep_local, fields_builder, bg, grid_x, rows_local,
                    config, backend,
                )
                img_local = blend_xla.tiles_to_image(
                    out.tiles, grid_x, rows_local, ts,
                    camera.width, rows_local * ts,
                )
                # Rows past the true image height carry zero gt and a
                # zero mask, so padded slabs contribute nothing.
                row0 = row_lo * ts
                valid = (
                    lax.broadcasted_iota(jnp.int32, (rows_local * ts, 1, 1), 0)
                    + row0 < camera.height
                )
                l = jnp.sum(jnp.abs(img_local - gt_slab) * valid) / denom
                return l, overflow

            (l, overflow), grads = jax.value_and_grad(
                local_loss, argnums=(0, 1, 2, 3, 4), has_aux=True
            )(means3d, opacities, colors, scales, rotations)
            l = lax.psum(l, axis)
            grads = jax.tree.map(lambda g: lax.psum(g, axis), grads)
            return l, grads, overflow.reshape(1)

        loss, grads, overflow = shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(), P(axis, None, None)),
            out_specs=(P(), (P(), P(), P(), P(), P()), P(axis)),
            check_vma=False,
        )(means3d, opacities, colors, scales, rotations, bg, gt_pad)
        return (loss, jnp.any(overflow)), grads

    return jax.jit(step)
