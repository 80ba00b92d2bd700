"""Public differentiable rasterization API (the TPU analogue of the three
CUDA extensions `diff-gaussian-rasterization{,-depth,_contrastive_f}`).

One kernel family covers all reference variants (SURVEY.md §7 step 5): the
channel dimension is a static parameter, so
  * RGB rendering           → C = 3 (SH-evaluated or precomputed colors)
  * depth / mask rendering  → extra alpha-composited channels appended
  * 32-dim affinity features→ C = 32 precomputed "colors"
are all the same compiled program shape.  Pipeline:

  preprocess (projection.py)  — vectorized per-Gaussian math
  binning    (binning.py)     — gather-expansion + lax.sort by (tile, depth)
  blend      (blend.py / blend_pallas.py) — cumulative-transmittance compositing

Gradients: everything is jnp, so ``jax.grad`` works end-to-end (the Pallas
blend carries a custom VJP).  The reference's screenspace-points trick
(`gaussian_renderer/__init__.py:26-30`: a zero tensor whose .grad carries the
2D-mean gradient for densification) becomes an explicit ``ndc_offset`` input:
pass zeros, differentiate w.r.t. it, and you get the same NDC-space gradient
the densifier thresholds on.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp

from seganygaussians_tpu.ops import blend as blend_xla
from seganygaussians_tpu.ops.binning import bin_gaussians
from seganygaussians_tpu.ops.camera import CameraParams
from seganygaussians_tpu.ops.projection import preprocess
from seganygaussians_tpu.ops.sh import eval_sh_color


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    tile_size: int = 16  # BLOCK_X/BLOCK_Y (`config.h:16-17`)
    capacity: int = 1 << 18  # static instance budget (tile-overlap count)
    backend: str = "auto"  # "xla" | "pallas" | "auto" (pallas on TPU)
    scale_modifier: float = 1.0
    # Elliptical per-tile-row footprints: fewer instances (exact output) but
    # a costlier two-level expansion — measured net-negative at bench shapes
    # on TPU v5e (ops/projection.py note); opt-in for anisotropic scenes.
    row_footprints: bool = False


class RasterOutput(NamedTuple):
    color: jnp.ndarray  # (H, W, C)
    extra: Optional[jnp.ndarray]  # (H, W, E) alpha-composited extra channels
    final_t: jnp.ndarray  # (H, W)
    n_contrib: jnp.ndarray  # (H, W) int32
    radii: jnp.ndarray  # (N,) int32 (0 ⇒ culled; the visibility filter)
    overflow: jnp.ndarray  # () bool — instance capacity exceeded


def _select_backend(backend: str) -> str:
    if backend != "auto":
        return backend
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "xla"


def rasterize(
    means3d: jnp.ndarray,  # (N, 3)
    opacities: jnp.ndarray,  # (N,) activated
    camera: CameraParams,
    colors: Optional[jnp.ndarray] = None,  # (N, C) precomputed
    shs: Optional[jnp.ndarray] = None,  # (N, 3, (deg+1)**2)
    sh_degree: int = 0,
    scales: Optional[jnp.ndarray] = None,  # (N, 3) activated
    rotations: Optional[jnp.ndarray] = None,  # (N, 4) normalized quats
    cov3d_precomp: Optional[jnp.ndarray] = None,  # (N, 6)
    extra: Optional[jnp.ndarray] = None,  # (N, E) extra blend channels
    with_depth: bool = False,
    bg: Optional[jnp.ndarray] = None,
    ndc_offset: Optional[jnp.ndarray] = None,  # (N, 2) zeros; grad target
    active_mask: Optional[jnp.ndarray] = None,  # (N,) bool; False ⇒ culled
    config: RasterConfig = RasterConfig(),
) -> RasterOutput:
    """Differentiable tile rasterization of 3D Gaussians.

    Exactly one of ``colors`` / ``shs`` must be given.  ``extra`` channels are
    alpha-composited with zero background (this is how the depth/mask variant
    folds into the same kernel: depth = Σ dᵢ·αᵢ·Tᵢ, mask = Σ mᵢ·αᵢ·Tᵢ —
    `diff-gaussian-rasterization-depth/cuda_rasterizer/forward.cu`).
    """
    assert (colors is None) != (shs is None), "provide exactly one of colors/shs"

    prep = preprocess(
        means3d,
        camera,
        scales=scales,
        rotations=rotations,
        cov3d_precomp=cov3d_precomp,
        scale_modifier=config.scale_modifier,
        tile_size=config.tile_size,
        active_mask=active_mask,
        opacities=opacities,  # exact α ≥ 1/255 footprint culling
        row_footprints=config.row_footprints,
    )

    means2d = prep.means2d
    if ndc_offset is not None:
        # ndc2Pix is affine: pix(ndc + δ) = pix(ndc) + δ·S/2.
        scale_vec = jnp.array(
            [camera.width * 0.5, camera.height * 0.5], dtype=means2d.dtype
        )
        means2d = means2d + ndc_offset * scale_vec

    if colors is None:
        colors = eval_sh_color(sh_degree, shs, means3d, camera.cam_center)

    channels = [colors]
    if with_depth:
        channels.append(prep.depths[:, None])
    if extra is not None:
        channels.append(extra)
    all_colors = jnp.concatenate(channels, axis=-1) if len(channels) > 1 else colors

    c_rgb = colors.shape[-1]
    if bg is None:
        bg = jnp.zeros((c_rgb,), dtype=jnp.float32)
    bg_full = jnp.concatenate(
        [bg, jnp.zeros((all_colors.shape[-1] - c_rgb,), dtype=bg.dtype)]
    )

    grid_x = (camera.width + config.tile_size - 1) // config.tile_size
    grid_y = (camera.height + config.tile_size - 1) // config.tile_size

    backend = _select_backend(config.backend)
    if backend in ("pallas", "pallas_sortfree"):
        from seganygaussians_tpu.ops import blend_pallas

        if backend == "pallas_sortfree":
            # Analytic (tile, depth) destinations (binning.plan_instances).
            # Measured SLOWER than the fused sort on TPU v5e (BASELINE.md
            # round-4 profile: XLA gathers/scatters at instance scale are
            # the worst primitives; lax.sort moves payloads fastest) — kept
            # as an option for future backends where gathers are cheap.
            from seganygaussians_tpu.ops.binning import plan_instances

            plan = plan_instances(prep, grid_x, grid_y, config.capacity)
        else:
            from seganygaussians_tpu.ops.binning import expand_slots

            plan = expand_slots(prep, grid_x, grid_y, config.capacity)
        perm = plan.depth_perm
        means2d_d = means2d[perm]
        conics_d = prep.conics[perm]
        opacities_d = opacities[perm]
        colors_d = all_colors[perm]
        fields = (
            means2d_d[:, 0],
            means2d_d[:, 1],
            conics_d[:, 0],
            conics_d[:, 1],
            conics_d[:, 2],
            opacities_d,
        ) + tuple(colors_d[:, i] for i in range(all_colors.shape[-1]))
        if backend == "pallas_sortfree":
            out = blend_pallas.blend_sortfree(
                plan.sorted_gauss, plan.tile_starts, fields, bg_full,
                grid_x, grid_y, config.tile_size,
            )
        else:
            out = blend_pallas.blend_fused(
                plan.slot_rank, plan.slot_tile, fields, bg_full,
                grid_x, grid_y, config.tile_size,
            )
        overflow = plan.overflow
    else:
        binned = bin_gaussians(prep, grid_x, grid_y, config.capacity)

        # Blend consumes *depth-sorted* per-Gaussian fields (binned.gauss_id
        # holds depth ranks).  The N-sized reorder gathers are cheap and
        # differentiable.
        perm = binned.depth_perm
        means2d_d = means2d[perm]
        conics_d = prep.conics[perm]
        opacities_d = opacities[perm]
        colors_d = all_colors[perm]
        out = blend_xla.blend(
            binned.gauss_id,
            binned.tile_id,
            binned.tile_starts,
            means2d_d,
            conics_d,
            opacities_d,
            colors_d,
            bg_full,
            grid_x,
            grid_y,
            config.tile_size,
        )
        overflow = binned.overflow

    img = blend_xla.tiles_to_image(
        out.tiles, grid_x, grid_y, config.tile_size, camera.width, camera.height
    )
    final_t = blend_xla.tiles_to_image(
        out.final_t[:, :, None], grid_x, grid_y, config.tile_size, camera.width, camera.height
    )[..., 0]
    n_contrib = blend_xla.tiles_to_image(
        out.n_contrib[:, :, None], grid_x, grid_y, config.tile_size, camera.width, camera.height
    )[..., 0]

    color_img = img[..., :c_rgb]
    extra_img = img[..., c_rgb:] if all_colors.shape[-1] > c_rgb else None

    return RasterOutput(
        color=color_img,
        extra=extra_img,
        final_t=final_t,
        n_contrib=n_contrib,
        radii=prep.radii,
        overflow=overflow,
    )
