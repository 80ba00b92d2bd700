"""High-level render API — parity with `gaussian_renderer/__init__.py`.

The reference exposes four free functions (`render`, `render_mask`,
`render_with_depth`, `render_contrastive_feature`, at
`gaussian_renderer/__init__.py:18,108,194,300`), each binding a different CUDA
extension.  Here they are thin jittable wrappers over ONE rasterizer
(`ops/rasterize.py`) — depth/mask are extra alpha-composited channels and the
32-dim feature path is just C=32 — mirroring that the reference's three
extensions are one kernel recompiled (SURVEY.md §2.1).

Instead of the reference's dummy ``screenspace_points`` tensor whose ``.grad``
carries the densification signal (`gaussian_renderer/__init__.py:26-30`), pass
``ndc_offset`` zeros and differentiate w.r.t. them.

All functions take a ``GaussianState`` (dead capacity slots are culled via
``active_mask``) and return a dict with the reference's key names.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from seganygaussians_tpu.models import gaussians as gm
from seganygaussians_tpu.ops.camera import CameraParams
from seganygaussians_tpu.ops.rasterize import RasterConfig, rasterize


def render(
    camera: CameraParams,
    state: gm.GaussianState,
    bg_color: jnp.ndarray,
    active_sh_degree: int = 0,
    scaling_modifier: float = 1.0,
    override_color: Optional[jnp.ndarray] = None,
    filtered_mask: Optional[jnp.ndarray] = None,
    ndc_offset: Optional[jnp.ndarray] = None,
    config: RasterConfig = RasterConfig(),
) -> dict:
    """RGB render (`gaussian_renderer/__init__.py:18-104`).

    ``filtered_mask`` (bool, True ⇒ exclude) zeroes opacity like `:56-59`.
    """
    p = state.params
    opacity = gm.get_opacity(p)[:, 0]
    if filtered_mask is not None:
        opacity = jnp.where(filtered_mask, 0.0, opacity)
    out = rasterize(
        p.xyz,
        opacity,
        camera,
        colors=override_color,
        shs=None if override_color is not None else gm.get_shs(p),
        sh_degree=active_sh_degree,
        scales=gm.get_scaling(p),
        rotations=gm.get_rotation(p),
        bg=bg_color,
        ndc_offset=ndc_offset,
        active_mask=state.alive,
        config=RasterConfig(
            tile_size=config.tile_size,
            capacity=config.capacity,
            backend=config.backend,
            scale_modifier=scaling_modifier,
        ),
    )
    return {
        "render": out.color,
        "visibility_filter": out.radii > 0,
        "radii": out.radii,
        "final_t": out.final_t,
        "overflow": out.overflow,
    }


def render_mask(
    camera: CameraParams,
    state: gm.GaussianState,
    bg_color: jnp.ndarray,
    scaling_modifier: float = 1.0,
    precomputed_mask: Optional[jnp.ndarray] = None,
    config: RasterConfig = RasterConfig(),
) -> dict:
    """Per-Gaussian scalar mask rendered as a 3-channel image
    (`gaussian_renderer/__init__.py:108-192`; `pc.get_mask` broadcast to RGB
    at `:151-156`)."""
    p = state.params
    m = state.seg_mask if precomputed_mask is None else precomputed_mask
    colors = jnp.broadcast_to(m[:, None], (m.shape[0], 3)).astype(jnp.float32)
    out = rasterize(
        p.xyz,
        gm.get_opacity(p)[:, 0],
        camera,
        colors=colors,
        scales=gm.get_scaling(p),
        rotations=gm.get_rotation(p),
        bg=bg_color,
        active_mask=state.alive,
        config=RasterConfig(
            tile_size=config.tile_size,
            capacity=config.capacity,
            backend=config.backend,
            scale_modifier=scaling_modifier,
        ),
    )
    return {
        "mask": out.color[..., 0],
        "visibility_filter": out.radii > 0,
        "radii": out.radii,
        "overflow": out.overflow,
    }


def render_with_depth(
    camera: CameraParams,
    state: gm.GaussianState,
    bg_color: jnp.ndarray,
    active_sh_degree: int = 0,
    scaling_modifier: float = 1.0,
    override_color: Optional[jnp.ndarray] = None,
    override_mask: Optional[jnp.ndarray] = None,
    filtered_mask: Optional[jnp.ndarray] = None,
    config: RasterConfig = RasterConfig(),
) -> dict:
    """RGB + expected depth + composited mask in one pass
    (`gaussian_renderer/__init__.py:194-297`, depth variant: D = Σ dᵢαᵢTᵢ,
    M = Σ mᵢαᵢTᵢ)."""
    p = state.params
    opacity = gm.get_opacity(p)[:, 0]
    if filtered_mask is not None:
        opacity = jnp.where(filtered_mask, 0.0, opacity)
    m = state.seg_mask if override_mask is None else override_mask
    out = rasterize(
        p.xyz,
        opacity,
        camera,
        colors=override_color,
        shs=None if override_color is not None else gm.get_shs(p),
        sh_degree=active_sh_degree,
        scales=gm.get_scaling(p),
        rotations=gm.get_rotation(p),
        extra=m[:, None].astype(jnp.float32),
        with_depth=True,
        bg=bg_color,
        active_mask=state.alive,
        config=RasterConfig(
            tile_size=config.tile_size,
            capacity=config.capacity,
            backend=config.backend,
            scale_modifier=scaling_modifier,
        ),
    )
    # channel order after color: [depth, mask]
    return {
        "render": out.color,
        "depth": out.extra[..., 0],
        "mask": out.extra[..., 1],
        "visibility_filter": out.radii > 0,
        "radii": out.radii,
        "final_t": out.final_t,
        "overflow": out.overflow,
    }


def render_features(
    camera: CameraParams,
    xyz: jnp.ndarray,  # (C, 3)
    opacity: jnp.ndarray,  # (C,) activated
    scales: jnp.ndarray,  # (C, 3) activated
    rotations: jnp.ndarray,  # (C, 4) normalized
    features: jnp.ndarray,  # (C, D) per-Gaussian feature "colors"
    alive: Optional[jnp.ndarray] = None,
    norm_point_features: bool = False,
    scaling_modifier: float = 1.0,
    config: RasterConfig = RasterConfig(),
) -> dict:
    """D-dim feature rasterization (`gaussian_renderer/__init__.py:300-383`,
    the `contrastive_f` NUM_CHANNELS=32 extension).  Feature smoothing
    (smooth_type ∈ {traditional, multi_res}) happens in the caller (the
    feature model owns the KNN map); per-point L2 normalisation (`:362-363`)
    is folded in here."""
    if norm_point_features:
        features = features / jnp.linalg.norm(features, axis=-1, keepdims=True).clip(
            1e-9
        )
    out = rasterize(
        xyz,
        opacity,
        camera,
        colors=features,
        scales=scales,
        rotations=rotations,
        bg=jnp.zeros((features.shape[-1],), jnp.float32),
        active_mask=alive,
        config=RasterConfig(
            tile_size=config.tile_size,
            capacity=config.capacity,
            backend=config.backend,
            scale_modifier=scaling_modifier,
        ),
    )
    return {
        "render": out.color,
        "visibility_filter": out.radii > 0,
        "radii": out.radii,
        "overflow": out.overflow,
    }
