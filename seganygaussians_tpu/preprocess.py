"""Offline preprocessing: per-SAM-mask 3D scale extraction.

Parity: `get_scale.py:100-160` — render expected depth through the depth
rasterizer variant, back-project every pixel to camera-space 3D, erode each
upsampled mask with a 3×3 ≥5 box test, and define the mask's 3D scale as
‖2·std(points in mask)‖.  The per-mask loop becomes one masked-moment einsum
over all masks at once (std is unbiased, matching torch's default).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def backproject_depth(depth: jnp.ndarray, fovx: float, fovy: float) -> jnp.ndarray:
    """(H, W) depth → (H, W, 3) camera-space points (`get_scale.py:130-143`)."""
    h, w = depth.shape
    cx, cy = w / 2.0, h / 2.0
    fx = cx / np.tan(fovx / 2.0)
    fy = cy / np.tan(fovy / 2.0)
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    px = (xs - cx) * depth / fx
    py = (ys - cy) * depth / fy
    return jnp.stack([px, py, depth], axis=-1)


def erode_masks(masks: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Bilinear-upsample (K, h, w) masks to ``size`` then 3×3 box-erode with
    the reference's ≥5 threshold (`get_scale.py:145-152`)."""
    k = masks.shape[0]
    up = jax.image.resize(masks.astype(jnp.float32), (k,) + size, "bilinear")
    kernel = jnp.ones((1, 1, 3, 3), jnp.float32)
    conv = jax.lax.conv_general_dilated(
        up[:, None], kernel, (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0]
    return conv >= 5.0


@jax.jit
def masked_point_scales(points: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
    """(K,) ‖2·std of points under each mask‖ with unbiased std
    (`get_scale.py:154-159`), vectorised over masks."""
    k = masks.shape[0]
    m = masks.reshape(k, -1).astype(jnp.float32)  # (K, P)
    p = points.reshape(-1, 3)  # (P, 3)
    n = jnp.sum(m, axis=1, keepdims=True)  # (K, 1)
    # precision=HIGHEST: var = E[x²] − mean² cancels catastrophically if the
    # MXU rounds the moment matmuls to bf16 (same failure as the SSIM
    # variance, ops/losses.py) — these become the mask_scales sidecars.
    hi = jax.lax.Precision.HIGHEST
    mean = jnp.matmul(m, p, precision=hi) / jnp.maximum(n, 1.0)  # (K, 3)
    ex2 = jnp.matmul(m, p * p, precision=hi) / jnp.maximum(n, 1.0)
    var = (ex2 - mean * mean) * (n / jnp.maximum(n - 1.0, 1.0))
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    return jnp.linalg.norm(2.0 * std, axis=-1)


def compute_mask_scales(camera, state, sam_masks: np.ndarray, config=None):
    """Full per-view pipeline: depth render → back-project → erode → scales."""
    from seganygaussians_tpu import render as R
    from seganygaussians_tpu.ops.rasterize import RasterConfig

    config = config or RasterConfig()
    pkg = R.render_with_depth(
        camera.params, state, jnp.zeros(3, jnp.float32), config=config
    )
    depth = pkg["depth"]
    points = backproject_depth(depth, camera.fovx, camera.fovy)
    eroded = erode_masks(jnp.asarray(sam_masks), depth.shape)
    return masked_point_scales(points, eroded)
