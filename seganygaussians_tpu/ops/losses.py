"""Image losses: L1, windowed SSIM, PSNR, MSE.

Parity targets: `utils/loss_utils.py:17-63` (l1, ssim with an 11-tap gaussian
window, σ=1.5, C1=0.01², C2=0.03²) and `utils/image_utils.py:14-19`.
Implemented channels-last on (H, W, C); the SSIM window convolution is a
depthwise conv XLA maps to fused VPU loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - gt))


def mse(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - gt) ** 2)


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """`utils/image_utils.py:17-19` (per-image MSE → 20 log10(1/√mse))."""
    m = jnp.mean((pred - gt) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(m))


@functools.partial(jax.jit, static_argnames=("window_size",))
def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(window_size, dtype=jnp.float32) - window_size // 2
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def _depthwise_blur(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise 2D blur of (H, W, C) with SAME padding."""
    c = img.shape[-1]
    k = window.shape[0]
    x = img[None].transpose(0, 3, 1, 2)  # (1, C, H, W)
    kh = jnp.tile(window.reshape(1, 1, k, 1), (c, 1, 1, 1))
    kw = jnp.tile(window.reshape(1, 1, 1, k), (c, 1, 1, 1))
    dn = lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    # precision=HIGHEST is load-bearing on TPU: at default precision the MXU
    # rounds conv inputs to bf16, and SSIM's variance terms
    # blur(img²) − mu² cancel catastrophically — the bf16 rounding noise
    # (~4e-3 relative) exceeds the variance signal, corrupting the SSIM
    # value AND its gradient.  Measured: scene training on real TPU
    # plateaued at loss ≈ 0.16 (CPU: 0.03) until this fix.
    x = lax.conv_general_dilated(
        x, kh, (1, 1), "SAME", dimension_numbers=dn, feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )
    x = lax.conv_general_dilated(
        x, kw, (1, 1), "SAME", dimension_numbers=dn, feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )
    return x.transpose(0, 2, 3, 1)[0]


def ssim(
    img1: jnp.ndarray,  # (H, W, C) in [0, 1]
    img2: jnp.ndarray,
    window_size: int = 11,
) -> jnp.ndarray:
    """Mean SSIM, matching `utils/loss_utils.py:33-63` (gaussian window,
    C1=0.01², C2=0.03²)."""
    window = _gaussian_window(window_size)
    mu1 = _depthwise_blur(img1, window)
    mu2 = _depthwise_blur(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_blur(img1 * img1, window) - mu1_sq
    sigma2_sq = _depthwise_blur(img2 * img2, window) - mu2_sq
    sigma12 = _depthwise_blur(img1 * img2, window) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)
