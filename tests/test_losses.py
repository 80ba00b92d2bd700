"""Loss parity tests vs a torch re-derivation of the reference formulas."""

import numpy as np
import jax.numpy as jnp
import pytest

from seganygaussians_tpu.ops import losses


def torch_ssim_reference(img1, img2, window_size=11):
    """Reference SSIM (`utils/loss_utils.py:19-63`) re-derived in torch:
    2D gaussian window conv with SAME padding, per-channel groups."""
    import torch
    import torch.nn.functional as F

    def gaussian(ws, sigma):
        xs = torch.arange(ws, dtype=torch.float32) - ws // 2
        g = torch.exp(-(xs**2) / (2 * sigma**2))
        return g / g.sum()

    c = img1.shape[0]
    _1d = gaussian(window_size, 1.5).unsqueeze(1)
    window = _1d.mm(_1d.t()).unsqueeze(0).unsqueeze(0).expand(c, 1, window_size, window_size)
    i1 = torch.tensor(img1).unsqueeze(0)
    i2 = torch.tensor(img2).unsqueeze(0)
    pad = window_size // 2
    mu1 = F.conv2d(i1, window, padding=pad, groups=c)
    mu2 = F.conv2d(i2, window, padding=pad, groups=c)
    mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
    s1 = F.conv2d(i1 * i1, window, padding=pad, groups=c) - mu1_sq
    s2 = F.conv2d(i2 * i2, window, padding=pad, groups=c) - mu2_sq
    s12 = F.conv2d(i1 * i2, window, padding=pad, groups=c) - mu12
    C1, C2 = 0.01**2, 0.03**2
    m = ((2 * mu12 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return float(m.mean())


def test_ssim_parity(rng):
    pytest.importorskip("torch")
    a = rng.uniform(size=(3, 24, 32)).astype(np.float32)  # CHW for torch
    b = np.clip(a + rng.normal(scale=0.05, size=a.shape), 0, 1).astype(np.float32)
    want = torch_ssim_reference(a, b)
    got = float(losses.ssim(jnp.asarray(a.transpose(1, 2, 0)), jnp.asarray(b.transpose(1, 2, 0))))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ssim_identity(rng):
    a = rng.uniform(size=(16, 16, 3)).astype(np.float32)
    assert float(losses.ssim(jnp.asarray(a), jnp.asarray(a))) == pytest.approx(1.0, abs=1e-5)


def test_l1_psnr(rng):
    a = rng.uniform(size=(8, 8, 3)).astype(np.float32)
    b = rng.uniform(size=(8, 8, 3)).astype(np.float32)
    np.testing.assert_allclose(float(losses.l1_loss(a, b)), np.abs(a - b).mean(), rtol=1e-6)
    m = ((a - b) ** 2).mean()
    np.testing.assert_allclose(float(losses.psnr(a, b)), 20 * np.log10(1 / np.sqrt(m)), rtol=1e-5)


def test_lpips_optional_guard():
    """LPIPS is an optional dependency: availability probe is truthful and
    the entry point raises an actionable ImportError when it is missing."""
    from seganygaussians_tpu.utils import lpips_metric

    a = np.zeros((8, 8, 3), np.float32)
    if lpips_metric.lpips_available():
        v = lpips_metric.lpips(a, a)
        assert v == pytest.approx(0.0, abs=1e-5)
    else:
        with pytest.raises(ImportError, match="lpips"):
            lpips_metric.lpips(a, a)
