"""Optional LPIPS perceptual metric (parity: `lpipsPyTorch/__init__.py:6-21`).

The reference vendors a self-contained LPIPS (alex/squeeze/vgg backbones with
learned linear calibration weights pulled from the net) but never calls it
from any script — it exists as the standard third eval metric next to
L1/PSNR.  Here it is an import-guarded optional dependency, the same pattern
as the SAM/CLIP offline-torch steps: pretrained CNN weights cannot ship with
this repo, so the metric activates only when the ``lpips`` package (or a
torch + torchvision environment for the reference-style path) is installed.

Usage:
    from seganygaussians_tpu.utils.lpips_metric import lpips, lpips_available
    if lpips_available():
        val = lpips(img_a, img_b, net_type="alex")   # (H, W, 3) in [0, 1]
"""

from __future__ import annotations

import numpy as np

_NET_CACHE: dict = {}


def lpips_available() -> bool:
    try:
        import lpips as _  # noqa: F401

        return True
    except ImportError:
        return False


def _get_net(net_type: str):
    if net_type not in _NET_CACHE:
        import lpips as lpips_pkg

        _NET_CACHE[net_type] = lpips_pkg.LPIPS(net=net_type, verbose=False)
    return _NET_CACHE[net_type]


def lpips(img0: np.ndarray, img1: np.ndarray, net_type: str = "alex") -> float:
    """LPIPS distance between two (H, W, 3) images in [0, 1].

    Matches the reference entry point (`lpipsPyTorch/__init__.py:6-21`:
    ``lpips(x, y, net_type='alex', version='0.1')`` over NCHW tensors).
    Raises ImportError with an actionable message when the optional
    dependency is missing — callers should gate on :func:`lpips_available`.
    """
    try:
        import torch
    except ImportError as e:  # pragma: no cover - torch is baked in here
        raise ImportError("LPIPS requires torch") from e
    if not lpips_available():
        raise ImportError(
            "LPIPS requires the `lpips` package (pip install lpips); it is an "
            "optional eval dependency, like the SAM/CLIP offline steps"
        )
    net = _get_net(net_type)

    def to_t(a):
        t = torch.from_numpy(np.asarray(a, np.float32)).permute(2, 0, 1)[None]
        return t * 2.0 - 1.0  # LPIPS expects [-1, 1]

    with torch.no_grad():
        return float(net(to_t(img0), to_t(img1)).item())
