"""Scale gate: 1 → feature_dim sigmoid linear gate over affinity features.

Parity: `train_contrastive_feature.py:83-91` — ``nn.Sequential(nn.Linear(1,
32), nn.Sigmoid())`` trained jointly with the features at the feature LR, and
the fixed staircase gate used when ``scale_aware_dim`` ∈ (0, 32)
(`:130,248-252`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ScaleGateParams(NamedTuple):
    w: jnp.ndarray  # (1, D)
    b: jnp.ndarray  # (D,)


def init_scale_gate(key: jax.Array, feature_dim: int = 32) -> ScaleGateParams:
    """torch Linear default init: U(-1/sqrt(in), 1/sqrt(in)) with in=1."""
    kw, kb = jax.random.split(key)
    return ScaleGateParams(
        w=jax.random.uniform(kw, (1, feature_dim), minval=-1.0, maxval=1.0),
        b=jax.random.uniform(kb, (feature_dim,), minval=-1.0, maxval=1.0),
    )


def apply_scale_gate(params: ScaleGateParams, scales: jnp.ndarray) -> jnp.ndarray:
    """scales (..., 1) → gates (..., D) in (0, 1)."""
    return jax.nn.sigmoid(scales @ params.w + params.b)


def fixed_scale_gate(scale_aware_dim: int, feature_dim: int = 32) -> jnp.ndarray:
    """Staircase gate table (`train_contrastive_feature.py:130`): row i keeps
    the first ``feature_dim - scale_aware_dim + i`` channels."""
    rows = []
    for i in range(scale_aware_dim + 1):
        keep = feature_dim - scale_aware_dim + i
        rows.append([1.0] * keep + [0.0] * (feature_dim - keep))
    return jnp.asarray(np.array(rows, np.float32))


def save_scale_gate(path: str, params: ScaleGateParams) -> None:
    """Torch-compatible state dict (`scale_gate.pt`,
    `train_contrastive_feature.py:319`) so reference GUIs can load it."""
    import torch

    torch.save(
        {
            "0.weight": torch.tensor(np.asarray(params.w).T),
            "0.bias": torch.tensor(np.asarray(params.b)),
        },
        path,
    )


def load_scale_gate(path: str) -> ScaleGateParams:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    return ScaleGateParams(
        w=jnp.asarray(np.asarray(sd["0.weight"]).T),
        b=jnp.asarray(np.asarray(sd["0.bias"])),
    )
