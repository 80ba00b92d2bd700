"""Empirical quantile transform (sklearn QuantileTransformer replacement).

The reference normalises SAM-mask 3D scales with sklearn's
``QuantileTransformer(output_distribution="uniform")`` fitted on all training
scales (`train_contrastive_feature.py:42-62,120-130`) — a CPU sklearn call in
the hot path.  Here: fit = take ``n_quantiles`` evenly spaced empirical
quantiles (sorted-array gather); transform = ``jnp.interp`` against them —
pure XLA, differentiable, identical to sklearn's linear-interpolation
behaviour away from ties.  Same transform is used by the GUI and the
prompt-segmentation pipeline (`saga_gui.py`, `prompt_segmenting.ipynb`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax.scipy.special import ndtri


class QuantileTransform(NamedTuple):
    quantiles: jnp.ndarray  # (Q,) ascending reference values
    normal: jnp.ndarray  # () bool — True ⇒ gaussian output distribution


def fit_quantile_transform(
    values: jnp.ndarray, n_quantiles: int = 1000, output: str = "uniform"
) -> QuantileTransform:
    v = jnp.sort(values.reshape(-1))
    n = v.shape[0]
    q = max(2, min(n_quantiles, n))
    pos = jnp.linspace(0.0, 1.0, q) * (n - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo
    quantiles = v[lo] * (1 - frac) + v[hi] * frac
    return QuantileTransform(
        quantiles=quantiles, normal=jnp.asarray(output == "normal")
    )


def apply_quantile_transform(qt: QuantileTransform, x: jnp.ndarray) -> jnp.ndarray:
    q = qt.quantiles.shape[0]
    refs = jnp.linspace(0.0, 1.0, q)
    u = jnp.interp(x.reshape(-1), qt.quantiles, refs).reshape(x.shape)
    eps = 1e-7
    return jnp.where(qt.normal, ndtri(jnp.clip(u, eps, 1 - eps)), u)
