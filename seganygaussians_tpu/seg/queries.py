"""Similarity queries + 3D segmentation from prompts.

Parity targets: `saga_gui.py:596-688` (click similarity, scale-gated
segment3d) and `prompt_segmenting.ipynb` cells 12-31 (point-prompt masks,
similarity thresholds 0.75/0.85), plus the feature PCA preview
(`saga_gui.py:547-569`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from seganygaussians_tpu.seg.scale_gate import ScaleGateParams, apply_scale_gate


def _normalize(x, eps=1e-9):
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(eps)


def gate_features(
    features: jnp.ndarray,  # (N, D) raw affinity features
    gate_params: ScaleGateParams,
    scale: jnp.ndarray,  # () quantile-normalised scale in [0, 1]
) -> jnp.ndarray:
    """Scale-condition features: f ⊙ gate(scale), L2-normalised
    (`saga_gui.py:596-612`)."""
    gates = apply_scale_gate(gate_params, scale.reshape(1, 1))[0]  # (D,)
    return _normalize(features * gates[None, :])


def click_similarity(
    feature_map: jnp.ndarray,  # (H, W, D) rendered (gated+normalised) features
    xy: tuple[int, int],  # click pixel (x, y)
) -> jnp.ndarray:
    """Per-pixel cosine score map against the clicked pixel's feature
    (`saga_gui.py:630-653`)."""
    chosen = feature_map[xy[1], xy[0]]  # (D,)
    return jnp.einsum("hwc,c->hw", feature_map, chosen)


def similarity_to_prompts(
    gated_gaussian_features: jnp.ndarray,  # (N, D) normalised
    prompt_features: jnp.ndarray,  # (P, D) normalised query vectors
) -> jnp.ndarray:
    """(N,) max cosine similarity to any prompt (notebook cell 24)."""
    sims = gated_gaussian_features @ prompt_features.T  # (N, P)
    return jnp.max(sims, axis=-1)


def segment3d(
    gaussian_features: jnp.ndarray,  # (N, D) raw per-Gaussian features
    gate_params: ScaleGateParams,
    scale: jnp.ndarray,
    prompt_features: jnp.ndarray,  # (P, D) — e.g. clicked-pixel features
    threshold: float = 0.75,
    alive: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(N,) bool 3D mask: scale-gated per-Gaussian similarity > threshold
    (`saga_gui.py:662-688`; notebook threshold 0.75, language path 0.85)."""
    gated = gate_features(gaussian_features, gate_params, scale)
    prompts = _normalize(prompt_features)
    score = similarity_to_prompts(gated, prompts)
    mask = score > threshold
    if alive is not None:
        if alive.shape[0] > mask.shape[0]:
            # Feature field holds exactly N rows; the scene state is
            # capacity-padded (live rows first after from_dense) — pad the
            # similarity mask so the AND broadcasts over capacity.
            mask = jnp.pad(mask, (0, alive.shape[0] - mask.shape[0]))
        mask = mask & alive
    return mask


def feature_pca(
    features: jnp.ndarray,  # (N, D)
    n_components: int = 3,
    key: Optional[jax.Array] = None,
    sample: int = 10_000,
) -> jnp.ndarray:
    """PCA projection matrix (D, 3) for feature visualisation
    (`saga_gui.py:547-569` computes torch PCA on a random subset)."""
    n = features.shape[0]
    if key is not None and n > sample:
        idx = jax.random.choice(key, n, (sample,), replace=False)
        x = features[idx]
    else:
        x = features
    x = x - jnp.mean(x, axis=0, keepdims=True)
    # SVD of the (S, D) matrix; right singular vectors = principal axes
    _, _, vt = jnp.linalg.svd(x, full_matrices=False)
    return vt[:n_components].T  # (D, 3)


def apply_pca(feature_map: jnp.ndarray, proj: jnp.ndarray) -> jnp.ndarray:
    """(..., D) → (..., 3) normalised to [0,1] per channel for display."""
    y = feature_map @ proj
    lo = jnp.min(y.reshape(-1, y.shape[-1]), axis=0)
    hi = jnp.max(y.reshape(-1, y.shape[-1]), axis=0)
    return (y - lo) / jnp.maximum(hi - lo, 1e-9)
