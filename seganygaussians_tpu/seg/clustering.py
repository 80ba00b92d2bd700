"""Vectorized XLA clustering — HDBSCAN/kmeans replacement.

The reference clusters affinity features with CPU hdbscan (GUI
`saga_gui.py:518-544`, notebook cells 18-21/33-39) — acknowledged slow
("may take a while", `README.md:126`).  BASELINE.json explicitly allows a
vectorized XLA k-means replacement; this module provides:

* ``kmeans``        — cosine/Euclidean Lloyd iterations with k-means++ init,
                      all matmul/argmin (MXU-friendly).
* ``density_filter``— post-pass labelling points whose assignment similarity
                      is below a quantile threshold as noise (-1), mimicking
                      HDBSCAN's noise behaviour that SAGA relies on.
* ``cluster_features`` — the GUI's end-to-end recipe: subsample → cluster →
                      return normalised cluster centers for seg_score einsums
                      (`saga_gui.py:529-544`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class KMeansResult(NamedTuple):
    centers: jnp.ndarray  # (K, D)
    labels: jnp.ndarray  # (N,) int32; -1 = noise after density_filter
    similarity: jnp.ndarray  # (N,) assignment score (cos sim or -dist)


def _kmeanspp_init(key, x, k, cosine):
    n = x.shape[0]
    idx0 = jax.random.randint(key, (), 0, n)
    centers0 = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(x[idx0])

    def body(i, carry):
        centers, key = carry
        key, sub = jax.random.split(key)
        if cosine:
            sim = x @ centers.T  # (N, K)
        else:
            sim = -jnp.sum(
                (x[:, None, :] - centers[None, :, :]) ** 2, axis=-1
            )
        active = jnp.arange(k) < i
        best = jnp.max(jnp.where(active[None, :], sim, -jnp.inf), axis=1)
        d2 = jnp.maximum(1.0 - best if cosine else -best, 1e-9)
        p = d2 / jnp.sum(d2)
        nxt = jax.random.choice(sub, x.shape[0], p=p)
        return centers.at[i].set(x[nxt]), key

    centers, _ = jax.lax.fori_loop(1, k, body, (centers0, key))
    return centers


@functools.partial(jax.jit, static_argnames=("k", "iters", "cosine"))
def kmeans(
    key: jax.Array,
    x: jnp.ndarray,  # (N, D)
    k: int,
    iters: int = 20,
    cosine: bool = True,
) -> KMeansResult:
    """Lloyd's k-means. ``cosine=True`` normalises inputs and centers each
    round (spherical k-means) — the right metric for SAGA's L2-normalised
    affinity features."""
    if cosine:
        x = x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-9)
    centers = _kmeanspp_init(key, x, k, cosine)

    def step(_, centers):
        if cosine:
            sim = x @ centers.T
        else:
            sim = -jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
        labels = jnp.argmax(sim, axis=1)
        onehot = jax.nn.one_hot(labels, k, dtype=x.dtype)  # (N, K)
        sums = onehot.T @ x  # (K, D)
        counts = jnp.sum(onehot, axis=0)[:, None]
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), centers)
        if cosine:
            new = new / jnp.linalg.norm(new, axis=-1, keepdims=True).clip(1e-9)
        return new

    centers = jax.lax.fori_loop(0, iters, step, centers)
    sim = x @ centers.T if cosine else -jnp.sum(
        (x[:, None, :] - centers[None, :, :]) ** 2, axis=-1
    )
    labels = jnp.argmax(sim, axis=1).astype(jnp.int32)
    best = jnp.max(sim, axis=1)
    return KMeansResult(centers=centers, labels=labels, similarity=best)


def density_filter(
    result: KMeansResult, noise_quantile: float = 0.1
) -> KMeansResult:
    """Mark the lowest-similarity ``noise_quantile`` of points as noise (-1),
    approximating HDBSCAN's noise label that the GUI's seg_score path skips."""
    thresh = jnp.quantile(result.similarity, noise_quantile)
    labels = jnp.where(result.similarity < thresh, -1, result.labels)
    return result._replace(labels=labels.astype(jnp.int32))


def cluster_features(
    key: jax.Array,
    features: jnp.ndarray,  # (N, D) scale-gated affinity features
    k: int = 32,
    sample_rate: float = 0.02,
    iters: int = 20,
) -> jnp.ndarray:
    """GUI clustering recipe (`saga_gui.py:518-544`): subsample ~2% of the
    points, spherical-cluster them, return L2-normalised cluster centers.
    seg_score is then `einsum('nc,bc->bn', centers, features)`."""
    n = features.shape[0]
    m = max(k, int(n * sample_rate))
    k1, k2 = jax.random.split(key)
    idx = jax.random.choice(k1, n, (m,), replace=False)
    res = kmeans(k2, features[idx], k, iters=iters, cosine=True)
    return res.centers
