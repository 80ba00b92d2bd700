"""Language-driven 3D segmentation — the full SAGA flagship flow
(parity: `prompt_segmenting.ipynb` cells 41-54).

Algorithm (per the notebook):

1. Sample ~1% of per-Gaussian affinity features as 3D *anchors* (cell 41).
2. Per training view (cell 42): render the affinity feature map (normalized
   point features), 4× downsample; downsample SAM masks to match and erode
   with a 3×3 box-sum ≥ 2; gate both the anchors and the feature map by the
   mask's quantile-transformed scale; pool the gated map over each mask →
   one *mask feature* per SAM mask; its *identifier* is the bool vector of
   anchors whose gated feature matches it (cosine > 0.5).
3. Across all views (cells 43-44): distance between two masks = 1 − Jaccard
   of their identifier bit-vectors — masks of the same 3D object seen from
   different views share anchors.
4. Cluster masks over the precomputed distances (cell 45; HDBSCAN in the
   reference — replaced here with deterministic ε-graph connected components
   + min-cluster-size filtering, the allowed substitution).
5. Score every mask's CLIP embedding against the text prompt with the
   87-template bank (cells 46-47); clusters score by member mean (cell 48).
6. Keep clusters scoring > 0.45 (or the argmax); each contributes its best
   member's mask feature + that mask's scale as a query (cells 49-50).
7. Per-Gaussian similarity of scale-gated features to each query; threshold
   0.85 → 3D segmentation mask (cells 51-53).

All tensor math is jnp; only the union-find runs host-side (the mask count
is a few thousand — query-time, offline).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from seganygaussians_tpu.ops.quantile import QuantileTransform, apply_quantile_transform
from seganygaussians_tpu.seg.scale_gate import ScaleGateParams, apply_scale_gate


def _normalize(x, axis=-1, eps=1e-9):
    return x / jnp.linalg.norm(x, axis=axis, keepdims=True).clip(eps)


def erode_masks(masks: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Downsample (K, H, W) float masks to ``out_hw`` bilinearly, then keep
    pixels whose 3×3 box-sum ≥ 2 (the notebook's conv-erosion, cell 42)."""
    k = masks.shape[0]
    small = jax.image.resize(
        masks.astype(jnp.float32), (k, out_hw[0], out_hw[1]), "bilinear"
    )
    summed = jax.lax.reduce_window(
        small, 0.0, jax.lax.add, (1, 3, 3), (1, 1, 1), "SAME"
    )
    return summed >= 2.0


class ViewMaskStats(NamedTuple):
    mask_features: jnp.ndarray  # (K, C) pooled, gated, normalized
    identifiers: jnp.ndarray  # (K, A) bool anchor-match vectors


def view_mask_statistics(
    feature_map: jnp.ndarray,  # (H, W, C) rendered normalized features
    masks: jnp.ndarray,  # (K, h, w) SAM masks (any resolution)
    mask_scales: jnp.ndarray,  # (K,) raw 3D scales
    anchors: jnp.ndarray,  # (A, C) anchor point features
    gate: ScaleGateParams,
    qt: QuantileTransform,
    downsample: int = 4,
) -> ViewMaskStats:
    """One view's mask features + anchor identifiers (cell 42)."""
    h, w = feature_map.shape[0] // downsample, feature_map.shape[1] // downsample
    fmap = jax.image.resize(
        feature_map, (h, w, feature_map.shape[-1]), "bilinear"
    )  # (h, w, C)
    bin_masks = erode_masks(masks, (h, w)).astype(jnp.float32)  # (K, h, w)

    q_scales = apply_quantile_transform(qt, mask_scales).reshape(-1, 1)
    gates = apply_scale_gate(gate, q_scales)  # (K, C)

    # Gated + per-pixel-normalized feature map, separately per mask scale:
    # normalize(f(p) ⊙ g_k) pooled over the mask's pixels.
    gated_map = fmap[None] * gates[:, None, None, :]  # (K, h, w, C)
    gated_map = _normalize(gated_map)
    denom = jnp.sum(bin_masks, axis=(1, 2))[:, None] + 1e-9
    pooled = (
        jnp.einsum("khwc,khw->kc", gated_map, bin_masks) / denom
    )
    mask_features = _normalize(pooled)  # (K, C)

    gated_anchors = _normalize(
        gates[:, None, :] * anchors[None, :, :]
    )  # (K, A, C)
    identifiers = (
        jnp.einsum("kac,kc->ka", gated_anchors, mask_features) > 0.5
    )
    return ViewMaskStats(mask_features=mask_features, identifiers=identifiers)


def mask_iou_distance(identifiers: jnp.ndarray) -> jnp.ndarray:
    """(M, M) 1 − Jaccard over anchor bit-vectors (cell 44)."""
    idf = identifiers.astype(jnp.float32)
    inter = idf @ idf.T
    sizes = jnp.sum(idf, axis=-1)
    union = sizes[:, None] + sizes[None, :] - inter
    return 1.0 - inter / (union + 1e-6)


def cluster_precomputed(
    dist: np.ndarray, eps: float = 0.25, min_cluster_size: int = 30
) -> np.ndarray:
    """Deterministic clustering over a precomputed distance matrix:
    connected components of the ε-threshold graph, components smaller than
    ``min_cluster_size`` labelled −1 (noise).  Replaces the reference's
    `HDBSCAN(min_cluster_size=30, cluster_selection_epsilon=0.25,
    metric='precomputed')` (cell 45) — the allowed HDBSCAN substitution."""
    m = dist.shape[0]
    parent = np.arange(m)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    ii, jj = np.nonzero(dist <= eps)
    for a, b in zip(ii, jj):
        if a < b:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
    roots = np.array([find(a) for a in range(m)])
    labels = -np.ones(m, np.int64)
    nxt = 0
    for r in np.unique(roots):
        members = np.nonzero(roots == r)[0]
        if len(members) >= min_cluster_size:
            labels[members] = nxt
            nxt += 1
    return labels


def score_clusters(
    scores: np.ndarray, labels: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-cluster mean CLIP score (cell 48).  Returns (cluster_ids,
    cluster_scores) for real clusters (noise −1 excluded)."""
    ids = np.unique(labels)
    ids = ids[ids >= 0]
    means = np.array([scores[labels == c].mean() for c in ids]) if len(ids) else np.zeros(0)
    return ids, means


def select_queries(
    labels: np.ndarray,
    scores: np.ndarray,
    mask_features: np.ndarray,  # (M, C)
    mask_scales: np.ndarray,  # (M,) raw scales
    score_threshold: float = 0.45,
):
    """Good clusters → (query_features (G, C) normalized, query_scales (G,))
    (cells 49-50): each selected cluster contributes its best-scoring
    member's mask feature and that member's raw scale."""
    ids, cluster_scores = score_clusters(scores, labels)
    if len(ids) == 0:
        # No cluster survived min-size: every mask is its own candidate;
        # fall back to the single best-scoring mask.
        best = int(np.argmax(scores))
        f = mask_features[best]
        return (f / max(np.linalg.norm(f), 1e-9))[None], mask_scales[[best]]
    good = ids[cluster_scores > score_threshold]
    if len(good) == 0:
        good = ids[[int(np.argmax(cluster_scores))]]
    feats, scales = [], []
    for g in good:
        members = np.nonzero(labels == g)[0]
        best = members[int(np.argmax(scores[members]))]
        f = mask_features[best]
        feats.append(f / max(np.linalg.norm(f), 1e-9))
        scales.append(mask_scales[best])
    return np.stack(feats), np.asarray(scales)


def query_similarity(
    point_features: jnp.ndarray,  # (N, C) raw per-Gaussian features
    gate: ScaleGateParams,
    qt: QuantileTransform,
    query_feature: jnp.ndarray,  # (C,) normalized
    raw_scale: jnp.ndarray,  # () raw (un-transformed) scale
) -> jnp.ndarray:
    """(N,) per-Gaussian similarity at the query's scale (cell 51)."""
    q = apply_quantile_transform(qt, raw_scale.reshape(1))
    gates = apply_scale_gate(gate, q.reshape(1, 1))[0]  # (C,)
    gated = _normalize(point_features * gates[None, :])
    return gated @ query_feature


class TextSegmentResult(NamedTuple):
    mask3d: jnp.ndarray  # (N,) bool per-Gaussian
    labels: np.ndarray  # (M,) cluster labels over all masks
    scores: np.ndarray  # (M,) per-mask CLIP scores
    query_scales: np.ndarray  # (G,) selected query scales


def text_segment(
    render_feature_map,  # callable(view) -> (H, W, C) normalized feature map
    views: Sequence,  # objects with .sam_masks/.mask_scales/.clip_features
    point_features: jnp.ndarray,  # (N, C)
    gate: ScaleGateParams,
    qt: QuantileTransform,
    text_scores,  # callable(np.ndarray (M, Cc)) -> (M,) CLIP relevancy
    key: jax.Array,
    anchor_rate: float = 0.01,
    threshold: float = 0.85,
    eps: float = 0.25,
    min_cluster_size: int = 30,
    downsample: int = 4,
    alive: Optional[jnp.ndarray] = None,
) -> TextSegmentResult:
    """End-to-end language-driven 3D segmentation (cells 41-54)."""
    n = point_features.shape[0]
    # Cell 41 keeps a random ~1% of points as anchors (rand > 0.99).
    num_anchors = max(int(round(n * anchor_rate)), 8)
    idx = jax.random.choice(key, n, (min(num_anchors, n),), replace=False)
    anchors = point_features[idx]

    all_feats, all_ids, all_scales, all_clip = [], [], [], []
    for view in views:
        masks = getattr(view, "sam_masks", None)
        scales = getattr(view, "mask_scales", None)
        clip_feats = getattr(view, "clip_features", None)
        if masks is None or scales is None or clip_feats is None:
            continue
        fmap = render_feature_map(view)
        stats = view_mask_statistics(
            fmap, jnp.asarray(masks, jnp.float32), jnp.asarray(scales),
            anchors, gate, qt, downsample=downsample,
        )
        all_feats.append(np.asarray(stats.mask_features))
        all_ids.append(np.asarray(stats.identifiers))
        all_scales.append(np.asarray(scales))
        all_clip.append(np.asarray(clip_feats, np.float32))
    if not all_feats:
        raise ValueError("no view carries sam_masks + mask_scales + clip_features")

    mask_features = np.concatenate(all_feats)  # (M, C)
    identifiers = jnp.asarray(np.concatenate(all_ids))
    raw_scales = np.concatenate(all_scales)
    clip_embeds = np.concatenate(all_clip)
    clip_embeds = clip_embeds / np.linalg.norm(
        clip_embeds, axis=-1, keepdims=True
    ).clip(1e-9)

    dist = np.asarray(mask_iou_distance(identifiers))
    labels = cluster_precomputed(dist, eps=eps, min_cluster_size=min_cluster_size)
    scores = np.asarray(text_scores(clip_embeds)).reshape(-1)

    q_feats, q_scales = select_queries(labels, scores, mask_features, raw_scales)

    sims = []
    for f, s in zip(q_feats, q_scales):
        sims.append(
            query_similarity(
                point_features, gate, qt, jnp.asarray(f), jnp.asarray(s)
            )
        )
    sim = jnp.max(jnp.stack(sims), axis=0)
    mask3d = sim > threshold
    if alive is not None:
        if alive.shape[0] > mask3d.shape[0]:
            mask3d = jnp.pad(mask3d, (0, alive.shape[0] - mask3d.shape[0]))
        mask3d = mask3d & alive
    return TextSegmentResult(
        mask3d=mask3d, labels=labels, scores=scores, query_scales=q_scales
    )
