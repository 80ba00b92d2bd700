"""32-dim affinity-feature Gaussian model (SAGA's feature field).

TPU-first re-design of ``FeatureGaussianModel`` (`scene/gaussian_model_ff.py`,
842 LoC).  Geometry (xyz/scaling/rotation/opacity) is *frozen* during
contrastive training (`load_ply_from_3dgs` keeps it fixed,
`gaussian_model_ff.py:650-686`), so the state splits into a frozen geometry
pytree and one learnable ``point_features`` array with its own Adam — no
densification machinery needed here.

Feature smoothing (`get_smoothed_point_features`, `:338-364`): mean of
L2-normalised features over the K nearest neighbours (pytorch3d
``knn_points``, which includes *self* as neighbour 0 — reproduced by
prepending the identity column to our Morton-window KNN map).  Dropout picks
one random K/2-subset of neighbour columns per call (same subset for every
point), matching the torch ``randperm(K)[:K·dropout]`` semantics.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from seganygaussians_tpu.models import optim
from seganygaussians_tpu.ops.knn import knn_map


class FrozenGeometry(NamedTuple):
    """Non-learnable geometry copied from a trained scene model (activated
    lazily like the scene model: log scales, pre-sigmoid opacity)."""

    xyz: jnp.ndarray  # (C, 3)
    scaling: jnp.ndarray  # (C, 3) log
    rotation: jnp.ndarray  # (C, 4)
    opacity: jnp.ndarray  # (C, 1) pre-sigmoid
    alive: jnp.ndarray  # (C,) bool


class FeatureState(NamedTuple):
    geom: FrozenGeometry
    point_features: jnp.ndarray  # (C, D)
    smooth_map: jnp.ndarray  # (C, K) neighbour indices incl. self at col 0
    opt: optim.AdamState  # over point_features only


def get_scaling(geom: FrozenGeometry) -> jnp.ndarray:
    return jnp.exp(geom.scaling)


def get_opacity(geom: FrozenGeometry) -> jnp.ndarray:
    return jax.nn.sigmoid(geom.opacity)


def get_rotation(geom: FrozenGeometry) -> jnp.ndarray:
    return geom.rotation / jnp.linalg.norm(
        geom.rotation, axis=-1, keepdims=True
    ).clip(1e-12)


def build_smooth_map(xyz: jnp.ndarray, k: int = 16) -> jnp.ndarray:
    """(C, K) neighbour map with self as column 0 (pytorch3d `knn_points`
    on identical query/source includes the query point itself)."""
    nbrs = knn_map(xyz, k - 1)
    return jnp.concatenate([jnp.arange(xyz.shape[0])[:, None], nbrs], axis=-1)


def from_scene_geometry(
    xyz: np.ndarray,
    scaling: np.ndarray,
    rotation: np.ndarray,
    opacity: np.ndarray,
    feature_dim: int = 32,
    target: str = "contrastive_feature",
    smooth_k: int = 16,
    seed: int = 0,
    capacity: Optional[int] = None,
) -> FeatureState:
    """`load_ply_from_3dgs` + `change_to_segmentation_mode`
    (`gaussian_model_ff.py:650-686,133-166`): geometry frozen; features init
    to randn·1e-2 (contrastive) or zeros (coarse_seg_everything)."""
    n = xyz.shape[0]
    if capacity is None:
        capacity = n
    assert n <= capacity

    def pad(a):
        a = jnp.asarray(a, jnp.float32)
        return jnp.pad(a, [(0, capacity - n)] + [(0, 0)] * (a.ndim - 1))

    geom = FrozenGeometry(
        xyz=pad(xyz),
        scaling=pad(scaling),
        rotation=pad(rotation),
        opacity=pad(opacity),
        alive=jnp.arange(capacity) < n,
    )
    if target == "contrastive_feature":
        feats = (
            jax.random.normal(jax.random.PRNGKey(seed), (capacity, feature_dim)) * 1e-2
        )
    else:
        feats = jnp.zeros((capacity, feature_dim), jnp.float32)
    # KNN over live geometry only: displace dead (zero-padded) slots far
    # outside the scene so live points near the origin never pick them as
    # neighbours, then remap dead rows to self.
    span = jnp.max(jnp.abs(geom.xyz)) + 1.0
    knn_xyz = jnp.where(geom.alive[:, None], geom.xyz, geom.xyz + 100.0 * span)
    smooth_map = build_smooth_map(knn_xyz, smooth_k)
    smooth_map = jnp.where(
        geom.alive[:, None], smooth_map, jnp.arange(capacity)[:, None]
    )
    return FeatureState(
        geom=geom,
        point_features=feats.astype(jnp.float32),
        smooth_map=smooth_map,
        opt=optim.adam_init(feats),
    )


def from_point_cloud(
    points: np.ndarray,
    feature_dim: int = 32,
    smooth_k: int = 16,
    capacity: Optional[int] = None,
) -> FeatureState:
    """``FeatureGaussianModel.create_from_pcd`` (`gaussian_model_ff.py:493-521`):
    fresh geometry from bare points — log-scales from the 3-NN mean squared
    distance, identity quats, opacity 0.1 — with zero features.  Used by the
    ``init_from_3dgs_pcd`` path (`scene/__init__.py:196-207`: init a feature
    model from a trained scene PLY's xyz only)."""
    from seganygaussians_tpu.ops.knn import mean_sq_dist_to_3nn
    from seganygaussians_tpu.ops.transforms import inverse_sigmoid

    n = points.shape[0]
    if capacity is None:
        capacity = n
    assert n <= capacity
    xyz = jnp.asarray(points, jnp.float32)
    dist2 = jnp.maximum(mean_sq_dist_to_3nn(xyz), 1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
    rots = jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (n, 1))
    opac = inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32))
    return from_scene_geometry(
        np.asarray(xyz), np.asarray(scales), np.asarray(rots), np.asarray(opac),
        feature_dim=feature_dim, target="feature", smooth_k=smooth_k,
        capacity=capacity,
    )


def smoothed_point_features(
    state: FeatureState,
    key: Optional[jax.Array] = None,
    dropout: float = 0.5,
) -> jnp.ndarray:
    """KNN-smoothed features (`gaussian_model_ff.py:338-364`): L2-normalise,
    then average over a random ⌊K·dropout⌋-subset of the K neighbour columns
    (one subset per call), or all K if dropout ∉ (0, 1)."""
    k = state.smooth_map.shape[1]
    # rsqrt(Σx²+ε) form: finite gradient even for all-zero feature rows
    normed = state.point_features * jax.lax.rsqrt(
        jnp.sum(state.point_features**2, axis=-1, keepdims=True) + 1e-12
    )
    if key is not None and 0.0 < dropout < 1.0:
        n_sel = int(k * dropout)
        cols = jax.random.permutation(key, k)[:n_sel]
        nbrs = state.smooth_map[:, cols]
    else:
        nbrs = state.smooth_map
    return jnp.mean(normed[nbrs], axis=1)


def smooth_point_features_inplace(
    state: FeatureState, smoothed_dim: int = 24
) -> FeatureState:
    """In-place neighbourhood mean of the first ``smoothed_dim`` channels
    (`gaussian_model_ff.py:322-336`)."""
    mean = jnp.mean(state.point_features[state.smooth_map], axis=1)
    feats = state.point_features.at[:, :smoothed_dim].set(mean[:, :smoothed_dim])
    return state._replace(point_features=feats)


def build_multi_res_maps(
    state: FeatureState,
    keys: jax.Array,  # (L,) PRNG keys for the per-level point subsets
    sample_rates=(0.1, 0.5, 1.5),
    ks=(4, 4, 16),
) -> tuple[jnp.ndarray, ...]:
    """Per-level neighbour maps for multi-resolution smoothing.

    Mirrors the cached ``multi_res_feature_smooth_map`` of the reference
    (`gaussian_model_ff.py:366-390`: the per-(rate, K) KNN maps are computed
    once under no_grad and reused across iterations): level i subsamples
    points at ``sample_rates[i]`` and maps every point — queried from its
    ORIGINAL position — to its K_i nearest *subsampled* points
    (``knn_points(xyz, xyz[pm])`` semantics: a selected point finds itself at
    distance 0; a dropped point smooths purely over the coarse subsample).
    Shapes stay static: dropped/dead points are displaced far outside the
    cloud in their *source* role only (:func:`knn_query_source`).  Build once
    (host side), pass to :func:`multi_res_smoothed_features` inside the
    jitted step.
    """
    from seganygaussians_tpu.ops.knn import knn_query_source

    xyz = state.geom.xyz
    span = jnp.max(xyz) - jnp.min(xyz) + 1.0
    maps = []
    for i, (rate, k) in enumerate(zip(sample_rates, ks)):
        pm = jax.random.uniform(keys[i], (xyz.shape[0],)) < min(rate, 1.0)
        pm = pm & state.geom.alive
        source = jnp.where(pm[:, None], xyz, xyz + 100.0 * span)
        maps.append(knn_query_source(xyz, source, k))
    return tuple(maps)


def multi_res_smoothed_features(
    state: FeatureState,
    maps: tuple[jnp.ndarray, ...],
    smooth_weights: Optional[jnp.ndarray] = None,  # (C, L)
) -> jnp.ndarray:
    """Multi-resolution smoothing (`gaussian_model_ff.py:391-400`): sum over
    levels of (optionally per-point-weighted) K_i-neighbour means of the
    L2-normalised features.  Pure and differentiable w.r.t. BOTH
    ``point_features`` and ``smooth_weights`` (the reference treats the
    per-point (N, L) weights as a learnable tensor softmaxed by the caller,
    `train_contrastive_feature.py:231`)."""
    normed = state.point_features / jnp.linalg.norm(
        state.point_features, axis=-1, keepdims=True
    ).clip(1e-9)
    out = jnp.zeros_like(normed)
    for i, nbrs in enumerate(maps):
        w = smooth_weights[:, i : i + 1] if smooth_weights is not None else 1.0
        out = out + w * jnp.mean(normed[nbrs], axis=1)
    return out


def smooth_features(
    state: FeatureState,
    smooth_type: Optional[str],
    key: Optional[jax.Array] = None,
    dropout: float = 0.5,
    maps: Optional[tuple] = None,
    smooth_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Smoothing dispatch mirroring ``render_contrastive_feature``'s
    smooth_type selection (`gaussian_renderer/__init__.py:355-360`):
    None/'none' → raw features, 'traditional' → K-NN dropout mean,
    'multi_res' → per-level subsampled means (needs ``maps`` from
    :func:`build_multi_res_maps`)."""
    if smooth_type in (None, "none"):
        return state.point_features
    if smooth_type == "traditional":
        return smoothed_point_features(state, key=key, dropout=dropout)
    if smooth_type == "multi_res":
        assert maps is not None, "build_multi_res_maps first"
        return multi_res_smoothed_features(state, maps, smooth_weights)
    raise ValueError(f"unknown smooth_type {smooth_type!r}")


class GridLevels(NamedTuple):
    """Quantised-grid feature levels (`gaussian_model_ff.py:201-249,456-469`):
    level l assigns each point a cell id at stride ``strides[l]``; features
    live in per-cell tables and ``concat_point_features`` gathers + concats
    them with the per-point features."""

    idx_mapper: jnp.ndarray  # (C, L) int32 compact cell id per point
    tables: tuple[jnp.ndarray, ...]  # L tables, (num_cells_l, fd_l)


def init_grid_levels(
    xyz: jnp.ndarray,
    strides=(0.05, 0.13, 0.23),
    feature_dims=(10, 10, 10),
) -> GridLevels:
    """`initialize_multi_res_feature` (`gaussian_model_ff.py:201-230`):
    quantise xyz per level to a grid, compact the occupied cell ids, and
    allocate a zero feature table per level.  Runs host-side once at init, so
    the compaction is ``np.unique`` over the integer (qx, qy, qz) triples —
    collision-free regardless of grid extent (a flattened int cell id can
    overflow int32 for large scenes at fine strides; the reference avoids
    this only because torch defaults to int64, `gaussian_model_ff.py:208`)."""
    xyz_np = np.asarray(xyz, np.float64)
    idx_cols, tables = [], []
    for stride, fd in zip(strides, feature_dims):
        q = np.ceil((xyz_np - xyz_np.min(axis=0, keepdims=True)) / stride)
        q = q.astype(np.int64)
        _, compact = np.unique(q, axis=0, return_inverse=True)
        num_cells = int(compact.max()) + 1
        idx_cols.append(jnp.asarray(compact, jnp.int32))
        tables.append(jnp.zeros((num_cells, fd), jnp.float32))
    return GridLevels(
        idx_mapper=jnp.stack(idx_cols, axis=-1), tables=tuple(tables)
    )


def concat_point_features(
    state: FeatureState, grids: Optional[GridLevels]
) -> jnp.ndarray:
    """`get_point_features` (`gaussian_model_ff.py:456-469`): without grid
    levels, the per-point features; with them, concat of each level's table
    row (gathered via idx_mapper) and the per-point features."""
    if grids is None:
        return state.point_features
    parts = [
        grids.tables[l][grids.idx_mapper[:, l]] for l in range(len(grids.tables))
    ]
    return jnp.concatenate(parts + [state.point_features], axis=-1)
