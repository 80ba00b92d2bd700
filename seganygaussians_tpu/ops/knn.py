"""Approximate K-nearest-neighbour ops via multi-shift Morton windowed scans.

TPU-first replacement for two CUDA/GPU dependencies of the reference:

* ``simple-knn``'s ``distCUDA2`` (`submodules/simple-knn/simple_knn.cu:185-221`):
  mean squared distance to each point's 3 nearest neighbours, used once to
  initialise Gaussian log-scales (`scene/gaussian_model.py:150`).
* ``pytorch3d.ops.knn_points`` (`scene/gaussian_model_ff.py:326,347,380`):
  K=16 neighbour index map used for affinity-feature smoothing.

The reference's own simple-knn is already "sort by Morton code, then search
nearby boxes".  On TPU we keep it fully data-parallel and static-shaped:

1. sort points by a 30-bit Morton code;
2. for each sorted position take the ±W window in Morton order (2W candidate
   distances via one coherent ascending row gather), keep the per-pass
   top-k (lossless for the global merge);
3. repeat under several fixed *rotations* of the point cloud (a rotated grid
   moves the Z-curve discontinuities to entirely different planes), and merge
   the candidate sets;
4. one lane-axis top-k over the merged, deduplicated candidates.

Rotated-grid merging fixes the classic Morton failure mode (true neighbours
split across a high-order cell boundary): with 3 rotations × W=16 the 3-NN
mean distance matches brute force to ~1e-7 *median* relative error on
Gaussian clouds (p95 ≈ 0.19).  Cost is O(N · S · 2W) fused elementwise work +
S sorts of N keys — entirely sort/roll/top-k, no gathers in the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _fixed_rotations(num: int) -> list[np.ndarray]:
    """Deterministic well-spread orthonormal bases (pass 0 = identity)."""
    rots = [np.eye(3, dtype=np.float32)]
    rng = np.random.default_rng(1234)
    while len(rots) < num:
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        rots.append(q.astype(np.float32))
    return rots


def morton_codes(xyz: jnp.ndarray) -> jnp.ndarray:
    """30-bit Morton (Z-order) codes from 10-bit-quantised coordinates.

    Mirrors ``coord2Morton`` (`simple_knn.cu:54-70`): coordinates are min-max
    normalised to [0, 1024) per axis and bit-interleaved x,y,z.
    """
    lo = jnp.min(xyz, axis=0, keepdims=True)
    hi = jnp.max(xyz, axis=0, keepdims=True)
    span = jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip(((xyz - lo) / span) * 1023.0, 0.0, 1023.0).astype(jnp.int32)

    def spread(v):
        # Insert two zero bits between each of the 10 bits.
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


def _window_candidates(
    xyz: jnp.ndarray,
    window: int,
    rot: np.ndarray,
    keep: int,
    cand_mask: jnp.ndarray | None = None,
    cand_idx: jnp.ndarray | None = None,
    sentinel: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One Morton pass → per-point ``keep`` best (d2, idx), ORIGINAL row order.

    The sort key is the Morton code of the *rotated* cloud; distances are in
    the original frame.  Window wrap-around and non-candidate rows
    (``cand_mask`` False) are masked to +inf distance with their index set to
    ``sentinel`` (one past the largest real index) so the cross-pass
    index-sort dedup in :func:`_merged_candidates` can never collapse a
    genuine candidate onto masked junk.  ``cand_idx`` is the index *reported*
    for each candidate row (used by :func:`knn_query_source` to report
    source-row ids from a combined query+source cloud).  Per-pass
    ``top_k(keep)`` is lossless for a global top-``keep`` merge: any
    globally-best candidate is also among its own pass's best ``keep``.
    """
    n = xyz.shape[0]
    if cand_idx is None:
        cand_idx = jnp.arange(n, dtype=jnp.int32)
    if sentinel is None:
        sentinel = n
    order = jnp.argsort(morton_codes(xyz @ jnp.asarray(rot.T)))
    xyz_s = xyz[order]
    idx_s0 = cand_idx[order].astype(jnp.int32)
    mask_s = None if cand_mask is None else cand_mask[order]
    pos = jnp.arange(n)

    # Stream the ±W window in groups of G shifts, maintaining a RUNNING
    # sorted top-``keep`` (keep, N) via axis-0 merge sorts: candidate rows
    # come from rolls (pure vector copies), the merge is a short-column sort
    # fully vectorized across the N lanes.  No (2W, N) materialisation, no
    # instance-scale gathers, no top_k (10-100x slower alternatives measured
    # on TPU v5e), and the fori_loop keeps the graph compile-time small.
    G = 8

    def group(g, carry):
        d2_best, idx_best = carry
        rows_d2, rows_idx = [], []
        for j in range(G):
            d = g * G + j + 1
            for s in (1, -1):
                nb = jnp.roll(xyz_s, -s * d, axis=0)
                nbi = jnp.roll(idx_s0, -s * d)
                dist = jnp.sum((xyz_s - nb) ** 2, axis=-1)
                valid = (pos + s * d >= 0) & (pos + s * d < n) & (d <= window)
                if mask_s is not None:
                    valid = valid & jnp.roll(mask_s, -s * d)
                rows_d2.append(jnp.where(valid, dist, jnp.inf))
                rows_idx.append(jnp.where(valid, nbi, sentinel))
        d2_cat = jnp.concatenate([d2_best, jnp.stack(rows_d2)], axis=0)
        idx_cat = jnp.concatenate([idx_best, jnp.stack(rows_idx)], axis=0)
        d2_s, idx_s = lax.sort((d2_cat, idx_cat), dimension=0, num_keys=1)
        return d2_s[:keep], idx_s[:keep]

    init = (
        jnp.full((keep, n), jnp.inf, jnp.float32),
        jnp.full((keep, n), sentinel, jnp.int32),
    )
    d2_best, idx_best = lax.fori_loop(0, (window + G - 1) // G, group, init)

    # Back to original row order (transposed to (N, keep)).
    inv = jnp.zeros_like(order).at[order].set(pos)
    return d2_best.T[inv], idx_best.T[inv]


def _merged_candidates(
    xyz, window, num_passes, keep, cand_mask=None, cand_idx=None, sentinel=None
):
    keep = min(keep, 2 * window)
    d2s, idxs = zip(
        *[
            _window_candidates(
                xyz, window, r, keep,
                cand_mask=cand_mask, cand_idx=cand_idx, sentinel=sentinel,
            )
            for r in _fixed_rotations(num_passes)
        ]
    )
    d2 = jnp.concatenate(d2s, axis=-1)  # (N, S·keep)
    idx = jnp.concatenate(idxs, axis=-1)
    # Dedup across passes: sort each row by (neighbour index, d2), kill
    # repeats — top-k afterwards doesn't care about order.  Masked junk all
    # carries the same sentinel index + inf distance, so it can only dedup
    # against itself, never against a genuine candidate.
    idx_s, d2_s = lax.sort((idx, d2), num_keys=2)
    dup = jnp.concatenate(
        [jnp.zeros_like(idx_s[:, :1], bool), idx_s[:, 1:] == idx_s[:, :-1]], axis=-1
    )
    d2_s = jnp.where(dup, jnp.inf, d2_s)
    return d2_s, idx_s


def mean_sq_dist_to_3nn(
    xyz: jnp.ndarray, window: int = 16, num_passes: int = 3
) -> jnp.ndarray:
    """Mean squared distance to the 3 nearest neighbours (``distCUDA2`` parity).

    Used to initialise Gaussian scales (`scene/gaussian_model.py:150-152`).
    """
    d2, _ = _merged_candidates(xyz, window, num_passes, keep=3)
    top3 = -lax.top_k(-d2, 3)[0]  # 3 smallest
    return jnp.mean(jnp.where(jnp.isfinite(top3), top3, 0.0), axis=-1)


def knn_map(
    xyz: jnp.ndarray, k: int, window: int | None = None, num_passes: int = 7
) -> jnp.ndarray:
    """(N, k) approximate nearest-neighbour indices (original ordering).

    Replacement for the cached ``knn_points`` neighbour map of
    `scene/gaussian_model_ff.py:326` (K=16 feature smoothing).

    Defaults are sized for high-fidelity K=16 maps: window 4·k, 7 rotation
    passes.  Measured on a clustered-plus-background cloud
    (tests/test_model.py::test_knn_approximation_downstream_bounds):
    neighbour recall 0.998, K=16 smoothed-feature cosine vs exact KNN
    median 1.0 with 99.6% of points above 0.9 (at the old window=16,
    num_passes=3 the median cosine was only 0.89).  The map is computed
    once and cached by consumers, so the extra passes are off the hot path.
    """
    if window is None:
        window = max(4 * k, 32)
    d2, idx = _merged_candidates(xyz, window, num_passes, keep=k)
    neg_d2, nk_col = lax.top_k(-d2, k)
    nbrs = jnp.take_along_axis(idx, nk_col, axis=-1)
    # Junk slots (fewer than k real candidates in any window) fall back to
    # self: harmless for every consumer (smoothing means include self anyway)
    # and always in-bounds, unlike the sentinel index.
    self_idx = jnp.arange(xyz.shape[0], dtype=nbrs.dtype)[:, None]
    return jnp.where(jnp.isfinite(neg_d2), nbrs, self_idx)


def knn_query_source(
    query: jnp.ndarray,
    source: jnp.ndarray,
    k: int,
    window: int | None = None,
    num_passes: int = 7,
) -> jnp.ndarray:
    """(Nq, k) indices into ``source`` of each query's k nearest source points.

    The asymmetric form of :func:`knn_map` — pytorch3d
    ``knn_points(query, source)`` semantics (`gaussian_model_ff.py:380`:
    multi-res smoothing maps EVERY point to its K nearest *subsampled*
    points).  Implementation: one combined (Nq+Ns) cloud run through the same
    Morton windowed scan, with non-source rows masked out of the candidate
    role; a query that is also present in ``source`` finds its co-located
    source copy at distance 0, reproducing knn_points' self-inclusion.
    """
    if window is None:
        # Twice the symmetric default: query rows occupy roughly half of any
        # Morton window in the combined cloud, halving source coverage.
        window = max(8 * k, 64)
    nq, ns = query.shape[0], source.shape[0]
    both = jnp.concatenate([query, source], axis=0)
    is_source = jnp.arange(nq + ns) >= nq
    # Report source-row ids for source rows; query rows are never candidates.
    rep_idx = jnp.where(is_source, jnp.arange(nq + ns) - nq, ns).astype(jnp.int32)
    d2, idx = _merged_candidates(
        both, window, num_passes, keep=k,
        cand_mask=is_source, cand_idx=rep_idx, sentinel=ns,
    )
    neg_d2, nk_col = lax.top_k(-d2, k)
    nbrs = jnp.take_along_axis(idx, nk_col, axis=-1)[:nq]
    finite = jnp.isfinite(neg_d2)[:nq]
    # Junk slots fall back to the query's best real source neighbour
    # (column 0); if a query found no source at all, clamp to 0.
    best = jnp.where(finite[:, :1], nbrs[:, :1], 0)
    return jnp.where(finite, nbrs, best)
