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
   distances, materialised with static rolls — no per-point gathers);
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
    xyz: jnp.ndarray, window: int, rot: np.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One Morton pass → (d2, idx) of shape (N, 2W) in ORIGINAL row order.

    The sort key is the Morton code of the *rotated* cloud; distances are in
    the original frame.  Candidate j = sorted-position ± d for d in [1, W],
    built with static rolls of both coordinates and original indices (pure
    data movement).  Window wrap-around is masked to +inf / self-index.
    """
    n = xyz.shape[0]
    order = jnp.argsort(morton_codes(xyz @ jnp.asarray(rot.T)))
    xyz_s = xyz[order]
    pos = jnp.arange(n)
    d2_cols, idx_cols = [], []
    for d in range(1, window + 1):
        for sign in (1, -1):
            nb = jnp.roll(xyz_s, -sign * d, axis=0)
            nb_idx = jnp.roll(order, -sign * d)
            dist = jnp.sum((xyz_s - nb) ** 2, axis=-1)
            valid = (pos + sign * d >= 0) & (pos + sign * d < n)
            d2_cols.append(jnp.where(valid, dist, jnp.inf))
            idx_cols.append(jnp.where(valid, nb_idx, order))
    d2 = jnp.stack(d2_cols, axis=-1)
    idx = jnp.stack(idx_cols, axis=-1)
    # Back to original row order.
    inv = jnp.zeros_like(order).at[order].set(pos)
    return d2[inv], idx[inv]


def _merged_candidates(xyz, window, num_passes):
    d2s, idxs = zip(
        *[_window_candidates(xyz, window, r) for r in _fixed_rotations(num_passes)]
    )
    d2 = jnp.concatenate(d2s, axis=-1)  # (N, S·2W)
    idx = jnp.concatenate(idxs, axis=-1)
    # Dedup: sort each row by neighbour index, kill repeats, restore nothing —
    # top-k afterwards doesn't care about order.
    idx_s, d2_s = lax.sort((idx, d2), num_keys=1)
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
    d2, _ = _merged_candidates(xyz, window, num_passes)
    top3 = -lax.top_k(-d2, 3)[0]  # 3 smallest
    return jnp.mean(jnp.where(jnp.isfinite(top3), top3, 0.0), axis=-1)


def knn_map(
    xyz: jnp.ndarray, k: int, window: int | None = None, num_passes: int = 3
) -> jnp.ndarray:
    """(N, k) approximate nearest-neighbour indices (original ordering).

    Replacement for the cached ``knn_points`` neighbour map of
    `scene/gaussian_model_ff.py:326` (K=16 feature smoothing).
    """
    if window is None:
        window = max(k, 16)
    d2, idx = _merged_candidates(xyz, window, num_passes)
    _, nk_col = lax.top_k(-d2, k)
    return jnp.take_along_axis(idx, nk_col, axis=-1)
