"""Quaternion / covariance transforms for Gaussian primitives.

Behavioural parity targets: `utils/general_utils.py:64-110` (build_rotation,
build_scaling_rotation, strip_symmetric) and `cuda_rasterizer/forward.cu:118-152`
(computeCov3D).  All functions are batched over the leading axis and pure jnp.
"""

from __future__ import annotations

import jax.numpy as jnp


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.log(x / (1.0 - x))


def build_rotation(q: jnp.ndarray) -> jnp.ndarray:
    """Normalized quaternion (w,x,y,z layout, as the reference stores it) → R.

    Matches `utils/general_utils.py:78-99`.
    q: (N, 4) → (N, 3, 3)
    """
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    q = q / norm
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z),
            2 * (x * y - r * z),
            2 * (x * z + r * y),
            2 * (x * y + r * z),
            1 - 2 * (x * x + z * z),
            2 * (y * z - r * x),
            2 * (x * z - r * y),
            2 * (y * z + r * x),
            1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def build_scaling_rotation(s: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s); covariance = L Lᵀ (`utils/general_utils.py:101-110`)."""
    R = build_rotation(q)
    return R * s[..., None, :]


def build_covariance_3d(
    scales: jnp.ndarray, rotations: jnp.ndarray, scale_modifier: float = 1.0
) -> jnp.ndarray:
    """Packed symmetric 3D covariance (xx, xy, xz, yy, yz, zz).

    Matches `cuda_rasterizer/forward.cu:118-152` (computeCov3D) and the torch
    path `utils/general_utils.py:101-110` + `strip_symmetric`.
    scales: (N, 3) activated scales, rotations: (N, 4) quaternions.
    Returns (N, 6).
    """
    L = build_scaling_rotation(scale_modifier * scales, rotations)
    # 3x3 matmuls must stay fp32 on TPU (MXU defaults to bf16 inputs).
    sigma = jnp.einsum("nij,nkj->nik", L, L, precision="highest")
    return strip_symmetric(sigma)


def strip_symmetric(sym: jnp.ndarray) -> jnp.ndarray:
    """(N,3,3) symmetric → packed (N,6) upper triangle (xx,xy,xz,yy,yz,zz)."""
    return jnp.stack(
        [
            sym[..., 0, 0],
            sym[..., 0, 1],
            sym[..., 0, 2],
            sym[..., 1, 1],
            sym[..., 1, 2],
            sym[..., 2, 2],
        ],
        axis=-1,
    )


def unpack_symmetric(packed: jnp.ndarray) -> jnp.ndarray:
    """Packed (N,6) → full (N,3,3)."""
    xx, xy, xz, yy, yz, zz = (packed[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
