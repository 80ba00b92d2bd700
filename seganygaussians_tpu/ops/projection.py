"""Per-Gaussian screen-space preprocess (projection, EWA cov2D, tile rects).

TPU-first re-design of the CUDA `preprocessCUDA` stage
(`cuda_rasterizer/forward.cu:156-256`): instead of one thread per Gaussian
with early-outs, everything is a single fused vectorized map over N Gaussians
with validity masks — XLA fuses the whole stage into a handful of VPU loops.

Reproduced algorithmic facts (SURVEY.md §2.2):
  * near-cull at view-space z <= 0.2            (`auxiliary.h:139-160`)
  * perspective divide with eps 1e-7            (`forward.cu:198-200`)
  * EWA J·W·Σ·Wᵀ·Jᵀ with t.x/t.y clamped to ±1.3·tanfov (`forward.cu:74-112`)
  * +0.3 low-pass on the cov2D diagonal         (`forward.cu:110-111`)
  * radius = ceil(3·sqrt(max eigenvalue))       (`forward.cu:229-232`)
  * tile rect via getRect                       (`auxiliary.h:46-57`)
  * ndc2Pix(v, S) = ((v+1)·S − 1)/2             (`auxiliary.h:41-44`)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from seganygaussians_tpu.ops.camera import CameraParams
from seganygaussians_tpu.ops.transforms import build_covariance_3d


class Preprocessed(NamedTuple):
    """Per-Gaussian screen-space quantities (all shaped (N, ...))."""

    means2d: jnp.ndarray  # (N, 2) pixel coordinates
    depths: jnp.ndarray  # (N,) view-space z
    conics: jnp.ndarray  # (N, 3) inverse 2D covariance (a, b, c)
    radii: jnp.ndarray  # (N,) int32 screen-space radius (0 ⇒ culled)
    rect_min: jnp.ndarray  # (N, 2) int32 tile rect (x, y) inclusive-min
    rect_max: jnp.ndarray  # (N, 2) int32 tile rect exclusive-max
    tiles_touched: jnp.ndarray  # (N,) int32
    valid: jnp.ndarray  # (N,) bool
    # Optional elliptical per-tile-row footprints: (N, grid_y) int32 packing
    # x0_tile | width<<10 per row (width 0 outside the footprint).  When
    # present, ``tiles_touched`` is the exact per-row sum and
    # ``binning.expand_slots`` emits one instance per (tile-row, x) cell of
    # the row interval instead of the full bounding rect — the rect's
    # corners never contribute (α < 1/255 there by construction), so output
    # and gradients are bit-identical with ~25-35% fewer instances.
    row_pack: Optional[jnp.ndarray] = None


def project_points(
    means3d: jnp.ndarray, camera: CameraParams
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project to NDC and view space (row-vector convention).

    Returns (p_proj (N,3) NDC, p_view (N,3) view-space).
    """
    ones = jnp.ones_like(means3d[..., :1])
    hom = jnp.concatenate([means3d, ones], axis=-1)
    # Positions need full fp32: force highest matmul precision (TPU MXU
    # otherwise rounds inputs to bf16).
    p_hom = jnp.matmul(hom, camera.full_proj, precision="highest")
    p_w = 1.0 / (p_hom[..., 3:4] + 1e-7)
    p_proj = p_hom[..., :3] * p_w
    p_view = jnp.matmul(hom, camera.world_view, precision="highest")
    return p_proj, p_view[..., :3]


def compute_cov2d(
    p_view: jnp.ndarray,
    cov3d: jnp.ndarray,
    camera: CameraParams,
) -> jnp.ndarray:
    """EWA splatting 2D covariance (packed (N,3): xx, xy, yy).

    Σ' = J W Σ Wᵀ Jᵀ with the FoV clamp and +0.3 low-pass of
    `forward.cu:74-112`.  W is the rotation block of the world→view
    transform; with our row-vector convention that block is
    ``camera.world_view[:3, :3]`` acting as ``t = p @ W``, i.e. the
    column-vector rotation is ``W.T``.
    """
    fx, fy = camera.focal_x, camera.focal_y
    tx, ty, tz = p_view[..., 0], p_view[..., 1], p_view[..., 2]
    limx = 1.3 * camera.tan_fovx
    limy = 1.3 * camera.tan_fovy
    tz_safe = jnp.where(tz == 0.0, 1e-6, tz)
    tx = jnp.clip(tx / tz_safe, -limx, limx) * tz
    ty = jnp.clip(ty / tz_safe, -limy, limy) * tz
    inv_z = 1.0 / tz_safe
    inv_z2 = inv_z * inv_z

    # J: 2x3 Jacobian of the perspective projection at (tx, ty, tz).
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2

    # Column-vector rotation world→view: R = world_view[:3,:3].T
    R = camera.world_view[:3, :3].T  # (3,3)

    # M = J @ R : (N, 2, 3)
    m0 = j00[..., None] * R[0] + j02[..., None] * R[2]  # (N,3)
    m1 = j11[..., None] * R[1] + j12[..., None] * R[2]  # (N,3)

    # Σ (N,3,3) from packed cov3d.
    xx, xy, xz, yy, yz, zz = (cov3d[..., i] for i in range(6))

    def sym_mul(m):  # Σ @ m for row vector m (N,3) → (N,3)
        return jnp.stack(
            [
                xx * m[..., 0] + xy * m[..., 1] + xz * m[..., 2],
                xy * m[..., 0] + yy * m[..., 1] + yz * m[..., 2],
                xz * m[..., 0] + yz * m[..., 1] + zz * m[..., 2],
            ],
            axis=-1,
        )

    s_m0 = sym_mul(m0)
    s_m1 = sym_mul(m1)
    c_xx = jnp.sum(m0 * s_m0, axis=-1) + 0.3
    c_xy = jnp.sum(m0 * s_m1, axis=-1)
    c_yy = jnp.sum(m1 * s_m1, axis=-1) + 0.3
    return jnp.stack([c_xx, c_xy, c_yy], axis=-1)


def ndc2pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    return ((v + 1.0) * size - 1.0) * 0.5


def _row_intervals(
    mx, my, conics, tau, rx0, rx1, ry0, ry1, grid_y: int, tile_size: int
):
    """Per-tile-row x-intervals of the α ≥ 1/255 ellipse, (N, grid_y).

    The contributing set {q(dx, dy) ≤ 2τ} with q = a·dx² + 2b·dx·dy + c·dy²
    (conic = (a, b, c), τ = ln(255·opa)) meets the pixel-row band
    dy ∈ [dyl, dyh] in an x-interval.  Its upper boundary
    x₊(dy) = (−b·dy + √D)/a with D = 2aτ − det·dy² is concave on the
    ellipse's dy-range, so the interval max is x₊ at the clipped critical
    point dy* = −sign(b)·|b|·√(2τ/(c·det)); the lower boundary follows from
    the symmetry x₋(dy) = −x₊(−dy).  A ±1 px margin absorbs fp error (same
    margin as the AABB path).  Rows outside the rect, or degenerate conics,
    get width 0 / the full rect width respectively.

    Returns (row_pack int32 (N, grid_y): x0_tile | width<<10, exact
    tiles_touched (N,) int32).
    """
    ts = tile_size
    a = conics[..., 0:1]
    b = conics[..., 1:2]
    c = conics[..., 2:3]
    det = a * c - b * b
    ok = (det > 0.0) & (a > 0.0) & (c > 0.0)
    det_s = jnp.where(ok, det, 1.0)
    a_s = jnp.where(ok, a, 1.0)
    c_s = jnp.where(ok, c, 1.0)
    tau = jnp.maximum(tau[..., None], 0.0)  # (N, 1)

    ty = jnp.arange(grid_y, dtype=jnp.float32)[None, :]  # (1, G)
    dyl = ty * ts - my[..., None]  # (N, G) first pixel-center offset
    dyh = dyl + (ts - 1)  # last pixel-center offset

    dmax = jnp.sqrt(jnp.maximum(2.0 * a_s * tau / det_s, 0.0))  # (N, 1)
    dy_star = -jnp.sign(b) * jnp.abs(b) * jnp.sqrt(
        jnp.maximum(2.0 * tau / (c_s * det_s), 0.0)
    )  # (N, 1) argmax of x₊

    def xmax_over(lo_in, hi_in):
        lo = jnp.maximum(lo_in, -dmax)
        hi = jnp.minimum(hi_in, dmax)
        nonempty = lo <= hi
        dyc = jnp.clip(dy_star, lo, hi)
        d_val = jnp.maximum(2.0 * a_s * tau - det_s * dyc * dyc, 0.0)
        x = (-b * dyc + jnp.sqrt(d_val)) / a_s
        return x, nonempty

    x_hi, ne1 = xmax_over(dyl, dyh)
    x_lo_neg, _ = xmax_over(-dyh, -dyl)
    x_lo = -x_lo_neg

    ty_i = jnp.arange(grid_y, dtype=jnp.int32)[None, :]
    in_rows = (ty_i >= ry0[..., None]) & (ty_i < ry1[..., None])
    live = in_rows & ne1 & ok

    px_min = mx[..., None] + x_lo - 1.0
    px_max = mx[..., None] + x_hi + 1.0
    tx0 = jnp.floor(px_min / ts).astype(jnp.int32)
    tx1 = jnp.floor((px_max + ts - 1) / ts).astype(jnp.int32)
    tx0 = jnp.clip(tx0, rx0[..., None], rx1[..., None])
    tx1 = jnp.clip(tx1, rx0[..., None], rx1[..., None])
    # Degenerate conic (shouldn't pass det_valid, but stay conservative):
    # full rect width for its rows.
    tx0 = jnp.where(ok, tx0, rx0[..., None])
    w = jnp.where(live, jnp.maximum(tx1 - tx0, 0), 0)
    w = jnp.where(
        in_rows & jnp.logical_not(ok),
        jnp.maximum(rx1[..., None] - rx0[..., None], 0),
        w,
    )
    row_pack = tx0 | (w << 10)
    return row_pack, jnp.sum(w, axis=-1).astype(jnp.int32)


def preprocess(
    means3d: jnp.ndarray,
    camera: CameraParams,
    scales: Optional[jnp.ndarray] = None,
    rotations: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    scale_modifier: float = 1.0,
    tile_size: int = 16,
    active_mask: Optional[jnp.ndarray] = None,
    opacities: Optional[jnp.ndarray] = None,
    row_footprints: bool = False,
) -> Preprocessed:
    """Vectorized projection + culling + tile-rect stage.

    ``active_mask`` (N,) bool culls rows entirely (used for the dead slots of
    fixed-capacity Gaussian buffers — they produce no tile instances at all).

    ``opacities`` (N,) activated opacities enable *exact* footprint culling:
    the blend kernel skips any instance with α = opa·exp(power) < 1/255
    (CUDA parity, `forward.cu:343-351`), so the contributing footprint is the
    ellipse power ≥ ln(1/(255·opa)), whose axis-aligned bounding box is
    |dx| ≤ e·√cov_xx, |dy| ≤ e·√cov_yy with e = √(2·ln(255·opa)).  This is
    strictly inside the reference's 3σ circle (`forward.cu:229-232`) and
    produces bit-identical rendered output and gradients with far fewer tile
    instances (every instance-sized cost scales with that count).  The
    reported ``radii`` keep the reference's 3σ semantics for densification
    parity.
    """
    if cov3d_precomp is None:
        assert scales is not None and rotations is not None
        cov3d = build_covariance_3d(scales, rotations, scale_modifier)
    else:
        cov3d = cov3d_precomp

    p_proj, p_view = project_points(means3d, camera)
    depths = p_view[..., 2]
    in_front = depths > 0.2  # near-cull (`auxiliary.h:157`)

    cov2d = compute_cov2d(p_view, cov3d, camera)
    det = cov2d[..., 0] * cov2d[..., 2] - cov2d[..., 1] * cov2d[..., 1]
    det_valid = det != 0.0
    det_inv = 1.0 / jnp.where(det_valid, det, 1.0)
    conics = jnp.stack(
        [cov2d[..., 2] * det_inv, -cov2d[..., 1] * det_inv, cov2d[..., 0] * det_inv],
        axis=-1,
    )

    mid = 0.5 * (cov2d[..., 0] + cov2d[..., 2])
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 1e-12)))

    mx = ndc2pix(p_proj[..., 0], camera.width)
    my = ndc2pix(p_proj[..., 1], camera.height)
    means2d = jnp.stack([mx, my], axis=-1)

    grid_x = (camera.width + tile_size - 1) // tile_size
    grid_y = (camera.height + tile_size - 1) // tile_size

    if opacities is None:
        # Reference 3σ circle rect (`auxiliary.h:46-57`).
        rad_x = radius_f
        rad_y = radius_f
        opa_visible = True
    else:
        # Exact per-axis extent of the α ≥ 1/255 footprint (+1px fp margin).
        opa = jax.lax.stop_gradient(opacities).reshape(-1)  # structural, like radii
        opa_visible = opa * 255.0 > 1.0
        e = jnp.sqrt(jnp.maximum(2.0 * jnp.log(jnp.maximum(opa, 1e-12) * 255.0), 0.0))
        rad_x = jnp.minimum(e * jnp.sqrt(jnp.maximum(cov2d[..., 0], 0.0)) + 1.0, radius_f)
        rad_y = jnp.minimum(e * jnp.sqrt(jnp.maximum(cov2d[..., 2], 0.0)) + 1.0, radius_f)

    # getRect (`auxiliary.h:46-57`): note the min is computed with C float→int
    # truncation of (p - r) / BLOCK, which rounds toward zero — emulate with a
    # floor after clamping at 0 (negative operands clamp to 0 anyway).
    rx0 = jnp.clip(jnp.floor((mx - rad_x) / tile_size).astype(jnp.int32), 0, grid_x)
    ry0 = jnp.clip(jnp.floor((my - rad_y) / tile_size).astype(jnp.int32), 0, grid_y)
    rx1 = jnp.clip(
        jnp.floor((mx + rad_x + tile_size - 1) / tile_size).astype(jnp.int32),
        0,
        grid_x,
    )
    ry1 = jnp.clip(
        jnp.floor((my + rad_y + tile_size - 1) / tile_size).astype(jnp.int32),
        0,
        grid_y,
    )
    num_tiles = (rx1 - rx0) * (ry1 - ry0)

    # Reference radii/visibility semantics use the 3σ circle rect regardless
    # of opacity (CUDA's preprocess never opacity-culls) — keep them for
    # densification parity while instance generation uses the exact rect.
    r3x0 = jnp.clip(jnp.floor((mx - radius_f) / tile_size).astype(jnp.int32), 0, grid_x)
    r3y0 = jnp.clip(jnp.floor((my - radius_f) / tile_size).astype(jnp.int32), 0, grid_y)
    r3x1 = jnp.clip(
        jnp.floor((mx + radius_f + tile_size - 1) / tile_size).astype(jnp.int32),
        0, grid_x,
    )
    r3y1 = jnp.clip(
        jnp.floor((my + radius_f + tile_size - 1) / tile_size).astype(jnp.int32),
        0, grid_y,
    )
    visible = in_front & det_valid & ((r3x1 - r3x0) * (r3y1 - r3y0) > 0)
    if active_mask is not None:
        visible = visible & active_mask
    valid = visible & (num_tiles > 0) & opa_visible
    radii = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)

    # Elliptical per-row footprints are OPT-IN: they cut instances another
    # ~11-16% beyond the per-axis AABB, but the two-level expansion they
    # need costs ~46 ms vs 5.4 ms at M=614k on TPU v5e (row-scale scatter +
    # flat gathers — measured round 5), a net loss at bench shapes.  Worth
    # enabling only for scenes with strongly anisotropic footprints.
    row_pack = None
    if opacities is not None and row_footprints:
        tau = jnp.log(jnp.maximum(opa, 1e-12) * 255.0)
        # Structural (non-differentiable) like radii/rects: stop_gradient
        # keeps sqrt-at-zero out of the backward graph entirely.
        row_pack, row_tiles = _row_intervals(
            jax.lax.stop_gradient(mx), jax.lax.stop_gradient(my),
            jax.lax.stop_gradient(conics), tau,
            rx0, rx1, ry0, ry1, grid_y, tile_size
        )
        num_tiles = row_tiles
        valid = valid & (num_tiles > 0)
        row_pack = jnp.where(valid[:, None], row_pack, 0)
    tiles_touched = jnp.where(valid, num_tiles, 0).astype(jnp.int32)

    return Preprocessed(
        means2d=means2d,
        depths=depths,
        conics=conics,
        radii=radii,
        rect_min=jnp.stack([rx0, ry0], axis=-1),
        rect_max=jnp.stack([rx1, ry1], axis=-1),
        tiles_touched=tiles_touched,
        valid=valid,
        row_pack=row_pack,
    )
