"""Pallas TPU kernels for tile alpha-blending (forward + backward), round 2.

TPU-first re-design of the CUDA render kernels
(`cuda_rasterizer/forward.cu:261-374`, `backward.cu:399-557`):

* Grid iterates tiles sequentially; each tile streams CHUNK-instance slabs of
  packed per-instance data from HBM in a field-major (F, M) layout so every
  transfer is a lane-aligned slice.  Compute layout is pixels-on-sublanes ×
  instances-on-lanes: per-instance scalars are (1, K) rows that broadcast for
  free, per-instance gradient reductions are natural sublane sums.
* **Double-buffered DMA**: the slab for chunk i+1 is in flight while chunk i
  computes (guide pattern "Double Buffering"); the loop is a `while_loop`
  with a **saturation early-exit** — once every pixel's transmittance falls
  below 1e-4 no later instance can contribute (the TPU analogue of CUDA's
  `__syncthreads_count(done)` ballot, `forward.cu:306-322`).
* The front-to-back march becomes, per chunk, an exclusive cumulative sum of
  log(1−α) along the instance axis via a strictly-triangular matmul on the
  MXU, then the color accumulation matmul acc += W·colorsᵀ.
* Termination parity with CUDA (`forward.cu:346-351`): ``t_all`` multiplies
  every contributing α and drives the include test (T·(1−α) ≥ 1e-4 defines a
  prefix), ``t_incl`` multiplies only *included* α (→ final_T).
* Backward avoids atomics AND read-modify-write: every instance belongs to
  exactly one tile, so each 256-instance gradient chunk has a single writer
  except the chunk straddling two tiles' ranges.  That boundary chunk is
  **carried in VMEM scratch across sequential grid steps** (tile ranges are
  contiguous: tile t+1 starts where t ends) and written once, merged.
  Chunks past the saturation point are never written — the output buffer is
  zero-initialized via input/output aliasing.
* A final XLA sort+segment-cumsum maps per-instance gradients to Gaussians
  (gathers/scatters with random index order are 15-30x slower than sort on
  this hardware — measured in tools/bench_primitives.py).

The public ``blend`` matches ``blend.py``'s signature and carries a
custom_vjp wired to the backward kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from seganygaussians_tpu.ops.blend import ALPHA_MAX, ALPHA_MIN, T_EPS, BlendOutput

# Packed per-instance field-major layout (F, M): rows are
# [x, y, conic_a, conic_b, conic_c, opacity, pad, pad, color_0..color_{C-1}].
COLOR_OFFSET = 8
CHUNK = 256  # instances per inner step (lane axis; multiple of 128)

# Per-pass P·K budgets (P = tile_size² pixels, K = chunk lanes).  The
# kernels hold several (P, K) f32 intermediates; at P=1024 (32x32 tiles) the
# BACKWARD at K=256 blows up the Mosaic compile (observed: never finished),
# while K=128 compiles and runs well.  Bigger forward chunks were measured
# SLOWER (K=256: 15.4 ms vs 11.2 ms at K=128, round-5 profile): the
# triangular prefix-sum matmul costs M·P·K total FLOPs, so K is the knob —
# small K cuts MXU work but pays more per-chunk fixed cost (DMA waits,
# while_loop step, matmul issue).  Env overrides for experiments:
# SAGA_FWD_PK / SAGA_BWD_PK / SAGA_MAX_CHUNK.
_PK_BUDGET = {"fwd": 131072, "bwd": 131072}


def chunk_for(tile_size: int, kind: str = "bwd") -> int:
    """Instances per inner step for a given tile size and pass."""
    import os

    p = tile_size * tile_size
    budget = int(os.environ.get(f"SAGA_{kind.upper()}_PK", _PK_BUDGET[kind]))
    cap = int(os.environ.get("SAGA_MAX_CHUNK", CHUNK))
    return min(cap, max(64, budget // p))


def pad_chunk_for(tile_size: int) -> int:
    """Instance-count padding granularity: a common multiple of both passes'
    chunk sizes (both are powers of two, so the max divides evenly)."""
    return max(chunk_for(tile_size, "fwd"), chunk_for(tile_size, "bwd"))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_channels(c: int) -> int:
    return max(8, ((c + 7) // 8) * 8)


def _pack_instances(gauss_id, means2d, conics, opacities, colors, m_pad):
    """Gather per-Gaussian fields into instance order, packed (F, M_pad).

    Instance-sized gathers are the expensive XLA-on-TPU primitive, so the
    per-Gaussian fields are packed into ONE (N, F) matrix first (cheap N-sized
    ops) and expanded with a single row-gather.  ``gauss_id`` is
    piecewise-ascending (depth ranks within each tile), which keeps the
    gather memory-coherent (~15x faster than random order, measured)."""
    c = colors.shape[-1]
    c_pad = _pad_channels(c)
    n = means2d.shape[0]
    m = gauss_id.shape[0]
    fields = jnp.concatenate(
        [
            means2d,
            conics,
            opacities[:, None],
            jnp.zeros((n, 2), jnp.float32),
            colors,
            jnp.zeros((n, c_pad - c), jnp.float32) if c_pad != c else jnp.zeros((n, 0)),
        ],
        axis=-1,
    )  # (N, F)
    inst = fields[gauss_id]  # (M, F): the one instance-sized gather
    if m_pad != m:
        inst = jnp.pad(inst, ((0, m_pad - m), (0, 0)))
    return inst.T  # (F, M_pad)


def _tile_origin(t, grid_x: int, tile_size: int):
    tile_x = (t % grid_x).astype(jnp.float32) * tile_size
    tile_y = (t // grid_x).astype(jnp.float32) * tile_size
    return tile_x, tile_y


def _pixel_basis(tile_size: int, p: int):
    """Quadratic pixel basis (P, 8): [1, px, py, px², py², px·py, 0, 0] in
    TILE-LOCAL coordinates (identical for every tile; local coords keep the
    quadratic's terms O(10²) so the f32 matmul cancellation error stays
    ~1e-5 in the exponent).  The Gaussian log-density is quadratic in pixel
    position, so evaluating it for a whole chunk is ONE (P,8)x(8,K) MXU
    matmul instead of ~12 VPU ops on (P,K) arrays."""
    sub = lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (sub % tile_size).astype(jnp.float32)
    py = (sub // tile_size).astype(jnp.float32)
    one = jnp.ones_like(px)
    zero = jnp.zeros_like(px)
    basis = jnp.concatenate(
        [one, px, py, px * px, py * py, px * py, zero, zero], axis=1
    )  # (P, 8)
    return basis



def _tri_excl(k: int):
    """Strictly upper-triangular ones (K, K): contracting x (P,K) with this
    yields the exclusive prefix-sum of x along the instance (lane) axis."""
    row = lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (row < col).astype(jnp.float32)


def _scan_mode() -> str:
    import os

    return os.environ.get("SAGA_SCAN", "tri")


def _excl_cumsum_lanes(x: jnp.ndarray, tri: jnp.ndarray) -> jnp.ndarray:
    """EXCLUSIVE prefix sum along the lane (instance) axis.

    Two implementations, selected by SAGA_SCAN:

    * ``tri`` (default): 2-term bf16-split strictly-triangular matmul.  At
      default MXU precision f32 inputs are rounded to bf16 (measured 3.7e-3
      image / 0.64 relative gradient error on-chip; interpret mode never
      sees this); precision=HIGHEST on a (K, K) operand made the Mosaic
      compile take minutes.  Splitting x = hi + lo with hi = bf16(x) makes
      hi·tri EXACT (tri is 0/1) and leaves only lo's bf16 rounding:
      |err| ≤ 2^-17·Σ|x| ≈ 4e-5 — below f32 accumulation noise.
    * ``shift``: Hillis-Steele log₂K lane-shift adds — pure f32 VPU, exact,
      O(P·K·logK) vs the matmul's O(P·K²) MXU FLOPs.
    """
    if _scan_mode() == "shift":
        p, k = x.shape
        acc = x
        d = 1
        while d < k:
            acc = acc + jnp.pad(acc, ((0, 0), (d, 0)))[:, :k]
            d *= 2
        return acc - x
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    lo = x - hi
    dn = (((1,), (0,)), ((), ()))
    return jax.lax.dot_general(
        hi, tri, dimension_numbers=dn, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        lo, tri, dimension_numbers=dn, preferred_element_type=jnp.float32
    )


def _chunk_coef(slab, tx0, ty0):
    """Per-instance quadratic coefficients (8, K) of s = power + log(opa) in
    tile-local pixel coordinates, plus the (1, K) rows the backward needs.

    s(px,py) = c0 + c1·px + c2·py + c3·px² + c4·py² + c5·px·py with
      c0 = −½ca·gx² − ½cc·gy² − cb·gx·gy + log(opa)
      c1 = ca·gx + cb·gy,  c2 = cc·gy + cb·gx
      c3 = −½ca,  c4 = −½cc,  c5 = −cb
    """
    gx = slab[0:1, :] - tx0  # (1, K) local
    gy = slab[1:2, :] - ty0
    ca = slab[2:3, :]
    cb = slab[3:4, :]
    cc = slab[4:5, :]
    opa = slab[5:6, :]
    log_opa = jnp.log(jnp.maximum(opa, 1e-12))
    zero = jnp.zeros_like(ca)
    coef = jnp.concatenate(
        [
            -0.5 * (ca * gx * gx + cc * gy * gy) - cb * gx * gy + log_opa,
            ca * gx + cb * gy,
            cc * gy + cb * gx,
            -0.5 * ca,
            -0.5 * cc,
            -cb,
            zero,
            zero,
        ],
        axis=0,
    )  # (8, K)
    return coef, (gx, gy, ca, cb, cc, opa, log_opa)


def _chunk_alpha(slab, basis, tx0, ty0, row0, start, end, k):
    """α for a chunk via the basis matmul.  Returns (alpha (P,K), s (P,K),
    per-instance rows).  contributes ≡ (power ≤ 0) & (α_raw ≥ 1/255) &
    in-segment, expressed as bounds on s = power + log(opa)."""
    coef, rows = _chunk_coef(slab, tx0, ty0)
    log_opa = rows[6]
    s = jax.lax.dot_general(
        basis, coef,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (P, K)
    idx = row0 + lax.broadcasted_iota(jnp.int32, (1, k), 1)
    in_seg = (idx >= start) & (idx < end)
    contributes = (s <= log_opa) & (s >= _LOG_ALPHA_MIN) & in_seg
    alpha = jnp.where(contributes, jnp.minimum(ALPHA_MAX, jnp.exp(s)), 0.0)
    return alpha, s, rows


_LOG_ALPHA_MIN = float(np.log(1.0 / 255.0))


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    starts_ref,  # scalar prefetch: (T+1,) int32 SMEM
    inst_ref,  # (F, M) f32 HBM
    bg_ref,  # (1, C_pad) f32 VMEM
    tiles_ref,  # out (1, P, C_pad)
    final_t_ref,  # out (1, P, 1)
    n_contrib_ref,  # out (1, P, 1) int32
    slab_ref,  # scratch (2, F, K) VMEM — double buffered
    copy_sem,  # DMA sems (2,)
    *,
    grid_x: int,
    tile_size: int,
    c_pad: int,
):
    t = pl.program_id(0)
    p = tile_size * tile_size
    k = chunk_for(tile_size, "fwd")

    start = starts_ref[t]
    end = starts_ref[t + 1]
    c0 = start // k
    c1 = lax.div(end + k - 1, k)

    tx0, ty0 = _tile_origin(t, grid_x, tile_size)
    basis = _pixel_basis(tile_size, p)
    tri = _tri_excl(k)

    def dma(ci):
        slot = lax.rem(ci, 2)
        return pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(ci * k, k)], slab_ref.at[slot], copy_sem.at[slot]
        )

    @pl.when(c0 < c1)
    def _():
        dma(c0).start()

    def cond(carry):
        ci, t_all, *_ = carry
        return (ci < c1) & (jnp.max(t_all) >= T_EPS)

    def body(carry):
        ci, t_all, t_incl, contrib, acc = carry
        # Prefetch the next slab while this one computes.
        @pl.when(ci + 1 < c1)
        def _():
            dma(ci + 1).start()

        dma(ci).wait()
        slab = slab_ref[lax.rem(ci, 2)]
        row0 = ci * k

        alpha, _, _ = _chunk_alpha(slab, basis, tx0, ty0, row0, start, end, k)

        log1m = jnp.log1p(-alpha)
        cum_excl = _excl_cumsum_lanes(log1m, tri)  # (P, K)
        t_before = t_all * jnp.exp(cum_excl)
        t_after = t_before * (1.0 - alpha)
        include = (t_after >= T_EPS) & (alpha > 0.0)

        w = jnp.where(include, alpha * t_before, 0.0)  # (P, K)
        colors = slab[COLOR_OFFSET : COLOR_OFFSET + c_pad, :]  # (C_pad, K)
        # precision=HIGHEST on the true matmuls: the MXU otherwise rounds
        # f32 inputs to bf16 on real chips (measured 3.7e-3 image error and
        # up to 0.64 relative gradient error on-chip; interpret mode never
        # sees this).  These are (·, K)x(K, C_pad)-sized — cheap at 6-pass.
        acc = acc + jax.lax.dot_general(
            w, colors,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (P, C_pad)

        inc_log1m = jnp.where(include, log1m, 0.0)
        t_all = t_all * jnp.exp(jnp.sum(log1m, axis=1, keepdims=True))
        t_incl = t_incl * jnp.exp(jnp.sum(inc_log1m, axis=1, keepdims=True))

        # n_contrib = count of included contributions (see blend.py).
        contrib = contrib + jnp.sum(include.astype(jnp.int32), axis=1, keepdims=True)
        return ci + 1, t_all, t_incl, contrib, acc

    init = (
        c0,
        jnp.ones((p, 1), jnp.float32),
        jnp.ones((p, 1), jnp.float32),
        jnp.zeros((p, 1), jnp.int32),
        jnp.zeros((p, c_pad), jnp.float32),
    )
    ci_end, t_all, t_incl, contrib, acc = lax.while_loop(cond, body, init)

    # Drain the speculative prefetch left in flight by an early exit.
    @pl.when((ci_end < c1) & (c0 < c1))
    def _():
        dma(ci_end).wait()

    tiles_ref[0, :, :] = acc + t_incl * bg_ref[0, :].reshape(1, c_pad)
    final_t_ref[0, :, :] = t_incl
    n_contrib_ref[0, :, :] = contrib


def _fwd_call(inst, tile_starts, bg_pad, *, num_tiles, grid_x, tile_size, c_pad):
    p = tile_size * tile_size
    f = inst.shape[0]
    kernel = functools.partial(
        _fwd_kernel, grid_x=grid_x, tile_size=tile_size, c_pad=c_pad
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, p, c_pad), lambda t, s: (t, 0, 0)),
            pl.BlockSpec((1, p, 1), lambda t, s: (t, 0, 0)),
            pl.BlockSpec((1, p, 1), lambda t, s: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, f, chunk_for(tile_size, "fwd")), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, p, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, p, 1), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, p, 1), jnp.int32),
        ],
        interpret=_interpret(),
    )(tile_starts, inst, bg_pad)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

# SMEM state slots (persist across sequential grid steps).
_PENDING_CI = 0  # chunk index withheld in the pending buffer, or -1
_WR_BUSY0 = 1  # write-DMA outstanding flag for gacc slot 0
_WR_BUSY1 = 2  # write-DMA outstanding flag for gacc slot 1


def _bwd_kernel(
    starts_ref,  # scalar prefetch
    inst_ref,  # (F, M) HBM
    g_tiles_ref,  # (1, P, C_pad)
    g_final_t_ref,  # (1, P, 1)
    out_tiles_ref,  # (1, P, C_pad) forward output (residual)
    final_t_ref,  # (1, P, 1) forward final_T (residual)
    bg_ref,  # (1, C_pad)
    dinst_in_ref,  # (F, M) HBM — zero-init, aliased to output
    dinst_ref,  # out (F, M) HBM — single-writer per chunk
    slab_ref,  # scratch (2, F, K) — double-buffered input slabs
    gacc_ref,  # scratch (2, F, K) — double-buffered gradient output slabs
    pending_ref,  # scratch (F, K) — boundary chunk carried across tiles
    state_ref,  # scratch SMEM (4,) int32
    copy_sem,  # DMA sems (2,)
    wr_sem,  # DMA sems (2,)
    *,
    grid_x: int,
    tile_size: int,
    c_pad: int,
):
    del dinst_in_ref  # aliased with dinst_ref
    t = pl.program_id(0)
    num_tiles = pl.num_programs(0)
    p = tile_size * tile_size
    k = chunk_for(tile_size, "bwd")

    @pl.when(t == 0)
    def _():
        state_ref[_PENDING_CI] = -1
        state_ref[_WR_BUSY0] = 0
        state_ref[_WR_BUSY1] = 0

    start = starts_ref[t]
    end = starts_ref[t + 1]
    next_start = starts_ref[jnp.minimum(t + 1, num_tiles)]
    c0 = start // k
    c1 = lax.div(end + k - 1, k)
    # The last chunk is shared with a later tile iff the range boundary is not
    # chunk-aligned (tile ranges are contiguous: starts[t+1] == end).
    last_shared = (t < num_tiles - 1) & (next_start < c1 * k) & (next_start > (c1 - 1) * k)

    tx0, ty0 = _tile_origin(t, grid_x, tile_size)
    basis = _pixel_basis(tile_size, p)
    tri = _tri_excl(k)

    g_pix = g_tiles_ref[0, :, :]  # (P, C_pad)
    g_t = g_final_t_ref[0, :, :]  # (P, 1)
    t_end = final_t_ref[0, :, :]  # (P, 1)
    bg = bg_ref[0, :].reshape(1, c_pad)
    out_pix = out_tiles_ref[0, :, :]  # (P, C_pad)

    # U_total,p = Σ_j u_j,p = g·(out − T_end·bg); suffix S_i = U_total − U_prefix_i.
    g_dot_bg = jnp.sum(g_pix * bg, axis=1, keepdims=True)  # (P, 1)
    u_total = jnp.sum(g_pix * out_pix, axis=1, keepdims=True) - t_end * g_dot_bg

    # Terms multiplying −1/(1−α_i): background + final_T cotangent.
    tail_const = (g_dot_bg + g_t) * t_end  # (P, 1)

    def dma(ci):
        slot = lax.rem(ci, 2)
        return pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(ci * k, k)], slab_ref.at[slot], copy_sem.at[slot]
        )

    def wr_dma(slot, ci):
        return pltpu.make_async_copy(
            gacc_ref.at[slot], dinst_ref.at[:, pl.ds(ci * k, k)], wr_sem.at[slot]
        )

    def write_chunk(ci, grad_rows):
        """Single write of a chunk's gradients, double-buffered."""
        slot = lax.rem(ci, 2)

        @pl.when(state_ref[_WR_BUSY0 + slot] == 1)
        def _():
            # Free the slot: wait for the write issued 2 chunks ago.
            pltpu.make_async_copy(
                gacc_ref.at[slot], gacc_ref.at[slot], wr_sem.at[slot]
            ).wait()

        gacc_ref[slot] = grad_rows
        wr_dma(slot, ci).start()
        state_ref[_WR_BUSY0 + slot] = 1

    @pl.when(c0 < c1)
    def _():
        dma(c0).start()

    def cond(carry):
        ci, t_all, _ = carry
        return (ci < c1) & (jnp.max(t_all) >= T_EPS)

    def body(carry):
        ci, t_all, u_prefix = carry

        @pl.when(ci + 1 < c1)
        def _():
            dma(ci + 1).start()

        dma(ci).wait()
        slab = slab_ref[lax.rem(ci, 2)]
        row0 = ci * k
        colors = slab[COLOR_OFFSET : COLOR_OFFSET + c_pad, :]  # (C_pad, K)

        alpha, s, rows = _chunk_alpha(slab, basis, tx0, ty0, row0, start, end, k)
        gx, gy, ca, cb, cc, opa, log_opa = rows  # (1, K) each; gx/gy tile-local

        log1m = jnp.log1p(-alpha)
        cum_excl = _excl_cumsum_lanes(log1m, tri)
        t_before = t_all * jnp.exp(cum_excl)
        t_after = t_before * (1.0 - alpha)
        include = (t_after >= T_EPS) & (alpha > 0.0)
        w = jnp.where(include, alpha * t_before, 0.0)  # (P, K)

        # dL/dc_i = Σ_p g_p ⊗ w_i,p  → (C_pad, K) matmul.
        d_colors = jax.lax.dot_general(
            g_pix, w,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        # u_i,p = (g·c_i) w_i,p ; inclusive prefix along instances.
        g_dot_c = jax.lax.dot_general(
            g_pix, colors,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (P, K)
        u = g_dot_c * w
        u_cum_excl = _excl_cumsum_lanes(u, tri)
        u_prefix_i = u_prefix + u_cum_excl + u  # inclusive (P, K)
        suffix = u_total - u_prefix_i  # Σ_{j>i} u_j

        one_m_alpha = jnp.maximum(1.0 - alpha, 1e-6)
        d_alpha = jnp.where(
            include,
            g_dot_c * t_before - (suffix + tail_const) / one_m_alpha,
            0.0,
        )  # (P, K)

        # α = min(0.99, exp(s)): zero gradient through the clamp.  Where
        # unclamped, ∂α/∂s = α, so the per-pixel cotangent of s is
        # d_s = d_alpha_u·α.  Every per-instance gradient row is a weighted
        # pixel-polynomial moment of d_s: dx = gx−px is linear in (px,py), so
        # dx², dx·dy, … expand over the SAME quadratic basis the forward uses.
        # basisᵀ·d_s is therefore ONE (8,P)x(P,K) MXU matmul that yields all
        # six moments [m0, Σpx·d_s, Σpy·d_s, Σpx²·d_s, Σpy²·d_s, Σpx·py·d_s];
        # the conic/mean/opacity rows reduce to (1,K) VPU expressions of them
        # (gradient semantics parity: backward.cu:399-557).
        unclamped = (alpha < ALPHA_MAX) & include
        d_alpha_u = jnp.where(unclamped, d_alpha, 0.0)
        d_s = d_alpha_u * alpha  # (P, K)
        moments = jax.lax.dot_general(
            basis, d_s,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (8, K)
        m0 = moments[0:1, :]
        mx = moments[1:2, :]
        my = moments[2:3, :]
        mxx = moments[3:4, :]
        myy = moments[4:5, :]
        mxy = moments[5:6, :]
        # s = power + log(opa) ⇒ ∂s/∂opa = 1/opa (opa ≥ 1/255 wherever d_s≠0).
        d_opa = m0 / jnp.maximum(opa, 1e-12)
        # Σ dx²·d_s = gx²·m0 − 2gx·mx + mxx, etc. (dx = gx − px, tile-local).
        d_ca = -0.5 * (gx * gx * m0 - 2.0 * gx * mx + mxx)
        d_cb = -(gx * gy * m0 - gx * my - gy * mx + mxy)
        d_cc = -0.5 * (gy * gy * m0 - 2.0 * gy * my + myy)
        d_gx = -(ca * (gx * m0 - mx) + cb * (gy * m0 - my))
        d_gy = -(cc * (gy * m0 - my) + cb * (gx * m0 - mx))

        grad_rows = jnp.concatenate(
            [d_gx, d_gy, d_ca, d_cb, d_cc, d_opa,
             jnp.zeros((2, k), jnp.float32), d_colors],
            axis=0,
        )  # (F, K)

        # Merge the boundary partial carried from the previous tile (tile
        # ranges are contiguous, so a live pending chunk is always this
        # tile's first chunk).
        pending_ci = state_ref[_PENDING_CI]
        grad_rows = jnp.where(ci == pending_ci, grad_rows + pending_ref[:, :], grad_rows)

        @pl.when(ci == pending_ci)
        def _():
            state_ref[_PENDING_CI] = -1

        withhold = (ci == c1 - 1) & last_shared

        @pl.when(withhold)
        def _():
            pending_ref[:, :] = grad_rows
            state_ref[_PENDING_CI] = ci

        @pl.when(jnp.logical_not(withhold))
        def _():
            write_chunk(ci, grad_rows)

        t_all = t_all * jnp.exp(jnp.sum(log1m, axis=1, keepdims=True))
        u_prefix = u_prefix + jnp.sum(u, axis=1, keepdims=True)
        return ci + 1, t_all, u_prefix

    init = (c0, jnp.ones((p, 1), jnp.float32), jnp.zeros((p, 1), jnp.float32))
    ci_end, _, _ = lax.while_loop(cond, body, init)

    @pl.when((ci_end < c1) & (c0 < c1))
    def _():
        dma(ci_end).wait()

    # Final tile: flush the pending boundary chunk and drain write DMAs.
    @pl.when(t == num_tiles - 1)
    def _():
        pending_ci = state_ref[_PENDING_CI]

        @pl.when(pending_ci >= 0)
        def _():
            write_chunk(pending_ci, pending_ref[:, :])

        @pl.when(state_ref[_WR_BUSY0] == 1)
        def _():
            pltpu.make_async_copy(gacc_ref.at[0], gacc_ref.at[0], wr_sem.at[0]).wait()

        @pl.when(state_ref[_WR_BUSY1] == 1)
        def _():
            pltpu.make_async_copy(gacc_ref.at[1], gacc_ref.at[1], wr_sem.at[1]).wait()


def _bwd_call(
    inst, tile_starts, g_tiles, g_final_t, out_tiles, final_t, bg_pad,
    *, num_tiles, grid_x, tile_size, c_pad,
):
    p = tile_size * tile_size
    f, m = inst.shape
    kernel = functools.partial(
        _bwd_kernel, grid_x=grid_x, tile_size=tile_size, c_pad=c_pad
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # inst
            pl.BlockSpec((1, p, c_pad), lambda t, s: (t, 0, 0)),  # g_tiles
            pl.BlockSpec((1, p, 1), lambda t, s: (t, 0, 0)),  # g_final_t
            pl.BlockSpec((1, p, c_pad), lambda t, s: (t, 0, 0)),  # out_tiles
            pl.BlockSpec((1, p, 1), lambda t, s: (t, 0, 0)),  # final_t
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bg
            pl.BlockSpec(memory_space=pl.ANY),  # dinst init (aliased)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # dinst
        ],
        scratch_shapes=[
            pltpu.VMEM((2, f, chunk_for(tile_size, "bwd")), jnp.float32),
            pltpu.VMEM((2, f, chunk_for(tile_size, "bwd")), jnp.float32),
            pltpu.VMEM((f, chunk_for(tile_size, "bwd")), jnp.float32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # The dinst-init zeros are overall input index 7 (aliasing indices count
    # the scalar-prefetch arg); aliasing to output 0 keeps unwritten
    # (post-saturation) chunks zero.
    dinst = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((f, m), jnp.float32)],
        input_output_aliases={7: 0},
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_starts, inst, g_tiles, g_final_t, out_tiles, final_t, bg_pad,
      jnp.zeros((f, m), jnp.float32))
    return dinst[0]


# ---------------------------------------------------------------------------
# custom_vjp wrapper with blend.py-compatible signature
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _blend_cvjp(
    gauss_id, tile_id, tile_starts, means2d, conics, opacities, colors, bg,
    grid_x, grid_y, tile_size,
):
    out, _ = _blend_fwd(
        gauss_id, tile_id, tile_starts, means2d, conics, opacities, colors, bg,
        grid_x, grid_y, tile_size,
    )
    return out


def _blend_fwd(
    gauss_id, tile_id, tile_starts, means2d, conics, opacities, colors, bg,
    grid_x, grid_y, tile_size,
):
    del tile_id
    num_tiles = grid_x * grid_y
    c = colors.shape[-1]
    c_pad = _pad_channels(c)
    m = gauss_id.shape[0]
    ck = pad_chunk_for(tile_size)
    m_pad = ((m + ck - 1) // ck) * ck
    inst = _pack_instances(gauss_id, means2d, conics, opacities, colors, m_pad)
    bg_pad = jnp.pad(bg.reshape(1, -1), ((0, 0), (0, c_pad - c)))
    tiles, final_t, n_contrib = _fwd_call(
        inst, tile_starts, bg_pad,
        num_tiles=num_tiles, grid_x=grid_x, tile_size=tile_size, c_pad=c_pad,
    )
    p = tile_size * tile_size
    out = BlendOutput(
        tiles=tiles[:, :, :c],
        final_t=final_t.reshape(num_tiles, p),
        n_contrib=n_contrib.reshape(num_tiles, p),
    )
    res = (gauss_id, tile_starts, inst, tiles, final_t, bg_pad, means2d.shape[0], c)
    return out, res


def segment_reduce_by_rank(dinst, key_ranks, rows, n, total):
    """Deterministic instance→Gaussian gradient reduction.

    One (F', M) → (M, F') transpose followed by a single row scatter-add
    keyed on the Gaussian rank.  XLA scatter applies updates in a fixed
    order on TPU, so the reduction is deterministic; with the tile-major
    piecewise-ascending rank keys it measured 13.1 ms vs 23.1 ms for the
    round-3/4 stable-sort + segment-cumsum epilogue at M = 687k, F' = 9
    (tools/bench_epilogue.py on TPU v5e — the sort's payload traffic, not
    the keying, was the cost).

    Args: ``dinst`` (F, M) per-instance grads; ``key_ranks`` (M,) Gaussian
    rank per instance; ``rows`` the field-row indices to reduce; ``total``
    the live instance count (instances ≥ total are dropped).
    Returns (N, len(rows)).
    """
    m = key_ranks.shape[0]
    key = jnp.where(
        jnp.arange(m, dtype=jnp.int32) < total, key_ranks, jnp.int32(n)
    )
    sel = jnp.stack([dinst[r] for r in rows], axis=0)  # (F', M)
    return (
        jnp.zeros((n, len(rows)), jnp.float32).at[key].add(sel.T, mode="drop")
    )


def _blend_bwd(grid_x, grid_y, tile_size, res, g):
    gauss_id, tile_starts, inst, tiles, final_t, bg_pad, n, c = res
    num_tiles = grid_x * grid_y
    c_pad = _pad_channels(c)
    p = tile_size * tile_size

    g_tiles = g.tiles
    g_final_t = g.final_t
    if g_tiles is None:
        g_tiles = jnp.zeros((num_tiles, p, c), jnp.float32)
    if g_final_t is None:
        g_final_t = jnp.zeros((num_tiles, p), jnp.float32)
    if c_pad != c:
        g_tiles = jnp.pad(g_tiles, ((0, 0), (0, 0), (0, c_pad - c)))

    dinst = _bwd_call(
        inst, tile_starts, g_tiles,
        g_final_t.reshape(num_tiles, p, 1), tiles, final_t, bg_pad,
        num_tiles=num_tiles, grid_x=grid_x, tile_size=tile_size, c_pad=c_pad,
    )  # (F, M_pad)

    m = gauss_id.shape[0]
    rows = list(range(6)) + list(range(COLOR_OFFSET, COLOR_OFFSET + c))
    if dinst.shape[1] != m:
        dinst = dinst[:, :m]
    seg = segment_reduce_by_rank(dinst, gauss_id, rows, n, tile_starts[-1])

    d_means2d = seg[:, 0:2]
    d_conics = seg[:, 2:5]
    d_opac = seg[:, 5]
    d_colors = seg[:, 6 : 6 + c]

    # d bg = Σ_pixels g ⊙ T_end.
    ft = final_t.reshape(num_tiles, p)
    d_bg = jnp.einsum("tpc,tp->c", g.tiles, ft) if g.tiles is not None else jnp.zeros((c,))

    zero_i = np.zeros(gauss_id.shape, jax.dtypes.float0)
    zero_t = np.zeros(tile_starts.shape, jax.dtypes.float0)
    return (zero_i, zero_i, zero_t, d_means2d, d_conics, d_opac, d_colors, d_bg)


_blend_cvjp.defvjp(
    lambda *args: _blend_fwd(*args),
    _blend_bwd,
)


def blend(
    gauss_id, tile_id, tile_starts, means2d, conics, opacities, colors, bg,
    grid_x, grid_y, tile_size,
) -> BlendOutput:
    """Pallas-accelerated blend with blend.py-compatible signature."""
    return _blend_cvjp(
        gauss_id, tile_id, tile_starts, means2d, conics, opacities, colors,
        bg, grid_x, grid_y, tile_size,
    )


# ---------------------------------------------------------------------------
# Fused bin+pack+blend: sort keys AND field payloads together
# ---------------------------------------------------------------------------
#
# The round-2 pipeline sorted instance keys alone (binning), then row-gathered
# the per-Gaussian fields into sorted instance order (_pack_instances).  The
# (M, F) row gather was ~40% of forward wall-clock (tools/profile_raster.py)
# while the XLA sort's cost is nearly independent of payload-column count
# (tools/bench_primitives.py: key+1 and key+9 sort at the same speed).  This
# path therefore expands each field to slot order with cheap *ascending* 1-D
# gathers and carries all field columns through ONE sort as payloads.


def _fused_sort(slot_rank, slot_tile, expanded, n, num_tiles):
    """Sort slot-order instances by (tile, depth rank), carrying payloads.

    Returns (gauss_s, tile_starts, payload) with gauss_s == n for padding.
    """
    m = slot_rank.shape[0]
    rank_bits = max(1, int(np.ceil(np.log2(max(n, 2)))))
    tile_bits = int(np.ceil(np.log2(num_tiles + 2)))
    boundaries = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    if rank_bits + tile_bits <= 31:
        key = jnp.where(
            slot_tile < num_tiles,
            (slot_tile << rank_bits) | slot_rank,
            jnp.int32(num_tiles << rank_bits),
        )
        sorted_ = lax.sort((key,) + expanded, num_keys=1, is_stable=False)
        key_s = sorted_[0]
        payload = sorted_[1:]
        tile_starts = jnp.searchsorted(
            key_s, boundaries << rank_bits, side="left"
        ).astype(jnp.int32)
        sentinel = jnp.int32(num_tiles << rank_bits)
        gauss_s = jnp.where(
            key_s < sentinel, key_s & jnp.int32((1 << rank_bits) - 1), jnp.int32(n)
        )
    else:
        sorted_ = lax.sort(
            (slot_tile, slot_rank) + expanded, num_keys=2, is_stable=False
        )
        tile_s, rank_s = sorted_[0], sorted_[1]
        payload = sorted_[2:]
        tile_starts = jnp.searchsorted(tile_s, boundaries, side="left").astype(
            jnp.int32
        )
        gauss_s = jnp.where(tile_s < num_tiles, rank_s, jnp.int32(n))
    return gauss_s, tile_starts, payload


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _fused_cvjp(slot_rank, slot_tile, fields, bg, c, grid_x, grid_y, tile_size):
    out, _ = _fused_fwd(
        slot_rank, slot_tile, fields, bg, c, grid_x, grid_y, tile_size
    )
    return out


def _fused_fwd(slot_rank, slot_tile, fields, bg, c, grid_x, grid_y, tile_size):
    n = fields[0].shape[0]
    num_tiles = grid_x * grid_y
    c_pad = _pad_channels(c)
    m = orig_m = slot_rank.shape[0]
    ck = pad_chunk_for(tile_size)
    if m % ck:
        pad = ck - m % ck
        slot_rank = jnp.pad(slot_rank, (0, pad))
        slot_tile = jnp.pad(slot_tile, (0, pad), constant_values=num_tiles)
        m += pad

    # ONE (M, F) row gather packs every field column at once — measured 6x
    # cheaper than F separate (M,) column gathers (round-4 microbench:
    # (M,8) row gather 9.6 ms vs ~18 ms per column; the per-column variant
    # was 80% of the old 193 ms "sort" stage).  slot_rank is ascending →
    # memory-coherent.
    table = jnp.stack(fields, axis=-1)  # (N, F)
    packed = table[slot_rank]  # (M, F)
    expanded = tuple(packed[:, i] for i in range(len(fields)))
    gauss_s, tile_starts, payload = _fused_sort(
        slot_rank, slot_tile, expanded, n, num_tiles
    )

    zeros_m = jnp.zeros((m,), jnp.float32)
    rows = (
        list(payload[:6])
        + [zeros_m, zeros_m]
        + list(payload[6 : 6 + c])
        + [zeros_m] * (c_pad - c)
    )
    inst = jnp.stack(rows, axis=0)  # (F, M) — instances on lanes

    bg_pad = jnp.pad(bg.reshape(1, -1), ((0, 0), (0, c_pad - c)))
    tiles, final_t, n_contrib = _fwd_call(
        inst, tile_starts, bg_pad,
        num_tiles=num_tiles, grid_x=grid_x, tile_size=tile_size, c_pad=c_pad,
    )
    p = tile_size * tile_size
    out = BlendOutput(
        tiles=tiles[:, :, :c],
        final_t=final_t.reshape(num_tiles, p),
        n_contrib=n_contrib.reshape(num_tiles, p),
    )
    res = (gauss_s, tile_starts, inst, tiles, final_t, bg_pad, n, orig_m)
    return out, res


def _fused_bwd(c, grid_x, grid_y, tile_size, res, g):
    gauss_s, tile_starts, inst, tiles, final_t, bg_pad, n, orig_m = res
    num_tiles = grid_x * grid_y
    c_pad = _pad_channels(c)
    p = tile_size * tile_size
    m = gauss_s.shape[0]

    g_tiles = g.tiles
    g_final_t = g.final_t
    if g_tiles is None:
        g_tiles = jnp.zeros((num_tiles, p, c), jnp.float32)
    if g_final_t is None:
        g_final_t = jnp.zeros((num_tiles, p), jnp.float32)
    if c_pad != c:
        g_tiles = jnp.pad(g_tiles, ((0, 0), (0, 0), (0, c_pad - c)))

    dinst = _bwd_call(
        inst, tile_starts, g_tiles,
        g_final_t.reshape(num_tiles, p, 1), tiles, final_t, bg_pad,
        num_tiles=num_tiles, grid_x=grid_x, tile_size=tile_size, c_pad=c_pad,
    )  # (F, M)

    rows = list(range(6)) + list(range(COLOR_OFFSET, COLOR_OFFSET + c))
    seg = segment_reduce_by_rank(dinst, gauss_s, rows, n, tile_starts[-1])
    d_fields = tuple(seg[:, i] for i in range(len(rows)))

    ft = final_t.reshape(num_tiles, p)
    d_bg = (
        jnp.einsum("tpc,tp->c", g.tiles, ft)
        if g.tiles is not None
        else jnp.zeros((c,), jnp.float32)
    )

    zero_rank = np.zeros((orig_m,), jax.dtypes.float0)
    return (zero_rank, zero_rank, d_fields, d_bg)


_fused_cvjp.defvjp(
    lambda *args: _fused_fwd(*args),
    _fused_bwd,
)


# ---------------------------------------------------------------------------
# Sort-free blend: consume analytic (tile, depth) destinations
# ---------------------------------------------------------------------------
#
# `binning.plan_instances` computes each instance's sorted position in closed
# form (no lax.sort — the 193 ms bottleneck of the fused path, BASELINE.md
# round-4 profile).  The forward packs the instance matrix with small
# N-table gathers indexed by the sorted Gaussian ranks; the backward reduces
# per-instance gradients straight to Gaussians with one deterministic
# scatter-add per field row — the sort+cumsum epilogue disappears too.


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _sortfree_cvjp(sorted_gauss, tile_starts, fields, bg, c, grid_x, grid_y, tile_size):
    out, _ = _sortfree_fwd(
        sorted_gauss, tile_starts, fields, bg, c, grid_x, grid_y, tile_size
    )
    return out


def _sortfree_fwd(sorted_gauss, tile_starts, fields, bg, c, grid_x, grid_y, tile_size):
    n = fields[0].shape[0]
    num_tiles = grid_x * grid_y
    c_pad = _pad_channels(c)
    m = orig_m = sorted_gauss.shape[0]
    ck = pad_chunk_for(tile_size)
    if m % ck:
        pad = ck - m % ck
        sorted_gauss = jnp.pad(sorted_gauss, (0, pad))
        m += pad

    # Pack in sorted order: each field column is an N-table (cache-resident)
    # gather by the sorted Gaussian rank.
    expanded = tuple(f[sorted_gauss] for f in fields)
    zeros_m = jnp.zeros((m,), jnp.float32)
    rows = (
        list(expanded[:6])
        + [zeros_m, zeros_m]
        + list(expanded[6 : 6 + c])
        + [zeros_m] * (c_pad - c)
    )
    inst = jnp.stack(rows, axis=0)  # (F, M)

    bg_pad = jnp.pad(bg.reshape(1, -1), ((0, 0), (0, c_pad - c)))
    tiles, final_t, n_contrib = _fwd_call(
        inst, tile_starts, bg_pad,
        num_tiles=num_tiles, grid_x=grid_x, tile_size=tile_size, c_pad=c_pad,
    )
    p = tile_size * tile_size
    out = BlendOutput(
        tiles=tiles[:, :, :c],
        final_t=final_t.reshape(num_tiles, p),
        n_contrib=n_contrib.reshape(num_tiles, p),
    )
    res = (sorted_gauss, tile_starts, inst, tiles, final_t, bg_pad, n, orig_m)
    return out, res


def _sortfree_bwd(c, grid_x, grid_y, tile_size, res, g):
    sorted_gauss, tile_starts, inst, tiles, final_t, bg_pad, n, orig_m = res
    num_tiles = grid_x * grid_y
    c_pad = _pad_channels(c)
    p = tile_size * tile_size

    g_tiles = g.tiles
    g_final_t = g.final_t
    if g_tiles is None:
        g_tiles = jnp.zeros((num_tiles, p, c), jnp.float32)
    if g_final_t is None:
        g_final_t = jnp.zeros((num_tiles, p), jnp.float32)
    if c_pad != c:
        g_tiles = jnp.pad(g_tiles, ((0, 0), (0, 0), (0, c_pad - c)))

    dinst = _bwd_call(
        inst, tile_starts, g_tiles,
        g_final_t.reshape(num_tiles, p, 1), tiles, final_t, bg_pad,
        num_tiles=num_tiles, grid_x=grid_x, tile_size=tile_size, c_pad=c_pad,
    )  # (F, M)

    # Instance → Gaussian reduction: deterministic scatter-add per field row
    # (XLA scatter on TPU applies updates in a fixed order).  Rows past the
    # live instance count are zero (the backward kernel masks out-of-segment
    # lanes and never writes post-saturation chunks), so no masking needed.
    rows = list(range(6)) + list(range(COLOR_OFFSET, COLOR_OFFSET + c))
    d_fields = tuple(
        jnp.zeros((n,), jnp.float32).at[sorted_gauss].add(dinst[r], mode="drop")
        for r in rows
    )

    ft = final_t.reshape(num_tiles, p)
    d_bg = (
        jnp.einsum("tpc,tp->c", g.tiles, ft)
        if g.tiles is not None
        else jnp.zeros((c,), jnp.float32)
    )

    zero_g = np.zeros((orig_m,), jax.dtypes.float0)
    zero_t = np.zeros(tile_starts.shape, jax.dtypes.float0)
    return (zero_g, zero_t, d_fields, d_bg)


_sortfree_cvjp.defvjp(
    lambda *args: _sortfree_fwd(*args),
    _sortfree_bwd,
)


def blend_sortfree(
    sorted_gauss, tile_starts, fields, bg, grid_x, grid_y, tile_size
) -> BlendOutput:
    """Sort-free blend over an ``InstancePlan``'s analytic destinations.

    ``fields`` is a tuple of (N,) f32 columns in DEPTH-SORTED Gaussian order
    (mean_x, mean_y, conic_a, conic_b, conic_c, opacity, color_0, ...);
    ``sorted_gauss``/``tile_starts`` come from ``binning.plan_instances``.
    Gradients flow to each field column and ``bg``.
    """
    c = len(fields) - 6
    return _sortfree_cvjp(
        sorted_gauss, tile_starts, tuple(fields), bg, c, grid_x, grid_y, tile_size
    )


def blend_fused(
    slot_rank, slot_tile, fields, bg, grid_x, grid_y, tile_size
) -> BlendOutput:
    """Fused bin-sort + pack + blend (Pallas path).

    ``fields`` is a tuple of (N,) f32 columns in DEPTH-SORTED Gaussian order:
    (mean_x, mean_y, conic_a, conic_b, conic_c, opacity, color_0, ...).
    ``slot_rank``/``slot_tile`` come from ``binning.expand_slots``.  Returns
    gradients w.r.t. each field column and ``bg``.
    """
    c = len(fields) - 6
    return _fused_cvjp(
        slot_rank, slot_tile, tuple(fields), bg, c, grid_x, grid_y, tile_size
    )
