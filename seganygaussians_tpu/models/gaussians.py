"""Gaussian scene model as a pytree over fixed-capacity buffers.

TPU-first re-design of ``GaussianModel`` (`scene/gaussian_model.py:44-583`).
The reference grows/shrinks parameter tensors in place (densify/clone/split/
prune re-allocate every 100 iterations) — anathema to XLA's static shapes.
Here the state is a fixed-capacity ``(C, ...)`` buffer family with an ``alive``
mask:

* dead slots are culled in the rasterizer preprocess (``active_mask``), so
  they cost no tile instances and receive zero gradients;
* densification *clones into dead slots* (masked scatter) instead of
  concatenating — every step has the same compiled shape;
* pruning just clears ``alive`` bits;
* optimizer state surgery (zero moments for new rows,
  `scene/gaussian_model.py:482-494`) is a masked row write.

Parameters are stored pre-activation exactly like the reference: log scales,
inverse-sigmoid opacities, unnormalised quaternions (`gaussian_model.py:26-41`).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from seganygaussians_tpu.models import optim
from seganygaussians_tpu.ops.knn import mean_sq_dist_to_3nn
from seganygaussians_tpu.ops.sh import rgb2sh
from seganygaussians_tpu.ops.transforms import (
    build_covariance_3d,
    build_rotation,
    inverse_sigmoid,
)


class GaussianParams(NamedTuple):
    """Learnable per-Gaussian parameters (pre-activation), capacity-padded.

    Field layout mirrors `scene/gaussian_model.py:48-53`; ``features_dc`` and
    ``features_rest`` hold SH coefficients as (C, n_coeff, 3).
    """

    xyz: jnp.ndarray  # (C, 3)
    features_dc: jnp.ndarray  # (C, 1, 3)
    features_rest: jnp.ndarray  # (C, (deg+1)^2 - 1, 3)
    scaling: jnp.ndarray  # (C, 3) log-space
    rotation: jnp.ndarray  # (C, 4) unnormalised quats (w, x, y, z)
    opacity: jnp.ndarray  # (C, 1) pre-sigmoid


class GaussianState(NamedTuple):
    """Full training state: params + liveness + densification stats + Adam."""

    params: GaussianParams
    alive: jnp.ndarray  # (C,) bool
    seg_mask: jnp.ndarray  # (C,) float — the reference's `_mask` label
    max_radii2d: jnp.ndarray  # (C,) float32
    xyz_grad_accum: jnp.ndarray  # (C,) float32
    denom: jnp.ndarray  # (C,) float32
    opt: optim.AdamState


@dataclasses.dataclass(frozen=True)
class TrainHyper:
    """Optimization hyperparameters (defaults = `arguments/__init__.py:79-113`)."""

    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002


# --------------------------------------------------------------------------
# Activations (`scene/gaussian_model.py:26-41`)
# --------------------------------------------------------------------------


def get_scaling(params: GaussianParams) -> jnp.ndarray:
    return jnp.exp(params.scaling)


def get_opacity(params: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(params.opacity)


def get_rotation(params: GaussianParams) -> jnp.ndarray:
    return params.rotation / jnp.linalg.norm(
        params.rotation, axis=-1, keepdims=True
    ).clip(1e-12)


def get_covariance(params: GaussianParams, scale_modifier: float = 1.0) -> jnp.ndarray:
    return build_covariance_3d(get_scaling(params), get_rotation(params), scale_modifier)


def get_shs(params: GaussianParams) -> jnp.ndarray:
    """(C, 3, n_coeff) SH layout consumed by eval_sh (channels first)."""
    feats = jnp.concatenate([params.features_dc, params.features_rest], axis=1)
    return feats.transpose(0, 2, 1)


def num_alive(state: GaussianState) -> jnp.ndarray:
    return jnp.sum(state.alive.astype(jnp.int32))


# --------------------------------------------------------------------------
# Construction
# --------------------------------------------------------------------------


def create_from_points(
    points: np.ndarray,  # (N, 3)
    colors: np.ndarray,  # (N, 3) in [0, 1]
    sh_degree: int,
    capacity: int,
) -> GaussianState:
    """Initialise from an SfM point cloud (`scene/gaussian_model.py:140-169`):
    DC SH from RGB, log-scale from sqrt(mean 3-NN squared distance), identity
    quats, opacity 0.1."""
    n = points.shape[0]
    assert n <= capacity, f"{n} points > capacity {capacity}"
    rest = (sh_degree + 1) ** 2 - 1

    xyz = jnp.asarray(points, jnp.float32)
    dist2 = jnp.maximum(mean_sq_dist_to_3nn(xyz), 1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    def pad(a, fill=0.0):
        widths = [(0, capacity - n)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths, constant_values=fill)

    params = GaussianParams(
        xyz=pad(xyz),
        features_dc=pad(rgb2sh(jnp.asarray(colors, jnp.float32))[:, None, :]),
        features_rest=jnp.zeros((capacity, rest, 3), jnp.float32),
        scaling=pad(scales),
        rotation=pad(
            jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (n, 1)), fill=1.0
        ),
        opacity=pad(inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32))),
    )
    alive = jnp.arange(capacity) < n
    return GaussianState(
        params=params,
        alive=alive,
        seg_mask=alive.astype(jnp.float32),
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        xyz_grad_accum=jnp.zeros((capacity,), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
        opt=optim.adam_init(params),
    )


def make_lr_tree(h: TrainHyper, spatial_lr_scale: float, step) -> GaussianParams:
    """Per-leaf LR pytree for adam_update (`gaussian_model.py:175-199`)."""
    xyz_lr = optim.expon_lr(
        step,
        h.position_lr_init * spatial_lr_scale,
        h.position_lr_final * spatial_lr_scale,
        lr_delay_mult=h.position_lr_delay_mult,
        max_steps=h.position_lr_max_steps,
    )
    return GaussianParams(
        xyz=xyz_lr,
        features_dc=jnp.asarray(h.feature_lr),
        features_rest=jnp.asarray(h.feature_lr / 20.0),
        scaling=jnp.asarray(h.scaling_lr),
        rotation=jnp.asarray(h.rotation_lr),
        opacity=jnp.asarray(h.opacity_lr),
    )


# --------------------------------------------------------------------------
# Densification (pure, static shapes)
# --------------------------------------------------------------------------


def add_densification_stats(
    state: GaussianState,
    ndc_grad: jnp.ndarray,  # (C, 2) gradient w.r.t. the NDC offset
    radii: jnp.ndarray,  # (C,) int32 from the rasterizer
) -> GaussianState:
    """Accumulate view-space positional gradient norms for visible Gaussians
    (`gaussian_model.py:582-584`) and the running max screen radius
    (`train_scene.py:126-127`)."""
    visible = radii > 0
    gnorm = jnp.linalg.norm(ndc_grad, axis=-1)
    return state._replace(
        xyz_grad_accum=state.xyz_grad_accum + jnp.where(visible, gnorm, 0.0),
        denom=state.denom + visible.astype(jnp.float32),
        max_radii2d=jnp.where(
            visible,
            jnp.maximum(state.max_radii2d, radii.astype(jnp.float32)),
            state.max_radii2d,
        ),
    )


def _scatter_clones(
    params: GaussianParams,
    opt: optim.AdamState,
    alive: jnp.ndarray,
    sel: jnp.ndarray,  # (C,) bool source rows
    new_rows: GaussianParams,  # (C, ...) values aligned with source rows
    copy_index: int,
    n_copies: int,
) -> tuple[GaussianParams, optim.AdamState, jnp.ndarray]:
    """Write ``new_rows[sel]`` into dead slots (copy ``copy_index`` of
    ``n_copies``).  Returns updated (params, opt, alive).  Writes beyond the
    available dead-slot pool are dropped (capacity overflow ⇒ silently skip,
    the XLA analogue of running out of memory for a cat)."""
    c = alive.shape[0]
    dead_idx = jnp.argsort(alive)  # dead slots first, ascending index (stable)
    num_dead = c - jnp.sum(alive.astype(jnp.int32))
    sel_rank = jnp.cumsum(sel) - 1  # rank among selected, valid where sel
    num_sel = jnp.sum(sel.astype(jnp.int32))

    slot_rank = copy_index * num_sel + sel_rank
    ok = sel & (slot_rank < num_dead)
    dest = jnp.where(ok, dead_idx[jnp.clip(slot_rank, 0, c - 1)], c)  # c ⇒ drop

    def scat(buf, rows):
        return buf.at[dest].set(rows, mode="drop")

    new_params = jax.tree.map(scat, params, new_rows)
    # Fresh rows get zero moments (`gaussian_model.py:482-487`).
    new_opt = optim.AdamState(
        mu=jax.tree.map(lambda m: m.at[dest].set(0.0, mode="drop"), opt.mu),
        nu=jax.tree.map(lambda v: v.at[dest].set(0.0, mode="drop"), opt.nu),
        count=opt.count,
    )
    new_alive = alive.at[dest].set(True, mode="drop")
    return new_params, new_opt, new_alive


def densify_and_prune(
    state: GaussianState,
    key: jax.Array,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float,
    percent_dense: float = 0.01,
) -> GaussianState:
    """Clone + split + prune (`scene/gaussian_model.py:495-580`), one jittable
    static-shape step.

    clone: avg grad ≥ thresh ∧ max scale ≤ percent_dense·extent → duplicate.
    split: avg grad ≥ thresh ∧ max scale >  percent_dense·extent → two samples
           from N(mean, Σ) with scale /(0.8·2); original pruned.
    prune: opacity < min ∨ screen radius > max_screen ∨ scale > 0.1·extent.
    """
    params, alive = state.params, state.alive
    grads = state.xyz_grad_accum / jnp.maximum(state.denom, 1.0)
    grads = jnp.where(state.denom > 0, grads, 0.0)
    scaling = get_scaling(params)
    max_scale = jnp.max(scaling, axis=-1)

    hot = (grads >= max_grad) & alive
    clone_sel = hot & (max_scale <= percent_dense * extent)
    split_sel = hot & (max_scale > percent_dense * extent)

    # --- clone: exact copies into dead slots.
    params, opt, alive = _scatter_clones(
        params, state.opt, alive, clone_sel, params, 0, 1
    )

    # --- split: N=2 resampled copies; parent dies.
    rots = build_rotation(get_rotation(state.params))  # (C, 3, 3)
    new_scaling = jnp.log(scaling / (0.8 * 2))

    for i in range(2):
        key, sub = jax.random.split(key)
        samples = jax.random.normal(sub, state.params.xyz.shape) * scaling
        new_xyz = jnp.einsum(
            "nij,nj->ni", rots, samples, precision="highest"
        ) + state.params.xyz
        rows = state.params._replace(xyz=new_xyz, scaling=new_scaling)
        params, opt, alive = _scatter_clones(
            params, opt, alive, split_sel, rows, i, 2
        )
    alive = alive & ~split_sel

    # --- prune.
    prune = get_opacity(params)[:, 0] < min_opacity
    if max_screen_size:
        prune = prune | (state.max_radii2d > max_screen_size)
        prune = prune | (jnp.max(get_scaling(params), axis=-1) > 0.1 * extent)
    alive = alive & ~prune

    zeros = jnp.zeros_like(state.xyz_grad_accum)
    return state._replace(
        params=params,
        alive=alive,
        opt=opt,
        xyz_grad_accum=zeros,
        denom=zeros,
        max_radii2d=zeros,
    )


def reset_opacity(state: GaussianState) -> GaussianState:
    """Clamp opacity to ≤ 0.01 and zero its Adam moments
    (`gaussian_model.py:266-269` + `replace_tensor_to_optimizer`)."""
    new_op = inverse_sigmoid(
        jnp.minimum(get_opacity(state.params), 0.01 * jnp.ones_like(state.params.opacity))
    )
    opt = optim.zero_leaf_rows(
        state.opt, "opacity", jnp.ones_like(state.alive)
    )
    return state._replace(params=state.params._replace(opacity=new_op), opt=opt)


# --------------------------------------------------------------------------
# Segmentation (`gaussian_model.py:375-472`)
# --------------------------------------------------------------------------


def segment(state: GaussianState, mask3d: jnp.ndarray) -> GaussianState:
    """Restrict the live set to ``mask3d`` (bool over capacity).  The undo
    stack (`segment_times`, `roll_back`) lives host-side in GaussianScene."""
    return state._replace(
        alive=state.alive & mask3d,
        seg_mask=jnp.where(mask3d, state.seg_mask, 0.0),
    )


# --------------------------------------------------------------------------
# Compaction / conversion helpers (host-side, for I/O)
# --------------------------------------------------------------------------


def compact(state: GaussianState) -> dict[str, np.ndarray]:
    """Gather live rows to host numpy dicts (for PLY export)."""
    alive = np.asarray(state.alive)
    out = {}
    for name in GaussianParams._fields:
        out[name] = np.asarray(getattr(state.params, name))[alive]
    return out


def from_dense(
    xyz: np.ndarray,
    features_dc: np.ndarray,
    features_rest: np.ndarray,
    scaling: np.ndarray,
    rotation: np.ndarray,
    opacity: np.ndarray,
    capacity: Optional[int] = None,
) -> GaussianState:
    """Build a state from dense (N, ...) pre-activation arrays (PLY import)."""
    n = xyz.shape[0]
    if capacity is None:
        capacity = n
    assert n <= capacity

    def pad(a):
        a = jnp.asarray(a, jnp.float32)
        widths = [(0, capacity - n)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths)

    params = GaussianParams(
        xyz=pad(xyz),
        features_dc=pad(features_dc),
        features_rest=pad(features_rest),
        scaling=pad(scaling),
        rotation=pad(rotation),
        opacity=pad(opacity),
    )
    alive = jnp.arange(capacity) < n
    return GaussianState(
        params=params,
        alive=alive,
        seg_mask=alive.astype(jnp.float32),
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        xyz_grad_accum=jnp.zeros((capacity,), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
        opt=optim.adam_init(params),
    )
