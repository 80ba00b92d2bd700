"""SAGA contrastive affinity-feature training (parity:
`train_contrastive_feature.py:64-339`).

The reference iteration is: pick a camera → sample ~8 mask scales + 2
sentinels → Bernoulli-sample rays inside the SAM-mask region → build a
per-scale GT correspondence matrix from the *dominant* (smallest-scale) mask
covering each ray at that scale → render the 32-dim feature map → scale-gate
→ pairwise ray cosine matrix → weighted pos/neg contrastive loss + feature-
norm regulariser.

TPU-first re-design (all static shapes, one jitted step):

* Bernoulli ray sampling → Gumbel top-k of a fixed ``num_rays`` over valid
  (mask-covered) pixels: same distribution over valid pixels, fixed shape.
* The reference's sequential dominant-mask loop
  (`train_contrastive_feature.py:208-216`, scan j=si..0 with in-place ANDs)
  collapses to a closed form: with masks sorted by DESCENDING scale, ray r's
  GT group at threshold index si is the LARGEST mask index j ≤ si covering r
  — one masked max-reduce instead of a Python loop.
* Per-camera mask counts vary → mask stacks are padded to a fixed ``max_masks``
  with zero masks / −inf scales (they sort to the tail and never win a max).
* 8 sampled scale indices come from ``jax.random.randint`` (the reference's
  ``randperm[:8]`` without-replacement draw; duplicates are vanishingly rare
  for typical K≫8 and harmless — both sides jitter each scale independently).
* The (num_scales, R, R) correlation and GT matrices are MXU matmuls.

Everything else (pixel weights, margin triggers corr<0.75 / corr>0.5,
consistent/inconsistent pair mining, triu+diag masking, the loss) is
reproduced term-for-term.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from seganygaussians_tpu.models import feature_gaussians as fgm
from seganygaussians_tpu.models import optim
from seganygaussians_tpu.ops.camera import CameraParams
from seganygaussians_tpu.ops.quantile import (
    QuantileTransform,
    apply_quantile_transform,
    fit_quantile_transform,
)
from seganygaussians_tpu.ops.rasterize import RasterConfig, rasterize
from seganygaussians_tpu.seg.scale_gate import ScaleGateParams, apply_scale_gate

NUM_SAMPLED_SCALES = 8  # `train_contrastive_feature.py:156`


def _safe_norm(x, axis=-1, keepdims=False, eps=1e-12):
    """sqrt(Σx²+ε): finite gradient at 0 (torch's norm has subgradient 0
    there; jnp.linalg.norm yields NaN — background pixels hit exactly 0)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


def _safe_normalize(x, axis=-1, eps=1e-12):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


class MaskBundle(NamedTuple):
    """One camera's padded SAM-mask stack, pre-sorted by descending scale."""

    masks: jnp.ndarray  # (K_pad, H, W) float {0,1}
    scales: jnp.ndarray  # (K_pad,) descending; padding = -inf
    n_valid: jnp.ndarray  # () int32


def build_mask_bundle(
    sam_masks: np.ndarray, mask_scales: np.ndarray, max_masks: int
) -> MaskBundle:
    order = np.argsort(-mask_scales)
    m = sam_masks[order].astype(np.float32)
    s = mask_scales[order].astype(np.float32)
    k = len(s)
    assert k <= max_masks
    m = np.pad(m, ((0, max_masks - k), (0, 0), (0, 0)))
    s = np.pad(s, (0, max_masks - k), constant_values=-np.inf)
    return MaskBundle(
        masks=jnp.asarray(m),
        scales=jnp.asarray(s),
        n_valid=jnp.asarray(k, jnp.int32),
    )


class ContrastiveConsts(NamedTuple):
    upper_bound_scale: jnp.ndarray  # () max scale over the whole dataset
    qt: QuantileTransform
    # Per-level neighbour maps when hyper.smooth_type == 'multi_res'
    # (built once by fgm.build_multi_res_maps, like the reference's cached
    # multi_res_feature_smooth_map); () placeholder otherwise.
    multi_res_maps: tuple = ()


def _sample_scales_and_gt(key, bundle: MaskBundle, ray_idx, consts):
    """Sampled (jittered, quantile-normalised) scales + per-scale GT corr.

    Mirrors `train_contrastive_feature.py:153-228`. Returns
    (q_scales (S,), gt_corrs (S, R, R)) with S = NUM_SAMPLED_SCALES + 2.
    """
    k_pad = bundle.scales.shape[0]
    n = bundle.n_valid
    s_total = NUM_SAMPLED_SCALES + 2

    k1, k2, k3 = jax.random.split(key, 3)
    rand_idx = jax.random.randint(k1, (NUM_SAMPLED_SCALES,), 0, jnp.maximum(n, 1))
    # index layout (`:158-168`): [0]=-1 sentinel (→ above upper bound),
    # [1:9]=random, [-1]=smallest mask
    si = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), rand_idx, (n - 1)[None]]
    )  # (S,)

    scales = jnp.where(si >= 0, bundle.scales[jnp.clip(si, 0, k_pad - 1)], 0.0)
    upper = consts.upper_bound_scale
    u0 = jax.random.uniform(k2, ())
    scales = scales.at[0].set(upper + upper * u0)

    # second biggest distinct-from-upper scale (`:170`)
    masked = jnp.where(
        (bundle.scales < upper) & jnp.isfinite(bundle.scales), bundle.scales, -jnp.inf
    )
    second_big = jnp.max(masked)

    # per-scale jitter (`:197-206`)
    u = jax.random.uniform(k3, (s_total,))
    is_upper = scales >= upper
    next_scale = jnp.where(
        si + 1 < n, bundle.scales[jnp.clip(si + 1, 0, k_pad - 1)], 0.0
    )
    is_last = si == n - 1
    delta = jnp.where(
        is_upper,
        scales - second_big,
        jnp.where(is_last, scales, scales - next_scale),
    )
    scales = scales - delta * u

    # GT correspondence per scale (`:208-221`), closed form:
    # rays_masks (K, R) — mask coverage at the sampled rays
    flat = bundle.masks.reshape(k_pad, -1)
    rays_masks = flat[:, ray_idx]  # (K, R)
    kidx = jnp.arange(k_pad, dtype=jnp.int32)

    def gt_for_scale(si_s, is_upper_s):
        # dominant index: largest j ≤ si covering the ray
        eligible = (kidx[:, None] <= si_s) & (rays_masks > 0)  # (K, R)
        dom = jnp.max(jnp.where(eligible, kidx[:, None], -1), axis=0)  # (R,)
        gt_vec_low = (kidx[:, None] == dom[None, :]).astype(jnp.float32)
        gt_vec_high = jnp.where(
            (kidx[:, None] > si_s) & (kidx[:, None] < n), rays_masks, 0.0
        )
        gt_vec = jnp.where(is_upper_s, rays_masks * (kidx[:, None] < n),
                           gt_vec_low * (dom >= 0)[None, :] + gt_vec_high)
        corr = jax.lax.dot_general(
            gt_vec, gt_vec,
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision="highest",
        )  # (R, R)
        return (corr != 0).astype(jnp.float32)

    gt_corrs = jax.vmap(gt_for_scale)(si, is_upper)  # (S, R, R)
    q_scales = apply_quantile_transform(consts.qt, scales)
    return q_scales, gt_corrs


def _ray_sampling(key, bundle: MaskBundle, num_rays: int):
    """Fixed-count ray sampling over the mask-covered region
    (Bernoulli → Gumbel top-k re-design of `:172-177`)."""
    hw = bundle.masks.shape[1] * bundle.masks.shape[2]
    covered = jnp.sum(bundle.masks.reshape(bundle.masks.shape[0], -1), axis=0) > 0
    score = jax.random.uniform(key, (hw,)) - (~covered) * 1e9
    _, ray_idx = jax.lax.top_k(score, num_rays)
    return ray_idx  # (R,) flat pixel indices


def _pixel_weights(bundle: MaskBundle, ray_idx):
    """Pairwise mask-size weights in [1, 10] (`:180-191`)."""
    k_pad = bundle.masks.shape[0]
    flat = bundle.masks.reshape(k_pad, -1)
    mask_sizes = jnp.sum(flat, axis=-1)  # (K,)
    per_pixel_size = jnp.einsum("kp,k->p", flat, mask_sizes)
    per_pixel_mean = per_pixel_size / (jnp.sum(flat, axis=0) + 1e-9)
    pp = per_pixel_mean[ray_idx]  # (R,)
    ptp = pp[None, :] * pp[:, None]
    ptp_max = jnp.max(ptp)
    ptp = jnp.where(ptp == 0, 1e10, ptp)
    w = jnp.maximum(ptp_max / ptp, 1.0)
    w = (w - jnp.min(w)) / (jnp.max(w) - jnp.min(w) + 1e-12) * 9.0 + 1.0
    return w  # (R, R)


@dataclasses.dataclass(frozen=True)
class ContrastiveHyper:
    iterations: int = 10_000
    feature_lr: float = 0.0025
    num_sampled_rays: int = 1000
    smooth_k: int = 16
    smooth_dropout: float = 0.5
    # 'traditional' (reference trainer default, train_contrastive_feature.py:231),
    # 'multi_res', or 'none' (`gaussian_renderer/__init__.py:355-360`)
    smooth_type: str = "traditional"
    rfn: float = 1.0
    scale_aware_dim: int = -1
    # Return raw feature gradients in aux (testing/debugging only — Adam's
    # first-step sign(g) behaviour makes post-update params useless for
    # gradient-parity checks).
    debug_grads: bool = False


@functools.partial(
    jax.jit,
    static_argnames=("hyper", "config"),
    donate_argnums=(0, 1),
)
def contrastive_step(
    feat_state: fgm.FeatureState,
    gate_params: ScaleGateParams,
    gate_opt: optim.AdamState,
    camera: CameraParams,
    bundle: MaskBundle,
    consts: ContrastiveConsts,
    key: jax.Array,
    hyper: ContrastiveHyper,
    config: RasterConfig,
):
    """One fused contrastive iteration (camera-resolution-static)."""
    k_ray, k_scale, k_smooth = jax.random.split(key, 3)
    ray_idx = _ray_sampling(k_ray, bundle, hyper.num_sampled_rays)
    q_scales, gt_corrs = _sample_scales_and_gt(k_scale, bundle, ray_idx, consts)
    ppw = _pixel_weights(bundle, ray_idx)  # (R, R)

    geom = feat_state.geom

    def loss_fn(point_features, gate):
        fs = feat_state._replace(point_features=point_features)
        smoothed = fgm.smooth_features(
            fs, hyper.smooth_type, key=k_smooth, dropout=hyper.smooth_dropout,
            maps=consts.multi_res_maps or None,
        )  # L2-normalised + K-mean (`render_contrastive_feature` w/
        #    norm_point_features=True re-normalises — reproduce both)
        feats = _safe_normalize(smoothed)
        out = rasterize(
            geom.xyz,
            fgm.get_opacity(geom)[:, 0],
            camera,
            colors=feats,
            scales=fgm.get_scaling(geom),
            rotations=fgm.get_rotation(geom),
            bg=jnp.zeros((feats.shape[-1],), jnp.float32),
            active_mask=geom.alive,
            config=config,
        )
        fmap = out.color  # (H, W, D)
        d = fmap.shape[-1]

        # feature-norm regulariser (`:234-235`)
        rfn_val = jnp.mean(_safe_norm(fmap))
        rfn_reg = (1.0 - rfn_val) ** 2

        ray_feats = fmap.reshape(-1, d)[ray_idx]  # (R, D)
        gates = apply_scale_gate(gate, q_scales[:, None])  # (S, D)
        scaled = ray_feats[None, :, :] * gates[:, None, :]  # (S, R, D)
        scaled = _safe_normalize(scaled)
        corr = jnp.einsum("nhc,njc->nhj", scaled, scaled, precision="highest")

        r = corr.shape[1]
        eye = jnp.eye(r, dtype=bool)
        s_total = gt_corrs.shape[0]
        sum0 = jnp.sum(gt_corrs, axis=0)
        cons_neg = sum0 == 0
        cons_pos = sum0 == s_total
        inconsistent = ~(cons_neg | cons_pos)
        n_inc = jnp.sum(inconsistent)
        sampled_num = n_inc / 2.0
        rand = jax.random.uniform(jax.random.fold_in(k_scale, 7), sum0.shape)
        samp_pos = cons_pos & (rand < sampled_num / jnp.maximum(jnp.sum(cons_pos), 1))
        samp_neg = cons_neg & (rand < sampled_num / jnp.maximum(jnp.sum(cons_neg), 1))

        trig_pos = jnp.any((corr < 0.75) & (gt_corrs == 1), axis=0)
        trig_neg = jnp.any((corr > 0.5) & (gt_corrs == 0), axis=0)
        mask_pos = (samp_pos | trig_pos | inconsistent) & ~eye
        mask_neg = (samp_neg | trig_neg | inconsistent) & ~eye
        triu = jnp.triu(jnp.ones((r, r), bool))
        mask_pos = mask_pos & triu
        mask_neg = mask_neg & triu

        wp = ppw[None] * gt_corrs * corr
        pos_loss = -jnp.sum(jnp.where(mask_pos[None], wp, 0.0)) / jnp.maximum(
            jnp.sum(mask_pos) * s_total, 1
        )
        wn = ppw[None] * (1 - gt_corrs) * jax.nn.relu(corr)
        neg_loss = jnp.sum(jnp.where(mask_neg[None], wn, 0.0)) / jnp.maximum(
            jnp.sum(mask_neg) * s_total, 1
        )
        loss = pos_loss + neg_loss + hyper.rfn * rfn_reg

        npos = jnp.maximum(jnp.sum(gt_corrs == 1), 1)
        nneg = jnp.maximum(jnp.sum(gt_corrs == 0), 1)
        aux = {
            "rfn": rfn_val,
            "cosine_pos": jnp.sum(jnp.where(gt_corrs == 1, corr, 0)) / npos,
            "cosine_neg": jnp.sum(jnp.where(gt_corrs == 0, corr, 0)) / nneg,
            "overflow": out.overflow,
        }
        return loss, aux

    (loss, aux), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
        feat_state.point_features, gate_params
    )
    feat_grads, gate_grads = grads
    if hyper.debug_grads:
        aux["feat_grads"] = feat_grads
        aux["gate_grads"] = gate_grads

    new_features, new_opt = optim.adam_update(
        feat_grads, feat_state.opt, feat_state.point_features,
        jnp.asarray(hyper.feature_lr),
    )
    feat_state = feat_state._replace(point_features=new_features, opt=new_opt)

    gate_lrs = ScaleGateParams(
        w=jnp.asarray(hyper.feature_lr), b=jnp.asarray(hyper.feature_lr)
    )
    new_gate, new_gate_opt = optim.adam_update(
        gate_grads, gate_opt, gate_params, gate_lrs
    )
    aux["loss"] = loss
    return feat_state, new_gate, new_gate_opt, aux


@dataclasses.dataclass
class ContrastiveTrainer:
    """Host loop (`train_contrastive_feature.py:133-319`)."""

    feat_state: fgm.FeatureState
    gate_params: ScaleGateParams
    cameras: list  # data.cameras.Camera with sam_masks + mask_scales
    hyper: ContrastiveHyper = ContrastiveHyper()
    config: RasterConfig = RasterConfig()
    seed: int = 0

    def __post_init__(self):
        self.key = jax.random.PRNGKey(self.seed)
        self.gate_opt = optim.adam_init(self.gate_params)
        # fit the quantile transform over ALL cameras' mask scales (`:108-130`)
        all_scales = np.concatenate(
            [np.asarray(c.mask_scales).reshape(-1) for c in self.cameras]
        )
        maps = ()
        if self.hyper.smooth_type == "multi_res":
            maps = fgm.build_multi_res_maps(
                self.feat_state, jax.random.split(jax.random.PRNGKey(self.seed), 3)
            )
        self.consts = ContrastiveConsts(
            upper_bound_scale=jnp.asarray(all_scales.max(), jnp.float32),
            qt=fit_quantile_transform(jnp.asarray(all_scales), output="uniform"),
            multi_res_maps=maps,
        )
        self.max_masks = max(len(np.asarray(c.mask_scales)) for c in self.cameras)
        self._bundles: dict[int, MaskBundle] = {}
        self._params: dict[int, CameraParams] = {}
        self.metrics_history: list[dict] = []

    def _prep(self, idx: int):
        if idx not in self._bundles:
            cam = self.cameras[idx]
            masks = np.asarray(cam.sam_masks)
            self._bundles[idx] = build_mask_bundle(
                masks, np.asarray(cam.mask_scales), self.max_masks
            )
            # features render at the SAM-mask resolution (the loop sets
            # feature res = image res, then resizes to mask res — rendering
            # at mask res directly avoids the resample)
            h, w = masks.shape[-2:]
            self._params[idx] = dataclasses.replace(cam.params, width=w, height=h)
        return self._bundles[idx], self._params[idx]

    def run(self, iterations: Optional[int] = None, log_every: int = 0):
        iterations = iterations or self.hyper.iterations
        order_rng = np.random.default_rng(self.seed)
        stack: list[int] = []
        t0 = time.time()
        for it in range(1, iterations + 1):
            if not stack:
                stack = list(order_rng.permutation(len(self.cameras)))
            idx = stack.pop()
            bundle, cam_params = self._prep(idx)
            self.key, sub = jax.random.split(self.key)
            self.feat_state, self.gate_params, self.gate_opt, aux = contrastive_step(
                self.feat_state, self.gate_params, self.gate_opt,
                cam_params, bundle, self.consts, sub, self.hyper, self.config,
            )
            if log_every and it % log_every == 0:
                m = {k: float(v) for k, v in aux.items()}
                m["iter"] = it
                m["elapsed_s"] = time.time() - t0
                self.metrics_history.append(m)
        return self.feat_state
