"""Camera + ray data-parallel contrastive training step.

Scaling story for the SAGA affinity loss (SURVEY.md §5): the quadratic
object is the (S, R, R) ray-correlation matrix
(`train_contrastive_feature.py:255`).  Over a 2-D mesh ("data", "ray"):

* the **"data" axis** shards cameras — each data row trains a different view
  (bundle + GT), parameter/feature gradients are `pmean`-reduced, exactly as
  the scene DP step;
* the **"ray" axis** block-row-shards the correlation: every device renders
  its camera's full feature map (tile rendering is cheap relative to the
  quadratic term at large R) and materialises only the
  ``(S, R/ray_size, R)`` block of corr / gt_corr / pair-weights.  Global
  pair counts and loss numerators are `psum`-reduced over "ray", so the loss
  (and, through AD of the collectives, the gradient) is bit-equal in
  expectation to the single-device step.

RNG parity with :func:`contrastive_step` is kept by drawing every random
tensor at FULL ray resolution from the same keys and slicing the local block
— draws are identical to the single-device path, which makes gradient
equivalence testable exactly (tests/test_parallel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from seganygaussians_tpu.models import feature_gaussians as fgm
from seganygaussians_tpu.models import optim
from seganygaussians_tpu.ops.camera import CameraParams
from seganygaussians_tpu.ops.rasterize import RasterConfig, rasterize
from seganygaussians_tpu.seg.scale_gate import ScaleGateParams, apply_scale_gate
from seganygaussians_tpu.train.contrastive_trainer import (
    ContrastiveConsts,
    ContrastiveHyper,
    MaskBundle,
    _pixel_weights,
    _ray_sampling,
    _safe_norm,
    _safe_normalize,
    _sample_scales_and_gt,
)


def make_dp_contrastive_step(
    mesh: Mesh,
    template: CameraParams,
    hyper: ContrastiveHyper,
    config: RasterConfig,
):
    """Build the jitted (cameras × ray-blocks) contrastive step for ``mesh``.

    Inputs to the returned function:
      feat_state  — replicated FeatureState
      gate/gate_opt — replicated scale gate + Adam state
      cam_batch   — pytree of (D, ...) stacked CameraParams dynamic fields
      bundles     — MaskBundle stacked to (D, K, H, W) / (D, K) / (D,)
      consts      — replicated ContrastiveConsts
      keys        — (D, 2) uint32: one PRNG key per camera
    """
    ray_size = mesh.shape["ray"]
    r_total = hyper.num_sampled_rays
    assert r_total % ray_size == 0, (r_total, ray_size)
    r_local = r_total // ray_size

    def per_device(feat_state, gate_params, gate_opt, cam_wv, cam_fp, cam_cc,
                   bundle, consts, keys):
        camera = CameraParams(
            world_view=cam_wv[0], full_proj=cam_fp[0], cam_center=cam_cc[0],
            width=template.width, height=template.height,
            tan_fovx=template.tan_fovx, tan_fovy=template.tan_fovy,
        )
        bundle = MaskBundle(
            masks=bundle.masks[0], scales=bundle.scales[0],
            n_valid=bundle.n_valid[0],
        )
        key = keys[0]
        blk = lax.axis_index("ray")
        row0 = blk * r_local

        k_ray, k_scale, k_smooth = jax.random.split(key, 3)
        ray_idx = _ray_sampling(k_ray, bundle, r_total)  # full R (replicated)
        q_scales, gt_corrs = _sample_scales_and_gt(k_scale, bundle, ray_idx, consts)
        ppw = _pixel_weights(bundle, ray_idx)  # (R, R)
        # Local block rows of the quadratic objects.
        gt_blk = lax.dynamic_slice_in_dim(gt_corrs, row0, r_local, axis=1)
        ppw_blk = lax.dynamic_slice_in_dim(ppw, row0, r_local, axis=0)
        rand_full = jax.random.uniform(
            jax.random.fold_in(k_scale, 7), (r_total, r_total)
        )
        rand_blk = lax.dynamic_slice_in_dim(rand_full, row0, r_local, axis=0)

        geom = feat_state.geom
        s_total = gt_corrs.shape[0]

        def loss_fn(point_features, gate):
            fs = feat_state._replace(point_features=point_features)
            smoothed = fgm.smoothed_point_features(
                fs, key=k_smooth, dropout=hyper.smooth_dropout
            )
            feats = _safe_normalize(smoothed)
            out = rasterize(
                geom.xyz, fgm.get_opacity(geom)[:, 0], camera,
                colors=feats, scales=fgm.get_scaling(geom),
                rotations=fgm.get_rotation(geom),
                bg=jnp.zeros((feats.shape[-1],), jnp.float32),
                active_mask=geom.alive, config=config,
            )
            fmap = out.color
            d = fmap.shape[-1]
            rfn_val = jnp.mean(_safe_norm(fmap))
            rfn_reg = (1.0 - rfn_val) ** 2

            ray_feats = fmap.reshape(-1, d)[ray_idx]  # (R, D)
            gates = apply_scale_gate(gate, q_scales[:, None])  # (S, D)
            scaled = _safe_normalize(ray_feats[None] * gates[:, None, :])  # (S,R,D)
            scaled_blk = lax.dynamic_slice_in_dim(scaled, row0, r_local, axis=1)
            # Block row of corr: (S, R_local, R) — the full (S,R,R) never
            # exists on one device.
            corr_blk = jnp.einsum(
                "nhc,njc->nhj", scaled_blk, scaled, precision="highest"
            )

            rows = row0 + jnp.arange(r_local)
            cols = jnp.arange(r_total)
            eye_blk = rows[:, None] == cols[None, :]
            triu_blk = rows[:, None] <= cols[None, :]

            sum0 = jnp.sum(gt_blk, axis=0)  # (R_local, R)
            cons_neg = sum0 == 0
            cons_pos = sum0 == s_total
            inconsistent = ~(cons_neg | cons_pos)
            # Global pair counts over all ray blocks.
            n_inc = lax.psum(jnp.sum(inconsistent), "ray")
            n_pos = lax.psum(jnp.sum(cons_pos), "ray")
            n_neg = lax.psum(jnp.sum(cons_neg), "ray")
            sampled_num = n_inc / 2.0
            samp_pos = cons_pos & (rand_blk < sampled_num / jnp.maximum(n_pos, 1))
            samp_neg = cons_neg & (rand_blk < sampled_num / jnp.maximum(n_neg, 1))

            trig_pos = jnp.any((corr_blk < 0.75) & (gt_blk == 1), axis=0)
            trig_neg = jnp.any((corr_blk > 0.5) & (gt_blk == 0), axis=0)
            mask_pos = (samp_pos | trig_pos | inconsistent) & ~eye_blk & triu_blk
            mask_neg = (samp_neg | trig_neg | inconsistent) & ~eye_blk & triu_blk

            # CRITICAL: the differentiated loss must not contain a psum on a
            # float.  Under shard_map(check_vma=False) psum transposes to
            # psum, so a cotangent flowing through it is multiplied by
            # ray_size — exactly the bug that broke gradient parity in r2.
            # The denominators below ARE psums, but of integer counts (no
            # tangent path); the differentiable numerators stay LOCAL, and
            # the outer psum of feat_grads assembles the exact full gradient.
            den_p = lax.psum(jnp.sum(mask_pos), "ray") * s_total  # int32
            den_n = lax.psum(jnp.sum(mask_neg), "ray") * s_total
            wp = ppw_blk[None] * gt_blk * corr_blk
            local_np = jnp.sum(jnp.where(mask_pos[None], wp, 0.0))
            wn = ppw_blk[None] * (1 - gt_blk) * jax.nn.relu(corr_blk)
            local_nn = jnp.sum(jnp.where(mask_neg[None], wn, 0.0))
            pair_local = (
                -local_np / jnp.maximum(den_p, 1) + local_nn / jnp.maximum(den_n, 1)
            )
            # rfn is replicated across the ray axis: scale so the psum of
            # per-device gradients counts it exactly once.  The true
            # (single-device-equal) loss value goes out through aux, with
            # stop_gradient guarding its psum.
            loss_for_grad = pair_local + hyper.rfn * rfn_reg / ray_size
            pair_loss = lax.psum(lax.stop_gradient(pair_local), "ray")
            true_loss = pair_loss + hyper.rfn * rfn_reg
            return loss_for_grad, (true_loss, rfn_val, out.overflow)

        (_, (loss, rfn_val, overflow)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(feat_state.point_features, gate_params)
        feat_grads, gate_grads = grads

        # Partitioned-sum gradients over ray blocks; mean over cameras.
        feat_grads = lax.pmean(lax.psum(feat_grads, "ray"), "data")
        gate_grads = jax.tree.map(
            lambda g: lax.pmean(lax.psum(g, "ray"), "data"), gate_grads
        )
        # The loss value is already ray-replicated (every term is a psum or
        # replicated computation) — only average over cameras.
        loss = lax.pmean(loss, "data")
        overflow = lax.pmax(overflow.astype(jnp.int32), ("data", "ray"))

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
        dbg = feat_grads if hyper.debug_grads else jnp.zeros((1,), jnp.float32)
        return feat_state, new_gate, new_gate_opt, loss, overflow, dbg

    replicated = P()
    cam_sharded = P("data")
    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(replicated, replicated, replicated,
                  cam_sharded, cam_sharded, cam_sharded,
                  cam_sharded, replicated, cam_sharded),
        out_specs=(replicated,) * 6,
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step_fn(feat_state, gate, gate_opt, cam_wv, cam_fp, cam_cc,
                bundles, consts, keys):
        return fn(feat_state, gate, gate_opt, cam_wv, cam_fp, cam_cc,
                  bundles, consts, keys)

    def run(feat_state, gate, gate_opt, cameras, bundles, consts, keys):
        d = mesh.shape["data"]
        assert len(cameras) == d and bundles.masks.shape[0] == d
        cam_wv = jnp.stack([c.world_view for c in cameras])
        cam_fp = jnp.stack([c.full_proj for c in cameras])
        cam_cc = jnp.stack([c.cam_center for c in cameras])
        rep = NamedSharding(mesh, replicated)
        shd = NamedSharding(mesh, cam_sharded)
        feat_state = jax.device_put(feat_state, rep)
        gate = jax.device_put(gate, rep)
        gate_opt = jax.device_put(gate_opt, rep)
        bundles = jax.device_put(bundles, shd)
        return step_fn(
            feat_state, gate, gate_opt,
            jax.device_put(cam_wv, shd), jax.device_put(cam_fp, shd),
            jax.device_put(cam_cc, shd),
            bundles, jax.device_put(consts, rep), jax.device_put(keys, shd),
        )

    return run


def stack_bundles(bundles: list[MaskBundle]) -> MaskBundle:
    """Stack per-camera MaskBundles to (D, ...) for the data axis."""
    return MaskBundle(
        masks=jnp.stack([b.masks for b in bundles]),
        scales=jnp.stack([b.scales for b in bundles]),
        n_valid=jnp.stack([b.n_valid for b in bundles]),
    )
