"""Contrastive feature training tests: GT-corr construction + e2e smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seganygaussians_tpu.models import feature_gaussians as fgm
from seganygaussians_tpu.ops.camera import make_camera
from seganygaussians_tpu.ops.quantile import (
    apply_quantile_transform,
    fit_quantile_transform,
)
from seganygaussians_tpu.ops.rasterize import RasterConfig
from seganygaussians_tpu.seg.scale_gate import init_scale_gate
from seganygaussians_tpu.train import contrastive_trainer as ct


def test_quantile_transform_uniform(rng):
    vals = rng.gamma(2.0, 1.5, size=5000).astype(np.float32)
    qt = fit_quantile_transform(jnp.asarray(vals))
    out = np.asarray(apply_quantile_transform(qt, jnp.asarray(vals)))
    assert out.min() >= 0 and out.max() <= 1
    # uniform output: mean ~0.5, spread ~1/12
    assert abs(out.mean() - 0.5) < 0.02
    assert abs(out.var() - 1 / 12) < 0.01
    # monotone
    x = np.sort(rng.gamma(2.0, 1.5, size=100)).astype(np.float32)
    y = np.asarray(apply_quantile_transform(qt, jnp.asarray(x)))
    assert (np.diff(y) >= -1e-6).all()


def test_mask_bundle_and_gt_corr(rng):
    """Dominant-mask GT: nested masks → rays in the inner mask group with the
    inner mask, not the outer one (the reference's sequential loop semantics,
    `train_contrastive_feature.py:208-216`)."""
    h = w = 16
    outer = np.zeros((h, w), np.float32)
    outer[2:14, 2:14] = 1
    inner = np.zeros((h, w), np.float32)
    inner[5:9, 5:9] = 1
    masks = np.stack([outer, inner])  # scales descending: outer bigger
    scales = np.array([10.0, 2.0], np.float32)
    bundle = ct.build_mask_bundle(masks, scales, max_masks=4)
    assert int(bundle.n_valid) == 2
    assert np.isneginf(np.asarray(bundle.scales)[2:]).all()

    consts = ct.ContrastiveConsts(
        upper_bound_scale=jnp.asarray(10.0),
        qt=fit_quantile_transform(jnp.asarray(scales)),
    )
    # rays: one in inner, one in outer-only, one in both regions
    ray_idx = jnp.asarray([6 * w + 6, 3 * w + 3, 7 * w + 7])  # inner, outer, inner
    q_scales, gt_corrs = ct._sample_scales_and_gt(
        jax.random.PRNGKey(0), bundle, ray_idx, consts
    )
    assert gt_corrs.shape == (ct.NUM_SAMPLED_SCALES + 2, 3, 3)
    g = np.asarray(gt_corrs)
    # at the smallest sampled scale (sentinel index n-1 → scale within
    # inner), rays 0,2 (inner) correspond; ray 1 (outer-only) is its own group
    last = g[-1]
    assert last[0, 2] == 1 and last[0, 1] == 0
    # at the above-upper-bound sentinel (index 0): plain mask overlap — all
    # three rays share the outer mask
    first = g[0]
    assert first[0, 1] == 1 and first[0, 2] == 1
    # diagonal always 1 where the ray is covered at that scale
    assert (np.diagonal(last) == 1).all()


@pytest.fixture()  # function scope: contrastive_step DONATES feat_state buffers
def feature_setup():
    rng = np.random.default_rng(5)
    n = 60
    # two spatial clusters -> two "objects"
    c1 = rng.normal([-0.5, 0, 3.0], 0.12, (n // 2, 3))
    c2 = rng.normal([0.5, 0, 3.0], 0.12, (n // 2, 3))
    pts = np.concatenate([c1, c2]).astype(np.float32)
    scaling = np.log(np.full((n, 3), 0.08, np.float32))
    rotation = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    opacity = np.full((n, 1), 2.0, np.float32)  # sigmoid ≈ 0.88
    fs = fgm.from_scene_geometry(
        pts, scaling, rotation, opacity, feature_dim=32, smooth_k=8
    )
    cam = make_camera(np.eye(3), np.zeros(3), fovx=1.1, fovy=0.9,
                      width=64, height=48)

    class C:
        pass

    # synthetic SAM masks at camera res: left / right halves + full
    h, w = 48, 64
    left = np.zeros((h, w), bool)
    left[:, : w // 2] = True
    right = ~left
    full = np.ones((h, w), bool)
    cams = []
    for _ in range(2):
        c = C()
        c.params = cam
        c.sam_masks = np.stack([full, left, right])
        c.mask_scales = np.array([5.0, 1.0, 0.9], np.float32)
        cams.append(c)
    return fs, cams


def test_contrastive_training_smoke(feature_setup):
    fs, cams = feature_setup
    gate = init_scale_gate(jax.random.PRNGKey(0))
    trainer = ct.ContrastiveTrainer(
        feat_state=fs,
        gate_params=gate,
        cameras=cams,
        hyper=ct.ContrastiveHyper(num_sampled_rays=128, smooth_dropout=0.5),
        config=RasterConfig(capacity=1 << 13, backend="xla"),
        seed=0,
    )
    trainer.run(iterations=12, log_every=4)
    ms = trainer.metrics_history
    assert len(ms) == 3
    for m in ms:
        assert np.isfinite(m["loss"]), ms
        assert not m["overflow"]
    # features actually moved
    assert float(jnp.abs(trainer.feat_state.point_features).max()) > 1e-3
    # cosine separation should appear: pos above neg by the end
    assert ms[-1]["cosine_pos"] > ms[-1]["cosine_neg"]


def test_contrastive_training_multi_res_smoke(feature_setup):
    """smooth_type='multi_res' path (`gaussian_renderer/__init__.py:357-358`):
    per-level cached neighbour maps built at trainer setup, used inside the
    jitted step."""
    fs, cams = feature_setup
    gate = init_scale_gate(jax.random.PRNGKey(0))
    trainer = ct.ContrastiveTrainer(
        feat_state=fs,
        gate_params=gate,
        cameras=cams,
        hyper=ct.ContrastiveHyper(
            num_sampled_rays=64, smooth_type="multi_res"
        ),
        config=RasterConfig(capacity=1 << 13, backend="xla"),
        seed=0,
    )
    assert len(trainer.consts.multi_res_maps) == 3
    trainer.run(iterations=4, log_every=2)
    for m in trainer.metrics_history:
        assert np.isfinite(m["loss"])
    assert float(jnp.abs(trainer.feat_state.point_features).max()) > 1e-4
