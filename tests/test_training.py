"""End-to-end scene training test: synthetic multi-view scene, loss ↓, PSNR ↑."""

import numpy as np
import jax.numpy as jnp
import pytest

from seganygaussians_tpu.models import gaussians as gm
from seganygaussians_tpu.ops.camera import make_camera
from seganygaussians_tpu.ops.rasterize import RasterConfig, rasterize
from seganygaussians_tpu.train.scene_trainer import SceneTrainer


class FakeCam:
    def __init__(self, params, image):
        self.params = params
        self.image = image


def _lookat(eye, target=np.zeros(3)):
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, -1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    Rwc = np.stack([right, up2, fwd], axis=0)
    return Rwc.T, -Rwc @ eye  # reference stores R = w2c.T ("camera-to-world")


@pytest.fixture(scope="module")
def synthetic_scene():
    """GT: a known Gaussian set rendered from 6 viewpoints; train from a
    perturbed init. This is the fern-config stand-in (SURVEY.md §7 step 6)."""
    rng = np.random.default_rng(3)
    n = 40
    gt_pts = rng.normal(scale=0.4, size=(n, 3)).astype(np.float32)
    gt_cols = rng.uniform(0.1, 0.9, size=(n, 3)).astype(np.float32)
    gt_state = gm.create_from_points(gt_pts, gt_cols, sh_degree=0, capacity=64)

    cfg = RasterConfig(capacity=1 << 13, backend="xla")
    cams = []
    for i in range(6):
        ang = 2 * np.pi * i / 6
        eye = np.array([2.5 * np.cos(ang), 0.4, 2.5 * np.sin(ang)])
        R, t = _lookat(eye)
        params = make_camera(R, t, fovx=0.9, fovy=0.7, width=64, height=48)
        out = rasterize(
            gt_state.params.xyz,
            gm.get_opacity(gt_state.params)[:, 0],
            params,
            shs=gm.get_shs(gt_state.params),
            sh_degree=0,
            scales=gm.get_scaling(gt_state.params),
            rotations=gm.get_rotation(gt_state.params),
            active_mask=gt_state.alive,
            config=cfg,
        )
        cams.append(FakeCam(params, np.asarray(jnp.clip(out.color, 0, 1))))
    return cams, cfg


def test_scene_training_improves(synthetic_scene):
    cams, cfg = synthetic_scene
    rng = np.random.default_rng(7)
    # init: GT points jittered + gray colors
    pts = rng.normal(scale=0.45, size=(40, 3)).astype(np.float32)
    cols = np.full((40, 3), 0.5, np.float32)
    state = gm.create_from_points(pts, cols, sh_degree=0, capacity=64)

    hyper = gm.TrainHyper(
        densify_from_iter=30,
        densify_until_iter=120,
        densification_interval=40,
        opacity_reset_interval=10_000,
        position_lr_max_steps=150,
    )
    trainer = SceneTrainer(
        state=state, cameras=cams, spatial_lr_scale=2.5,
        hyper=hyper, sh_degree=0, config=cfg, seed=0,
    )
    psnr_before = trainer.psnr_on(cams)
    trainer.run(iterations=150, log_every=50)
    psnr_after = trainer.psnr_on(cams)

    losses = [m["loss"] for m in trainer.metrics_history]
    assert losses[-1] < losses[0]
    assert psnr_after > psnr_before + 1.0, (psnr_before, psnr_after)
    assert not any(m["overflow"] for m in trainer.metrics_history)
    # densification ran and state stayed finite
    assert np.isfinite(np.asarray(trainer.state.params.xyz)).all()


def _tiny_trainer(synthetic_scene, **kw):
    cams, cfg = synthetic_scene
    rng = np.random.default_rng(7)
    pts = rng.normal(scale=0.45, size=(40, 3)).astype(np.float32)
    cols = np.full((40, 3), 0.5, np.float32)
    state = gm.create_from_points(pts, cols, sh_degree=0, capacity=64)
    defaults = dict(
        state=state, cameras=cams, spatial_lr_scale=2.5,
        sh_degree=0, config=cfg, seed=0,
    )
    defaults.update(kw)
    return SceneTrainer(**defaults)


def test_white_bg_opacity_reset_fires(synthetic_scene):
    """Reference gating (`train_scene.py:133-134`): white-bg scenes reset
    opacity at exactly it == densify_from_iter (VERDICT Weak #4)."""
    hyper = gm.TrainHyper(
        densify_from_iter=5, densify_until_iter=100,
        densification_interval=50, opacity_reset_interval=10_000,
        position_lr_max_steps=20,
    )
    tr = _tiny_trainer(synthetic_scene, hyper=hyper, white_background=True)
    opac_before = np.asarray(gm.get_opacity(tr.state.params))
    assert opac_before.max() > 0.011  # init 0.1 sigmoid-space
    tr.run(iterations=5)
    opac_after = np.asarray(gm.get_opacity(tr.state.params))
    assert opac_after.max() <= 0.0101, "white-bg reset did not fire at iter 5"


def test_periodic_opacity_reset_outside_densify_window(synthetic_scene):
    """Periodic reset gates only on it < densify_until (not densify_from)."""
    hyper = gm.TrainHyper(
        densify_from_iter=1_000, densify_until_iter=100,
        densification_interval=50, opacity_reset_interval=4,
        position_lr_max_steps=20,
    )
    tr = _tiny_trainer(synthetic_scene, hyper=hyper)
    tr.run(iterations=4)  # it=4: reset (4 % 4 == 0, 4 < 100)
    assert np.asarray(gm.get_opacity(tr.state.params)).max() <= 0.0101


def test_on_iteration_fires_every_iter(synthetic_scene):
    hyper = gm.TrainHyper(densify_from_iter=50, densify_until_iter=40,
                          position_lr_max_steps=20)
    tr = _tiny_trainer(synthetic_scene, hyper=hyper)
    seen = []
    tr.on_iteration = lambda t, it, m: seen.append(it)
    tr.run(iterations=7, log_every=100)  # log_every never fires
    assert seen == list(range(1, 8))


def test_resume_from_start_iteration(synthetic_scene):
    """start_iteration skips already-done work and restores SH warmup."""
    hyper = gm.TrainHyper(densify_from_iter=50, densify_until_iter=40,
                          position_lr_max_steps=20)
    tr = _tiny_trainer(synthetic_scene, hyper=hyper, sh_degree=3)
    seen = []
    tr.on_iteration = lambda t, it, m: seen.append(it)
    tr.run(iterations=6, start_iteration=4)
    assert seen == [5, 6]
    tr2 = _tiny_trainer(synthetic_scene, hyper=hyper, sh_degree=3)
    tr2.run(iterations=2001, start_iteration=2000)
    assert tr2.active_sh_degree == 2  # 2000 // 1000


def test_overflow_grows_capacity(synthetic_scene):
    """Instance-budget overflow regrows the static capacity and recompiles
    instead of silently truncating (VERDICT Weak #8)."""
    cams, _ = synthetic_scene
    tiny = RasterConfig(capacity=256, backend="xla")  # way too small
    hyper = gm.TrainHyper(
        densify_from_iter=1, densify_until_iter=100,
        densification_interval=2, opacity_reset_interval=10_000,
        position_lr_max_steps=20,
    )
    tr = _tiny_trainer(synthetic_scene, hyper=hyper, config=tiny)
    tr.run(iterations=4)
    assert tr.config.capacity > 256, "overflow did not grow capacity"


def test_fresh_camera_permutation_per_epoch(synthetic_scene):
    """Each epoch (stack refill) must draw a NEW random order — the round-1
    bug replayed the identical permutation when no metrics were logged."""
    tr = _tiny_trainer(synthetic_scene)
    n = len(tr.cameras)
    epochs = []
    for _ in range(4):
        tr._stack = []
        tr._next_camera()
        epochs.append(tuple(tr._stack))  # remaining order after one pop
    assert len(set(epochs)) > 1, "camera order identical across epochs"


def test_nonfinite_step_is_skipped(synthetic_scene):
    """A camera with a NaN pose must not poison the optimizer: the step's
    update is skipped wholesale (nonfinite metric set), parameters stay
    finite, and training continues.  Regression for the synthetic-scene
    failure where ONE NaN qvec silently drove every parameter to NaN while
    the logged loss stayed finite at |GT|."""
    import dataclasses
    import jax

    cams, cfg = synthetic_scene
    rng = np.random.default_rng(0)
    pts = np.asarray(cams[0].image).reshape(-1, 3)[:30] * 0  # dummy
    pts = rng.normal(scale=0.4, size=(30, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 0.8, (30, 3)).astype(np.float32)
    state = gm.create_from_points(pts, cols, sh_degree=0, capacity=64)

    bad_params = dataclasses.replace(
        cams[0].params,
        world_view=jnp.full_like(cams[0].params.world_view, jnp.nan),
    )
    bad_cam = FakeCam(bad_params, cams[0].image)
    order = [cams[0], bad_cam, cams[1]]

    trainer = SceneTrainer(state, order, spatial_lr_scale=1.0,
                           hyper=gm.TrainHyper(iterations=6), config=cfg)
    trainer.run(iterations=6, log_every=1)
    ms = trainer.metrics_history
    assert any(m["nonfinite"] for m in ms), "NaN camera never flagged"
    assert not all(m["nonfinite"] for m in ms)
    for leaf in jax.tree.leaves(trainer.state.params):
        assert np.isfinite(np.asarray(leaf)).all(), "params poisoned"
