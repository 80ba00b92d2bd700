"""Multi-device sharding tests on the 8-device CPU mesh (conftest)."""

import sys

import jax
import numpy as np
import pytest


def test_eight_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    img = jax.jit(fn)(*args)
    assert img.shape == (96, 128, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_dp_matches_sequential_grads():
    """pmean of per-camera grads over the mesh == mean of per-camera grads."""
    import jax.numpy as jnp

    from seganygaussians_tpu.models import gaussians as gm
    from seganygaussians_tpu.ops.camera import make_camera
    from seganygaussians_tpu.ops.rasterize import RasterConfig, rasterize
    from seganygaussians_tpu.ops import losses
    from seganygaussians_tpu.parallel import make_mesh
    from seganygaussians_tpu.parallel.data_parallel import (
        make_dp_train_step, stack_cameras,
    )

    rng = np.random.default_rng(0)
    n = 32
    pts = np.stack(
        [rng.uniform(-0.5, 0.5, n), rng.uniform(-0.5, 0.5, n),
         3 + rng.uniform(-0.3, 0.3, n)], 1,
    ).astype(np.float32)
    state = gm.create_from_points(pts, rng.uniform(size=(n, 3)).astype(np.float32), 0, 64)
    cfg = RasterConfig(capacity=1 << 12, backend="xla")
    bg = jnp.zeros(3)

    cams = [
        make_camera(np.eye(3), np.array([0.1 * i, 0.0, 0.0]),
                    fovx=0.9, fovy=0.7, width=32, height=32)
        for i in range(8)
    ]
    gts = jnp.asarray(rng.uniform(size=(8, 32, 32, 3)), jnp.float32)

    # sequential reference: mean of per-camera grads, same Adam update
    hyper = gm.TrainHyper()

    def one_loss(params, cam, gt):
        out = rasterize(
            params.xyz, gm.get_opacity(params)[:, 0], cam,
            shs=gm.get_shs(params), sh_degree=0,
            scales=gm.get_scaling(params), rotations=gm.get_rotation(params),
            bg=bg, active_mask=state.alive, config=cfg,
        )
        l1 = losses.l1_loss(out.color, gt)
        ssim_v = losses.ssim(out.color, gt)
        return (1 - hyper.lambda_dssim) * l1 + hyper.lambda_dssim * (1 - ssim_v)

    grads = [
        jax.grad(one_loss)(state.params, cams[i], gts[i]) for i in range(8)
    ]
    mean_grads = jax.tree.map(lambda *g: sum(g) / 8.0, *grads)

    # reproduce the Adam update with the sequential mean grads BEFORE the dp
    # step runs (the dp step donates the state buffers)
    from seganygaussians_tpu.models import optim
    lrs = gm.make_lr_tree(hyper, 2.0, jnp.asarray(1, jnp.int32))
    want_params, _ = optim.adam_update(mean_grads, state.opt, state.params, lrs)
    want_params = jax.tree.map(np.asarray, want_params)

    mesh = make_mesh(8)
    cam_batch, template = stack_cameras(cams)
    step = make_dp_train_step(mesh, template, hyper, cfg, 2.0, 0)
    new_state, loss, overflow = step(
        state, cam_batch, gts, bg, jnp.asarray(1, jnp.int32)
    )

    np.testing.assert_allclose(
        np.asarray(new_state.params.xyz), np.asarray(want_params.xyz), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(new_state.params.opacity), np.asarray(want_params.opacity),
        atol=1e-6,
    )
    assert np.isfinite(float(loss))
