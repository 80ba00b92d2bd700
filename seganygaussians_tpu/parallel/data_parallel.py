"""Camera-data-parallel training step over a device mesh.

TPU-first scaling design (SURVEY.md §2.4, greenfield — the reference is
single-GPU): Gaussian parameters are REPLICATED across the mesh; each device
renders a different training camera and computes full parameter gradients;
gradients are `pmean`-reduced over ICI; the Adam update runs replicated (it is
deterministic, so replicas stay bit-identical without a broadcast).
Densification statistics (positional-gradient norms, visibility counts, max
radii) are `psum`-combined — one D-camera step accumulates the same stats the
reference gathers over D sequential iterations (`train_scene.py:124-131`).

Expressed with `shard_map` so each device runs the UNBATCHED single-camera
rasterizer (the Pallas kernel never sees a vmap) and XLA lowers the cross-
device reductions to ICI collectives.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from seganygaussians_tpu.models import gaussians as gm
from seganygaussians_tpu.models import optim
from seganygaussians_tpu.ops import losses
from seganygaussians_tpu.ops.camera import CameraParams
from seganygaussians_tpu.ops.rasterize import RasterConfig, rasterize


class CameraBatch(NamedTuple):
    """D stacked cameras (leading axis = data shard). Static geometry
    (width/height/tanfov) must be shared by the whole batch."""

    world_view: jnp.ndarray  # (D, 4, 4)
    full_proj: jnp.ndarray  # (D, 4, 4)
    cam_center: jnp.ndarray  # (D, 3)


def stack_cameras(cams: list[CameraParams]) -> tuple[CameraBatch, CameraParams]:
    """Stack same-resolution cameras; returns (batch, static template)."""
    tpl = cams[0]
    for c in cams:
        assert (c.width, c.height) == (tpl.width, tpl.height), "mixed resolutions"
    return (
        CameraBatch(
            world_view=jnp.stack([c.world_view for c in cams]),
            full_proj=jnp.stack([c.full_proj for c in cams]),
            cam_center=jnp.stack([c.cam_center for c in cams]),
        ),
        tpl,
    )


def make_dp_train_step(
    mesh: Mesh,
    template: CameraParams,
    hyper: gm.TrainHyper,
    config: RasterConfig,
    spatial_lr_scale: float,
    active_sh_degree: int = 0,
):
    """Build the jitted D-camera data-parallel train step for ``mesh``."""

    def per_device(state: gm.GaussianState, cams: CameraBatch, gts, bg, step):
        # shard_map gives (1, ...) local slices: unpack this device's camera.
        camera = CameraParams(
            world_view=cams.world_view[0],
            full_proj=cams.full_proj[0],
            cam_center=cams.cam_center[0],
            width=template.width,
            height=template.height,
            tan_fovx=template.tan_fovx,
            tan_fovy=template.tan_fovy,
        )
        gt = gts[0]

        def loss_fn(params, ndc_offset):
            out = rasterize(
                params.xyz,
                gm.get_opacity(params)[:, 0],
                camera,
                shs=gm.get_shs(params),
                sh_degree=active_sh_degree,
                scales=gm.get_scaling(params),
                rotations=gm.get_rotation(params),
                bg=bg,
                ndc_offset=ndc_offset,
                active_mask=state.alive,
                config=config,
            )
            l1 = losses.l1_loss(out.color, gt)
            ssim_v = losses.ssim(out.color, gt)
            loss = (1 - hyper.lambda_dssim) * l1 + hyper.lambda_dssim * (1 - ssim_v)
            return loss, (out.radii, out.overflow)

        ndc0 = jnp.zeros((state.params.xyz.shape[0], 2), jnp.float32)
        (loss, (radii, overflow)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, ndc0)
        param_grads, ndc_grad = grads

        # ---- ICI collectives: mean param grads, summed densify stats.
        param_grads = lax.pmean(param_grads, "data")
        loss = lax.pmean(loss, "data")
        overflow = lax.pmax(overflow.astype(jnp.int32), "data")

        lrs = gm.make_lr_tree(hyper, spatial_lr_scale, step)
        new_params, new_opt = optim.adam_update(
            param_grads, state.opt, state.params, lrs
        )
        state = state._replace(params=new_params, opt=new_opt)

        visible = radii > 0
        gnorm = jnp.where(visible, jnp.linalg.norm(ndc_grad, axis=-1), 0.0)
        state = state._replace(
            xyz_grad_accum=state.xyz_grad_accum + lax.psum(gnorm, "data"),
            denom=state.denom + lax.psum(visible.astype(jnp.float32), "data"),
            max_radii2d=jnp.maximum(
                state.max_radii2d, lax.pmax(radii.astype(jnp.float32), "data")
            ),
        )
        return state, loss, overflow

    replicated = P()
    sharded = P("data")
    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(replicated, sharded, sharded, replicated, replicated),
        out_specs=(replicated, replicated, replicated),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state, cam_batch, gt_batch, bg, step):
        return fn(state, cam_batch, gt_batch, bg, step)

    def run(state, cam_batch, gt_batch, bg, step):
        # Place inputs to match the mesh (replicated state / sharded batch).
        dev_state = jax.device_put(
            state, NamedSharding(mesh, replicated)
        )
        cam_batch = jax.device_put(cam_batch, NamedSharding(mesh, sharded))
        gt_batch = jax.device_put(gt_batch, NamedSharding(mesh, sharded))
        return step_fn(dev_state, cam_batch, gt_batch, bg, step)

    return run
