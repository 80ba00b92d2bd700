"""3DGS scene training loop (parity: `train_scene.py:35-164`).

TPU-first structure: the per-iteration work (render → loss → backward → Adam →
densification-stat accumulation) is ONE jitted function over the fixed-capacity
``GaussianState``; densify/prune/opacity-reset are separate jitted calls on
the cadence of the reference (every ``densification_interval`` in
[densify_from, densify_until], opacity reset every 3000).  Parameter counts
never change shape — liveness is the ``alive`` mask — so XLA compiles the
step exactly once per image resolution.

The reference's screenspace-grad densification signal
(`train_scene.py:126-127` reading `viewspace_points.grad`) is the gradient of
the loss w.r.t. a zero ``ndc_offset`` input (explicit custom-VJP aux output
instead of the dummy-tensor hack).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from seganygaussians_tpu.models import gaussians as gm
from seganygaussians_tpu.models import optim
from seganygaussians_tpu.ops import losses
from seganygaussians_tpu.ops.camera import CameraParams
from seganygaussians_tpu.ops.rasterize import RasterConfig, rasterize


@functools.partial(
    jax.jit,
    static_argnames=("spatial_lr_scale", "active_sh_degree", "hyper", "config"),
    donate_argnums=(0,),
)
def train_step(
    state: gm.GaussianState,
    camera: CameraParams,
    gt_image: jnp.ndarray,  # (H, W, 3)
    bg: jnp.ndarray,  # (3,)
    step: jnp.ndarray,  # () int32 — 1-based iteration
    spatial_lr_scale: float,
    active_sh_degree: int,
    hyper: gm.TrainHyper,
    config: RasterConfig,
):
    """One fused train iteration. Returns (new_state, metrics dict)."""

    def loss_fn(params: gm.GaussianParams, ndc_offset: jnp.ndarray):
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
        img = out.color
        l1 = losses.l1_loss(img, gt_image)
        ssim_v = losses.ssim(img, gt_image)
        loss = (1.0 - hyper.lambda_dssim) * l1 + hyper.lambda_dssim * (1.0 - ssim_v)
        return loss, (out.radii, l1, out.overflow)

    ndc0 = jnp.zeros((state.params.xyz.shape[0], 2), jnp.float32)
    (loss, (radii, l1, overflow)), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(state.params, ndc0)
    param_grads, ndc_grad = grads

    lrs = gm.make_lr_tree(hyper, spatial_lr_scale, step)
    new_params, new_opt = optim.adam_update(
        param_grads, state.opt, state.params, lrs
    )
    state = state._replace(params=new_params, opt=new_opt)
    state = gm.add_densification_stats(state, ndc_grad, radii)
    metrics = {"loss": loss, "l1": l1, "overflow": overflow,
               "n_alive": gm.num_alive(state)}
    return state, metrics


@functools.partial(
    jax.jit, static_argnames=("hyper", "extent", "max_screen"), donate_argnums=(0,)
)
def densify_step(
    state: gm.GaussianState,
    key: jax.Array,
    extent: float,
    max_screen: float,
    hyper: gm.TrainHyper,
):
    return gm.densify_and_prune(
        state,
        key,
        max_grad=hyper.densify_grad_threshold,
        min_opacity=0.005,
        extent=extent,
        max_screen_size=max_screen,
        percent_dense=hyper.percent_dense,
    )


@dataclasses.dataclass
class SceneTrainer:
    """Host loop (`train_scene.py:55-143`): random camera order, SH warmup
    every 1000 iters, densify [500,15000] every 100, opacity reset every 3000
    (plus after the white-bg reset point), save at the reference iters."""

    state: gm.GaussianState
    cameras: list  # list[data.cameras.Camera]
    spatial_lr_scale: float
    hyper: gm.TrainHyper = gm.TrainHyper()
    sh_degree: int = 3
    white_background: bool = False
    config: RasterConfig = RasterConfig()
    seed: int = 0
    on_eval: Optional[Callable] = None

    def __post_init__(self):
        self.active_sh_degree = 0
        self.key = jax.random.PRNGKey(self.seed)
        self.bg = jnp.asarray(
            [1.0, 1.0, 1.0] if self.white_background else [0.0, 0.0, 0.0],
            jnp.float32,
        )
        self._stack: list[int] = []
        self._gt_cache: dict[int, jnp.ndarray] = {}
        self.metrics_history: list[dict] = []

    def _next_camera(self):
        if not self._stack:
            self._stack = list(np.random.default_rng(
                self.seed + len(self.metrics_history)
            ).permutation(len(self.cameras)))
        idx = self._stack.pop()
        cam = self.cameras[idx]
        if idx not in self._gt_cache:
            self._gt_cache[idx] = jnp.asarray(cam.image)
        return cam, self._gt_cache[idx]

    def run(self, iterations: Optional[int] = None, log_every: int = 0):
        h = self.hyper
        iterations = iterations or h.iterations
        t0 = time.time()
        for it in range(1, iterations + 1):
            # SH degree warmup (`train_scene.py:76-77`)
            if it % 1000 == 0 and self.active_sh_degree < self.sh_degree:
                self.active_sh_degree += 1
            cam, gt = self._next_camera()
            self.state, metrics = train_step(
                self.state, cam.params, gt, self.bg,
                jnp.asarray(it, jnp.int32), self.spatial_lr_scale,
                self.active_sh_degree, h, self.config,
            )
            if h.densify_from_iter < it < h.densify_until_iter:
                if it % h.densification_interval == 0:
                    self.key, sub = jax.random.split(self.key)
                    max_screen = 20.0 if it > h.opacity_reset_interval else 0.0
                    self.state = densify_step(
                        self.state, sub, self.extent, max_screen, h
                    )
                if it % h.opacity_reset_interval == 0 or (
                    self.white_background and it == h.densify_from_iter
                ):
                    self.state = gm.reset_opacity(self.state)
            if log_every and it % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m["iter"] = it
                m["elapsed_s"] = time.time() - t0
                self.metrics_history.append(m)
                if self.on_eval:
                    self.on_eval(self, it, m)
        return self.state

    @property
    def extent(self) -> float:
        return self.spatial_lr_scale  # cameras_extent == spatial_lr_scale

    def psnr_on(self, cameras) -> float:
        """Mean PSNR over views (`training_report`, `train_scene.py:167-202`)."""
        vals = []
        for cam in cameras:
            out = rasterize(
                self.state.params.xyz,
                gm.get_opacity(self.state.params)[:, 0],
                cam.params,
                shs=gm.get_shs(self.state.params),
                sh_degree=self.active_sh_degree,
                scales=gm.get_scaling(self.state.params),
                rotations=gm.get_rotation(self.state.params),
                bg=self.bg,
                active_mask=self.state.alive,
                config=self.config,
            )
            img = jnp.clip(out.color, 0.0, 1.0)
            vals.append(float(losses.psnr(img, jnp.asarray(cam.image))))
        return float(np.mean(vals))
