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

    # Skip the update wholesale on a non-finite step (corrupt camera pose /
    # image): one NaN gradient otherwise poisons the Adam moments and every
    # parameter forever while the per-step loss stays finite at |GT| — the
    # failure mode is silent and unrecoverable.  ``nonfinite`` is surfaced
    # in metrics so the host loop can warn.
    finite = jnp.isfinite(loss) & jnp.all(
        jnp.asarray([jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)])
    )
    zeros = jax.tree.map(jnp.zeros_like, param_grads)
    safe_grads = jax.tree.map(
        lambda g, z: jnp.where(finite, g, z), param_grads, zeros
    )

    lrs = gm.make_lr_tree(hyper, spatial_lr_scale, step)
    new_params, new_opt = optim.adam_update(
        safe_grads, state.opt, state.params, lrs
    )
    new_params = jax.tree.map(
        lambda n, o: jnp.where(finite, n, o), new_params, state.params
    )
    state = state._replace(params=new_params, opt=new_opt)
    ndc_safe = jnp.where(finite, ndc_grad, jnp.zeros_like(ndc_grad))
    state = gm.add_densification_stats(state, ndc_safe, radii)
    metrics = {"loss": loss, "l1": l1, "overflow": overflow,
               "n_alive": gm.num_alive(state),
               "nonfinite": jnp.logical_not(finite)}
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
    # Fires EVERY iteration with device-side metrics (no host sync) — the
    # save/test/checkpoint cadence hook, decoupled from ``log_every``.
    on_iteration: Optional[Callable] = None

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
        # Persistent generator: every stack refill draws a FRESH permutation
        # (the reference re-shuffles each epoch, `train_scene.py:80-82`).
        self._rng = np.random.default_rng(self.seed)

    def _next_camera(self):
        if not self._stack:
            self._stack = list(self._rng.permutation(len(self.cameras)))
        idx = self._stack.pop()
        cam = self.cameras[idx]
        if idx not in self._gt_cache:
            self._gt_cache[idx] = jnp.asarray(cam.image)
        return cam, self._gt_cache[idx]

    def _grow_capacity(self):
        """Instance budget exceeded: grow the static capacity and recompile
        (the host half of the CUDA resizable-buffer trick,
        `rasterize_points.cu:27-33`)."""
        from seganygaussians_tpu.ops.binning import suggest_capacity

        new_cap = suggest_capacity(int(self.config.capacity * 1.5))
        print(f"[raster] instance overflow: capacity "
              f"{self.config.capacity} -> {new_cap} (recompile)")
        self.config = dataclasses.replace(self.config, capacity=new_cap)

    def run(
        self,
        iterations: Optional[int] = None,
        log_every: int = 0,
        start_iteration: int = 0,
    ):
        h = self.hyper
        iterations = iterations or h.iterations
        # SH warmup state on resume (`train_scene.py:76-77`: +1 per 1000).
        self.active_sh_degree = min(self.sh_degree, start_iteration // 1000)
        t0 = time.time()
        # Per-iteration overflow watch: each step's overflow flag starts an
        # async device→host copy immediately and is consumed one iteration
        # later, so truncated-instance corruption is bounded to a single step
        # (the reference reallocates per call, `rasterize_points.cu:27-33`)
        # without a blocking sync in the hot loop.
        overflow_inflight: list = []
        nf_inflight: list = []
        for it in range(start_iteration + 1, iterations + 1):
            while overflow_inflight and (
                len(overflow_inflight) > 1 or overflow_inflight[0].is_ready()
            ):
                if bool(overflow_inflight.pop(0)):
                    self._grow_capacity()
                    overflow_inflight.clear()
            # SH degree warmup (`train_scene.py:76-77`)
            if it % 1000 == 0 and self.active_sh_degree < self.sh_degree:
                self.active_sh_degree += 1
            cam, gt = self._next_camera()
            self.state, metrics = train_step(
                self.state, cam.params, gt, self.bg,
                jnp.asarray(it, jnp.int32), self.spatial_lr_scale,
                self.active_sh_degree, h, self.config,
            )
            probe = metrics["overflow"]
            probe.copy_to_host_async()
            overflow_inflight.append(probe)
            nf = metrics["nonfinite"]
            nf.copy_to_host_async()
            nf_inflight.append((it, getattr(cam, "image_name", "?"), nf))
            while nf_inflight and (
                len(nf_inflight) > 1 or nf_inflight[0][2].is_ready()
            ):
                bad_it, bad_cam, flag = nf_inflight.pop(0)
                if bool(flag):
                    print(f"[ITER {bad_it}] WARNING: non-finite loss/grads "
                          f"(camera '{bad_cam}') — update skipped")
            # Densification — gating matches `train_scene.py:124-134`:
            # the opacity reset is NOT nested under the densify-from gate, so
            # white-bg scenes reset at exactly it == densify_from_iter and
            # periodic resets run for the whole `it < densify_until` window.
            if it < h.densify_until_iter:
                if it > h.densify_from_iter and it % h.densification_interval == 0:
                    # Sync point before densification grows the instance count
                    # further: drain any still-pending overflow flags.
                    if any(bool(f) for f in overflow_inflight):
                        self._grow_capacity()
                    overflow_inflight.clear()
                    self.key, sub = jax.random.split(self.key)
                    max_screen = 20.0 if it > h.opacity_reset_interval else 0.0
                    self.state = densify_step(
                        self.state, sub, self.extent, max_screen, h
                    )
                if it % h.opacity_reset_interval == 0 or (
                    self.white_background and it == h.densify_from_iter
                ):
                    self.state = gm.reset_opacity(self.state)
            if self.on_iteration:
                self.on_iteration(self, it, metrics)
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
        """Mean PSNR over views (`training_report`, `train_scene.py:167-202`).
        Jitted per resolution; all same-size cameras share one compile."""
        vals = []
        for cam in cameras:
            vals.append(float(_eval_step(
                self.state, cam.params, jnp.asarray(cam.image), self.bg,
                self.active_sh_degree, self.config,
            )[1]))
        return float(np.mean(vals))

    def eval_report(self, cameras, with_lpips: bool = False) -> dict:
        """Held-out L1 + PSNR (`training_report`, `train_scene.py:167-202`),
        plus LPIPS when requested and the optional dependency is installed
        (`lpipsPyTorch/__init__.py:6-21` — the reference's third metric)."""
        l1s, psnrs, lps = [], [], []
        lp_fn = None
        if with_lpips:
            from seganygaussians_tpu.utils import lpips_metric

            if lpips_metric.lpips_available():
                lp_fn = lpips_metric.lpips
        for cam in cameras:
            l1, ps = _eval_step(
                self.state, cam.params, jnp.asarray(cam.image), self.bg,
                self.active_sh_degree, self.config,
            )
            l1s.append(float(l1))
            psnrs.append(float(ps))
            if lp_fn is not None:
                img = np.clip(np.asarray(_render_image(
                    self.state, cam.params, self.bg,
                    self.active_sh_degree, self.config)), 0, 1)
                lps.append(lp_fn(img, np.asarray(cam.image)))
        out = {"l1": float(np.mean(l1s)), "psnr": float(np.mean(psnrs))}
        if lps:
            out["lpips"] = float(np.mean(lps))
        return out


@functools.partial(jax.jit, static_argnames=("active_sh_degree", "config"))
def _render_image(state, camera, bg, active_sh_degree, config):
    return rasterize(
        state.params.xyz,
        gm.get_opacity(state.params)[:, 0],
        camera,
        shs=gm.get_shs(state.params),
        sh_degree=active_sh_degree,
        scales=gm.get_scaling(state.params),
        rotations=gm.get_rotation(state.params),
        bg=bg,
        active_mask=state.alive,
        config=config,
    ).color


@functools.partial(jax.jit, static_argnames=("active_sh_degree", "config"))
def _eval_step(state, camera, gt, bg, active_sh_degree, config):
    out = rasterize(
        state.params.xyz,
        gm.get_opacity(state.params)[:, 0],
        camera,
        shs=gm.get_shs(state.params),
        sh_degree=active_sh_degree,
        scales=gm.get_scaling(state.params),
        rotations=gm.get_rotation(state.params),
        bg=bg,
        active_mask=state.alive,
        config=config,
    )
    img = jnp.clip(out.color, 0.0, 1.0)
    return losses.l1_loss(img, gt), losses.psnr(img, gt)
