"""Interactive 3D segmentation session (parity: `saga_gui.py`).

`saga_gui.py` couples its logic to dearpygui widgets; here the session logic
(orbit camera, per-frame RGB + feature render, PCA preview, scale-gated click
similarity, 3D clustering overlay, segment3d, mask save/undo) lives in a
headless :class:`SagaSession` so it is testable and scriptable; any widget
toolkit (or a notebook) can drive it.  Frame loop parity map:

* render modes RGB / PCA / similarity / cluster   (`saga_gui.py:701-726`)
* scale slider → quantile-normalised gate         (`:596-653`)
* left-click → chosen feature, score map          (`:630-653`)
* segment3d: per-Gaussian gated similarity > τ    (`:662-688`)
* cluster_in_3D: sample → cluster → seg_score     (`:518-544`, XLA kmeans)
* save mask → ./segmentation_res/<name>.pt        (`:690-699`)
* roll_back / clear                               (`scene/gaussian_model.py:430-472`)
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from seganygaussians_tpu.data.cameras import orbit_camera_params
from seganygaussians_tpu.models import feature_gaussians as fgm
from seganygaussians_tpu.models import gaussians as gm
from seganygaussians_tpu.ops.rasterize import RasterConfig, rasterize
from seganygaussians_tpu.seg import clustering, queries
from seganygaussians_tpu.seg.scale_gate import ScaleGateParams


def render_view(
    state: gm.GaussianState,
    camera,
    sh_degree: int = 3,
    config: Optional[RasterConfig] = None,
) -> np.ndarray:
    """One RGB frame for an arbitrary camera — the network-viewer render
    (`train_scene.py:59-62`: render custom_cam, clamp, to bytes)."""
    cfg = config or RasterConfig()
    out = rasterize(
        state.params.xyz, gm.get_opacity(state.params)[:, 0], camera,
        shs=gm.get_shs(state.params), sh_degree=sh_degree,
        scales=gm.get_scaling(state.params),
        rotations=gm.get_rotation(state.params),
        active_mask=state.alive, config=cfg,
    )
    return np.clip(np.asarray(out.color), 0.0, 1.0)


@dataclasses.dataclass
class OrbitState:
    """Orbit camera state (`saga_gui.py:70-177`)."""

    center: np.ndarray
    radius: float = 4.0
    azimuth: float = 0.0
    elevation: float = 0.0
    fovy: float = 0.8
    width: int = 800
    height: int = 600

    def rotate(self, d_az: float, d_el: float):
        self.azimuth += d_az
        self.elevation = float(np.clip(self.elevation + d_el, -1.5, 1.5))

    def zoom(self, factor: float):
        self.radius = float(np.clip(self.radius * factor, 0.05, 100.0))

    def pan(self, dx: float, dy: float):
        self.center = self.center + np.array([dx, dy, 0.0]) * self.radius * 0.1

    def params(self):
        return orbit_camera_params(
            self.center, self.radius, self.azimuth, self.elevation,
            self.fovy, self.width, self.height,
        )


class SagaSession:
    """Headless interactive segmentation over a trained scene + feature field."""

    def __init__(
        self,
        scene_state: gm.GaussianState,
        feature_state: fgm.FeatureState,
        gate_params: ScaleGateParams,
        scale_qt,  # ops.quantile.QuantileTransform over mask scales
        config: RasterConfig = RasterConfig(),
        seed: int = 0,
    ):
        self.scene_state = scene_state
        self.feature_state = feature_state
        self.gate = gate_params
        self.qt = scale_qt
        self.config = config
        self.key = jax.random.PRNGKey(seed)
        # Orbit around the alive-point centroid (the GUI's initial framing;
        # `saga_gui.py:70-177` starts its OrbitCamera at the scene center).
        alive = scene_state.alive
        denom = jnp.maximum(jnp.sum(alive), 1)
        centroid = jnp.sum(
            jnp.where(alive[:, None], scene_state.params.xyz, 0.0), axis=0
        ) / denom
        self.orbit = OrbitState(center=np.asarray(centroid))
        self.scale = 0.5  # slider value, already in [0, 1] quantile space
        self.threshold = 0.75  # `prompt_segmenting.ipynb` cell 24
        self.chosen_features: list[jnp.ndarray] = []
        self._undo: list[tuple] = []
        self._pca_proj = None
        self.cluster_centers = None

    # ---------------- rendering ----------------

    def _gated_gaussian_features(self) -> jnp.ndarray:
        feats = fgm.smoothed_point_features(self.feature_state, key=None, dropout=-1.0)
        return queries.gate_features(feats, self.gate, jnp.asarray(self.scale))

    def render_rgb(self, cam=None) -> np.ndarray:
        cam = cam or self.orbit.params()
        st = self.scene_state
        out = rasterize(
            st.params.xyz, gm.get_opacity(st.params)[:, 0], cam,
            shs=gm.get_shs(st.params), sh_degree=0,
            scales=gm.get_scaling(st.params),
            rotations=gm.get_rotation(st.params),
            active_mask=st.alive, config=self.config,
        )
        return np.clip(np.asarray(out.color), 0, 1)

    def render_feature_map(self, cam=None) -> jnp.ndarray:
        cam = cam or self.orbit.params()
        fs = self.feature_state
        gated = self._gated_gaussian_features()
        out = rasterize(
            fs.geom.xyz, fgm.get_opacity(fs.geom)[:, 0], cam,
            colors=gated,
            scales=fgm.get_scaling(fs.geom),
            rotations=fgm.get_rotation(fs.geom),
            bg=jnp.zeros((gated.shape[-1],), jnp.float32),
            active_mask=fs.geom.alive, config=self.config,
        )
        return out.color  # (H, W, D)

    def render_pca(self, cam=None) -> np.ndarray:
        fmap = self.render_feature_map(cam)
        if self._pca_proj is None:
            self.key, sub = jax.random.split(self.key)
            self._pca_proj = queries.feature_pca(
                fmap.reshape(-1, fmap.shape[-1]), key=sub
            )
        return np.asarray(queries.apply_pca(fmap, self._pca_proj))

    def render_similarity(self, cam=None) -> np.ndarray:
        """Score map vs the accumulated click features (`saga_gui.py:630-653`)."""
        fmap = self.render_feature_map(cam)
        if not self.chosen_features:
            return np.zeros(fmap.shape[:2], np.float32)
        prompts = jnp.stack(self.chosen_features)
        fmap_n = fmap / jnp.linalg.norm(fmap, axis=-1, keepdims=True).clip(1e-9)
        score = jnp.max(jnp.einsum("hwc,pc->hwp", fmap_n, prompts), axis=-1)
        return np.asarray(score)

    def render_cluster(self, cam=None) -> np.ndarray:
        """Cluster-id color overlay (`saga_gui.py:518-544` + mode :713-720)."""
        if self.cluster_centers is None:
            self.cluster_in_3d()
        fmap = self.render_feature_map(cam)
        fmap_n = fmap / jnp.linalg.norm(fmap, axis=-1, keepdims=True).clip(1e-9)
        labels = jnp.argmax(
            jnp.einsum("hwc,kc->hwk", fmap_n, self.cluster_centers), axis=-1
        )
        k = self.cluster_centers.shape[0]
        palette = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(7), (k, 3), minval=0.2)
        )
        return palette[np.asarray(labels)]

    # ---------------- interaction ----------------

    def click(self, x: int, y: int, cam=None) -> None:
        """Record the clicked pixel's gated feature as a prompt."""
        fmap = self.render_feature_map(cam)
        feat = fmap[y, x]
        feat = feat / jnp.linalg.norm(feat).clip(1e-9)
        self.chosen_features.append(feat)

    def clear_clicks(self) -> None:
        self.chosen_features = []

    def cluster_in_3d(self, k: int = 32) -> None:
        self.key, sub = jax.random.split(self.key)
        gated = self._gated_gaussian_features()
        alive_idx = np.flatnonzero(np.asarray(self.feature_state.geom.alive))
        self.cluster_centers = clustering.cluster_features(
            sub, gated[alive_idx], k=min(k, len(alive_idx)), sample_rate=0.02
        )

    def segment3d(self) -> jnp.ndarray:
        """Apply the current prompts: returns + applies the 3D mask
        (`saga_gui.py:662-688`), pushing undo state."""
        assert self.chosen_features, "click at least once"
        feats = fgm.smoothed_point_features(self.feature_state, key=None, dropout=-1.0)
        mask = queries.segment3d(
            feats, self.gate, jnp.asarray(self.scale),
            jnp.stack(self.chosen_features), threshold=self.threshold,
            alive=self.scene_state.alive,
        )
        self._undo.append(
            (self.scene_state.alive, self.feature_state.geom.alive)
        )
        self.scene_state = gm.segment(self.scene_state, mask)
        self.feature_state = self.feature_state._replace(
            geom=self.feature_state.geom._replace(
                alive=self.feature_state.geom.alive & mask
            )
        )
        return mask

    def roll_back(self) -> None:
        """Undo the last segment (`scene/gaussian_model.py:430-445`)."""
        if not self._undo:
            return
        scene_alive, feat_alive = self._undo.pop()
        self.scene_state = self.scene_state._replace(alive=scene_alive)
        self.feature_state = self.feature_state._replace(
            geom=self.feature_state.geom._replace(alive=feat_alive)
        )

    def save_mask(self, name: str = "final_mask",
                  out_dir: str = "./segmentation_res") -> str:
        """`saga_gui.py:690-699` — torch-compatible bool tensor."""
        import torch

        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"{name}.pt")
        torch.save(torch.tensor(np.asarray(self.scene_state.alive)), path)
        return path
