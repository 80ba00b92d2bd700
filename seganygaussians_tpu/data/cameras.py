"""Host-side camera containers: images, SAM/CLIP sidecars, device params.

Parity targets: `scene/cameras.py:17-78` (Camera/MiniCam) and
`utils/camera_utils.py:19-56` (resolution policy).  The torch ``nn.Module``
camera becomes a plain dataclass holding numpy pixels + a ``CameraParams``
bundle for the rasterizer; sidecars (SAM masks, mask scales, CLIP features)
stay numpy until a training step consumes them.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional

import numpy as np

from seganygaussians_tpu.ops.camera import CameraParams, make_camera


class CameraInfo(NamedTuple):
    """Raw per-view record from a dataset reader (`dataset_readers.py:29-44`)."""

    uid: int
    R: np.ndarray  # (3,3) cam-to-world rotation (COLMAP convention)
    T: np.ndarray  # (3,) world-to-cam translation
    fovx: float
    fovy: float
    image_path: str
    image_name: str
    width: int
    height: int
    cx: Optional[float] = None
    cy: Optional[float] = None
    features_path: Optional[str] = None  # clip_features/<name>.pt
    masks_path: Optional[str] = None  # sam_masks/<name>.pt
    mask_scales_path: Optional[str] = None  # mask_scales/<name>.pt


@dataclasses.dataclass
class Camera:
    """A loaded training/eval view.

    ``image`` is float32 (H, W, 3) in [0, 1]; alpha (if present in the source)
    is premultiplied like `scene/cameras.py:52-55`.  ``params`` is the
    device-side camera for :func:`seganygaussians_tpu.ops.rasterize`.
    Sidecars are lazy: .pt paths are loaded on first access (torch-cpu).
    """

    uid: int
    colmap_id: int
    image_name: str
    image: np.ndarray  # (H, W, 3) float32
    params: CameraParams
    fovx: float
    fovy: float
    # feature rendering resolution — reference hack pinning feature_width=100
    # (`scene/cameras.py:47-49`)
    feature_width: int = 100
    feature_height: int = 0
    _masks_path: Optional[str] = None
    _mask_scales_path: Optional[str] = None
    _features_path: Optional[str] = None
    _masks: Optional[np.ndarray] = None
    _mask_scales: Optional[np.ndarray] = None
    _features: Optional[np.ndarray] = None

    @property
    def width(self) -> int:
        return self.params.width

    @property
    def height(self) -> int:
        return self.params.height

    def _load_pt(self, path):
        import torch

        t = torch.load(path, map_location="cpu", weights_only=False)
        return np.asarray(t)

    @property
    def sam_masks(self) -> Optional[np.ndarray]:
        """(K, h, w) bool stack from extract_segment_everything_masks."""
        if self._masks is None and self._masks_path:
            self._masks = self._load_pt(self._masks_path)
        return self._masks

    @property
    def mask_scales(self) -> Optional[np.ndarray]:
        """(K,) per-mask 3D scale from get_scale."""
        if self._mask_scales is None and self._mask_scales_path:
            self._mask_scales = self._load_pt(self._mask_scales_path)
        return self._mask_scales

    @property
    def clip_features(self) -> Optional[np.ndarray]:
        """(K, D) per-mask CLIP features from get_clip_features."""
        if self._features is None and self._features_path:
            self._features = self._load_pt(self._features_path)
        return self._features

    def feature_params(self) -> CameraParams:
        """Camera at the (low) feature-render resolution
        (`gaussian_renderer/__init__.py:319-320`)."""
        return dataclasses.replace(
            self.params, width=self.feature_width, height=self.feature_height
        )


def compute_resolution(
    orig_w: int, orig_h: int, resolution: int, resolution_scale: float = 1.0
) -> tuple[int, int]:
    """The `-r` flag policy (`utils/camera_utils.py:22-40`): 1/2/4/8 divide;
    -1 auto-downscales >1600px-wide images to 1600."""
    if resolution in (1, 2, 4, 8):
        return (
            round(orig_w / (resolution_scale * resolution)),
            round(orig_h / (resolution_scale * resolution)),
        )
    if resolution == -1:
        global_down = orig_w / 1600 if orig_w > 1600 else 1
    else:
        global_down = orig_w / resolution
    scale = float(global_down) * float(resolution_scale)
    return int(orig_w / scale), int(orig_h / scale)


def load_camera(
    info: CameraInfo,
    uid: int,
    resolution: int = -1,
    resolution_scale: float = 1.0,
    white_background: bool = False,
    translate: Optional[np.ndarray] = None,
    scale: float = 1.0,
    allow_principal_point_shift: bool = False,
) -> Camera:
    """Load + resize one view (`utils/camera_utils.py:19-56` / `loadCam`)."""
    from PIL import Image

    pil = Image.open(info.image_path)
    w, h = compute_resolution(pil.width, pil.height, resolution, resolution_scale)
    pil = pil.resize((w, h))
    arr = np.asarray(pil).astype(np.float32) / 255.0
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.shape[2] == 4:
        alpha = arr[:, :, 3:4]
        bg = 1.0 if white_background else 0.0
        arr = arr[:, :, :3] * alpha + bg * (1.0 - alpha)
    else:
        arr = arr[:, :, :3]

    params = make_camera(
        info.R,
        info.T,
        fovx=info.fovx,
        fovy=info.fovy,
        width=w,
        height=h,
        translate=translate,
        scale=scale,
        cx=info.cx * w / info.width if info.cx is not None else None,
        cy=info.cy * h / info.height if info.cy is not None else None,
        allow_principal_point_shift=allow_principal_point_shift,
    )
    cam = Camera(
        uid=uid,
        colmap_id=info.uid,
        image_name=info.image_name,
        image=np.clip(arr, 0.0, 1.0),
        params=params,
        fovx=info.fovx,
        fovy=info.fovy,
        _masks_path=info.masks_path,
        _mask_scales_path=info.mask_scales_path,
        _features_path=info.features_path,
    )
    cam.feature_height = int(cam.feature_width * h / w)
    return cam


def orbit_camera_params(
    center: np.ndarray,
    radius: float,
    azimuth: float,
    elevation: float,
    fovy: float,
    width: int,
    height: int,
) -> CameraParams:
    """Orbit camera for the interactive viewer (`saga_gui.py:70-177`)."""
    fovx = 2.0 * math.atan(math.tan(fovy / 2.0) * width / height)
    ce, se = math.cos(elevation), math.sin(elevation)
    ca, sa = math.cos(azimuth), math.sin(azimuth)
    # camera position on the sphere, looking at center (y-up world)
    eye = center + radius * np.array([ce * sa, se, ce * ca])
    fwd = center - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    up2 = np.cross(right, fwd)
    # world-to-cam: rows are the basis; camera looks down +z (COLMAP style)
    Rwc = np.stack([right, -up2, fwd], axis=0)
    t = -Rwc @ eye
    return make_camera(Rwc.T, t, fovx=fovx, fovy=fovy, width=width, height=height)
