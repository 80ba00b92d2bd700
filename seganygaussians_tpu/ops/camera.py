"""Camera math: world→view, perspective projection, FoV helpers.

Semantics match the reference pipeline (see /root/reference/utils/graphics_utils.py:38-104
and /root/reference/scene/cameras.py:17-65): matrices are stored so that a ROW
vector multiplies on the LEFT, i.e. ``p_clip = [x y z 1] @ full_proj``.  The
view matrix additionally supports the optional principal-point shift used by
SAGA's LERF/3DOVS data (``allow_principle_point_shift``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax.numpy as jnp
import numpy as np


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def get_world2view(
    R: np.ndarray,
    t: np.ndarray,
    translate: np.ndarray | None = None,
    scale: float = 1.0,
) -> np.ndarray:
    """World→view 4×4 (row-major, column-vector convention internally).

    ``R`` is the camera-to-world rotation as stored by COLMAP readers and ``t``
    the world-to-camera translation — identical convention to the reference
    (`utils/graphics_utils.py:38-49`).  ``translate``/``scale`` recentre the
    scene (NeRF++ normalisation).
    """
    if translate is None:
        translate = np.zeros(3)
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    c2w = np.linalg.inv(Rt)
    cam_center = (c2w[:3, 3] + translate) * scale
    c2w[:3, 3] = cam_center
    return np.linalg.inv(c2w).astype(np.float32)


def get_projection_matrix(
    znear: float,
    zfar: float,
    fovx: float,
    fovy: float,
    w: Optional[float] = None,
    h: Optional[float] = None,
    cx: Optional[float] = None,
    cy: Optional[float] = None,
    allow_principal_point_shift: bool = True,
) -> np.ndarray:
    """Perspective projection (column-vector convention), matching
    `utils/graphics_utils.py:51-98` including the principal-point window shift."""
    tan_half_fovy = math.tan(fovy / 2.0)
    tan_half_fovx = math.tan(fovx / 2.0)

    top = tan_half_fovy * znear
    bottom = -top
    right = tan_half_fovx * znear
    left = -right

    if None not in (w, h, cx, cy) and allow_principal_point_shift:
        focal_x = w / (2.0 * math.tan(fovx / 2.0))
        focal_y = h / (2.0 * math.tan(fovy / 2.0))
        offset_x = (cx - w / 2.0) / focal_x * znear
        offset_y = (cy - h / 2.0) / focal_y * znear
        top += offset_y
        bottom += offset_y
        left += offset_x
        right += offset_x

    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


@dataclasses.dataclass(frozen=True)
class CameraParams:
    """Device-side camera bundle consumed by the rasterizer.

    ``world_view`` and ``full_proj`` follow the reference's row-vector
    convention (`scene/cameras.py:56-62`): ``p_view = p_hom @ world_view`` and
    ``p_clip = p_hom @ full_proj``.  Width/height/tanfov are *static* Python
    values so each resolution compiles once.
    """

    world_view: jnp.ndarray  # (4, 4)
    full_proj: jnp.ndarray  # (4, 4)
    cam_center: jnp.ndarray  # (3,)
    width: int
    height: int
    tan_fovx: float
    tan_fovy: float

    @property
    def focal_x(self) -> float:
        return self.width / (2.0 * self.tan_fovx)

    @property
    def focal_y(self) -> float:
        return self.height / (2.0 * self.tan_fovy)


# Pytree registration: matrices are traced leaves; width/height/tanfov are
# static aux data (shapes and tile grids depend on them), so jitted train
# steps recompile once per camera *resolution*, not per camera.
import jax.tree_util as _jtu  # noqa: E402

_jtu.register_pytree_node(
    CameraParams,
    lambda c: (
        (c.world_view, c.full_proj, c.cam_center),
        (c.width, c.height, c.tan_fovx, c.tan_fovy),
    ),
    lambda aux, children: CameraParams(*children, *aux),
)


def make_camera(
    R: np.ndarray,
    t: np.ndarray,
    fovx: float,
    fovy: float,
    width: int,
    height: int,
    znear: float = 0.01,
    zfar: float = 100.0,
    translate: np.ndarray | None = None,
    scale: float = 1.0,
    cx: Optional[float] = None,
    cy: Optional[float] = None,
    allow_principal_point_shift: bool = False,
) -> CameraParams:
    """Build a CameraParams from COLMAP-style extrinsics, mirroring
    `scene/cameras.py:52-65`."""
    w2v = get_world2view(R, t, translate, scale)  # column-vector 4x4
    world_view = w2v.T  # row-vector convention
    if allow_principal_point_shift and cx is not None and cy is not None:
        proj = get_projection_matrix(
            znear, zfar, fovx, fovy, width, height, cx, cy, True
        )
    else:
        proj = get_projection_matrix(znear, zfar, fovx, fovy)
    full_proj = world_view @ proj.T
    cam_center = np.linalg.inv(w2v)[:3, 3]
    return CameraParams(
        world_view=jnp.asarray(world_view, dtype=jnp.float32),
        full_proj=jnp.asarray(full_proj, dtype=jnp.float32),
        cam_center=jnp.asarray(cam_center, dtype=jnp.float32),
        width=int(width),
        height=int(height),
        tan_fovx=float(math.tan(fovx / 2.0)),
        tan_fovy=float(math.tan(fovy / 2.0)),
    )
