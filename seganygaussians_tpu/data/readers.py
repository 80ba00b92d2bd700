"""Scene readers: COLMAP, Blender (NeRF-synthetic), LERF.

Parity target: `scene/dataset_readers.py` (371 LoC).  Returns ``SceneInfo``
with raw ``CameraInfo`` records; image pixels are loaded later by
``load_camera`` (resolution policy applied there).
"""

from __future__ import annotations

import json
import math
import os
from typing import NamedTuple, Optional

import numpy as np

from seganygaussians_tpu.data import colmap
from seganygaussians_tpu.data.cameras import CameraInfo
from seganygaussians_tpu.data.ply import load_point_cloud_ply, save_point_cloud_ply
from seganygaussians_tpu.ops.camera import focal2fov, fov2focal, get_world2view


class SceneInfo(NamedTuple):
    points: Optional[np.ndarray]  # (N, 3)
    colors: Optional[np.ndarray]  # (N, 3) in [0,1]
    train_cameras: list[CameraInfo]
    test_cameras: list[CameraInfo]
    translate: np.ndarray  # NeRF++ norm (`dataset_readers.py:51-72`)
    radius: float
    ply_path: str


def get_nerfpp_norm(cam_infos: list[CameraInfo]) -> tuple[np.ndarray, float]:
    """Camera-centroid radius normalisation (`dataset_readers.py:51-72`)."""
    centers = []
    for cam in cam_infos:
        w2c = get_world2view(cam.R, cam.T)
        centers.append(np.linalg.inv(w2c)[:3, 3])
    centers = np.stack(centers, axis=0)
    center = centers.mean(axis=0)
    diagonal = np.max(np.linalg.norm(centers - center, axis=-1))
    return -center, float(diagonal * 1.1)


def _sidecar(path: str, folder: str, image_name: str, enabled: bool):
    if not enabled:
        return None
    p = os.path.join(path, folder, image_name + ".pt")
    return p if os.path.exists(p) else None


def read_colmap_scene(
    path: str,
    images: Optional[str] = None,
    eval_split: bool = False,
    llffhold: int = 8,
    need_features: bool = False,
    need_masks: bool = False,
    sample_rate: float = 1.0,
    allow_principal_point_shift: bool = False,
    replica: bool = False,
) -> SceneInfo:
    """COLMAP scene (`dataset_readers.py:149-202`): bin/text fallback,
    ``sample_rate`` keeps the first sample_rate·10 of every 10 cameras,
    eval split takes every ``llffhold``-th view, points3D → cached PLY."""
    sparse = os.path.join(path, "sparse/0")
    cams, images_meta, pts = colmap.read_model(sparse)

    reading_dir = images if images else "images"
    infos = []
    for idx, key in enumerate(images_meta):
        if idx % 10 >= sample_rate * 10:  # `dataset_readers.py:77`
            continue
        extr = images_meta[key]
        intr = cams[extr.camera_id]
        if not (np.isfinite(extr.qvec).all() and np.isfinite(extr.tvec).all()):
            # A single NaN/inf pose poisons the whole optimizer state (one
            # NaN loss step → NaN Adam moments → every parameter NaN while
            # the logged loss stays finite at |GT|) — drop it loudly.
            print(f"[readers] skipping {extr.name}: non-finite pose")
            continue
        R = colmap.qvec2rotmat(extr.qvec).T
        T = np.array(extr.tvec)
        if intr.model == "SIMPLE_PINHOLE" or intr.model == "SIMPLE_RADIAL":
            fovy = focal2fov(intr.params[0], intr.height)
            fovx = focal2fov(intr.params[0], intr.width)
        elif intr.model == "PINHOLE":
            fovy = focal2fov(intr.params[1], intr.height)
            fovx = focal2fov(intr.params[0], intr.width)
        else:
            raise ValueError(f"unsupported COLMAP camera model {intr.model}")
        image_name = os.path.basename(extr.name).split(".")[0]
        shift_ok = len(intr.params) > 3 and allow_principal_point_shift
        infos.append(
            CameraInfo(
                uid=intr.id,
                R=R,
                T=T,
                fovx=fovx,
                fovy=fovy,
                image_path=os.path.join(path, reading_dir, os.path.basename(extr.name)),
                image_name=image_name,
                width=intr.width,
                height=intr.height,
                cx=intr.params[2] if shift_ok else None,
                cy=intr.params[3] if shift_ok else None,
                features_path=_sidecar(path, "clip_features", image_name, need_features),
                masks_path=_sidecar(path, "sam_masks", image_name, need_masks),
                mask_scales_path=_sidecar(path, "mask_scales", image_name, need_masks),
            )
        )

    if replica:
        infos.sort(key=lambda c: int(c.image_name.split("_")[-1]))
    else:
        infos.sort(key=lambda c: c.image_name)

    if eval_split:
        train = [c for i, c in enumerate(infos) if i % llffhold != 0]
        test = [c for i, c in enumerate(infos) if i % llffhold == 0]
    else:
        train, test = infos, []

    translate, radius = get_nerfpp_norm(train)

    ply_path = os.path.join(sparse, "points3D.ply")
    if not os.path.exists(ply_path) and pts is not None:
        xyz, rgb, _ = pts
        save_point_cloud_ply(ply_path, xyz.astype(np.float32), rgb / 255.0)
    points = colors = None
    if os.path.exists(ply_path):
        points, colors = load_point_cloud_ply(ply_path)

    return SceneInfo(points, colors, train, test, translate, radius, ply_path)


def _read_transforms(path, transformsfile, extension=".png"):
    """Blender transforms_*.json → CameraInfos (`dataset_readers.py:204-240`)."""
    from PIL import Image

    infos = []
    with open(os.path.join(path, transformsfile)) as f:
        contents = json.load(f)
    fovx = contents["camera_angle_x"]
    for idx, frame in enumerate(contents["frames"]):
        file_path = frame["file_path"]
        if not os.path.splitext(file_path)[1]:
            file_path = file_path + extension
        image_path = os.path.join(path, file_path)
        c2w = np.array(frame["transform_matrix"])
        c2w[:3, 1:3] *= -1  # OpenGL/Blender → COLMAP axis flip
        w2c = np.linalg.inv(c2w)
        R = np.transpose(w2c[:3, :3])
        T = w2c[:3, 3]
        with Image.open(image_path) as im:
            w, h = im.size
        fovy = focal2fov(fov2focal(fovx, w), h)
        infos.append(
            CameraInfo(
                uid=idx,
                R=R,
                T=T,
                fovx=fovx,
                fovy=fovy,
                image_path=image_path,
                image_name=os.path.basename(image_path).split(".")[0],
                width=w,
                height=h,
            )
        )
    return infos


def read_blender_scene(
    path: str,
    white_background: bool = False,
    eval_split: bool = False,
    extension: str = ".png",
) -> SceneInfo:
    """NeRF-synthetic scene (`dataset_readers.py:295-329`): transforms JSON
    cameras + 100k random init points if no cached PLY."""
    del white_background  # applied at image-load time (alpha compositing)
    train = _read_transforms(path, "transforms_train.json", extension)
    test = (
        _read_transforms(path, "transforms_test.json", extension)
        if os.path.exists(os.path.join(path, "transforms_test.json"))
        else []
    )
    if not eval_split:
        train = train + test
        test = []

    translate, radius = get_nerfpp_norm(train)

    ply_path = os.path.join(path, "points3d.ply")
    if not os.path.exists(ply_path):
        num_pts = 100_000
        rng = np.random.default_rng(0)
        xyz = rng.random((num_pts, 3)) * 2.6 - 1.3
        from seganygaussians_tpu.ops.sh import SH_C0

        shs = rng.random((num_pts, 3)) / 255.0
        colors = shs * SH_C0 + 0.5  # SH2RGB (`dataset_readers.py:314`)
        save_point_cloud_ply(ply_path, xyz.astype(np.float32), colors)
    points, colors = load_point_cloud_ply(ply_path)

    return SceneInfo(points, colors, train, test, translate, radius, ply_path)


def read_lerf_scene(path: str, extension: str = ".png") -> SceneInfo:
    """LERF scene (`dataset_readers.py:331-366`): single transforms.json with
    per-frame intrinsics (fl_x/fl_y/cx/cy), no eval split."""
    infos = []
    with open(os.path.join(path, "transforms.json")) as f:
        contents = json.load(f)
    frames = contents["frames"]
    for idx, frame in enumerate(frames):
        image_path = os.path.join(path, frame["file_path"])
        c2w = np.array(frame["transform_matrix"])
        c2w[:3, 1:3] *= -1
        w2c = np.linalg.inv(c2w)
        R = np.transpose(w2c[:3, :3])
        T = w2c[:3, 3]
        w = int(frame.get("w", contents.get("w")))
        h = int(frame.get("h", contents.get("h")))
        fl_x = float(frame.get("fl_x", contents.get("fl_x")))
        fl_y = float(frame.get("fl_y", contents.get("fl_y", fl_x)))
        infos.append(
            CameraInfo(
                uid=idx,
                R=R,
                T=T,
                fovx=focal2fov(fl_x, w),
                fovy=focal2fov(fl_y, h),
                image_path=image_path,
                image_name=os.path.basename(image_path).split(".")[0],
                width=w,
                height=h,
                cx=float(frame.get("cx", contents.get("cx", w / 2))),
                cy=float(frame.get("cy", contents.get("cy", h / 2))),
            )
        )
    translate, radius = get_nerfpp_norm(infos)
    ply_path = os.path.join(path, "points3d.ply")
    points = colors = None
    if os.path.exists(ply_path):
        points, colors = load_point_cloud_ply(ply_path)
    return SceneInfo(points, colors, infos, [], translate, radius, ply_path)


def detect_and_read(path: str, **kwargs) -> SceneInfo:
    """Colmap vs Blender vs LERF auto-detect (`scene/__init__.py:97-109`)."""
    if os.path.exists(os.path.join(path, "sparse")):
        allowed = (
            "images", "eval_split", "llffhold", "need_features", "need_masks",
            "sample_rate", "allow_principal_point_shift", "replica",
        )
        return read_colmap_scene(path, **{k: v for k, v in kwargs.items() if k in allowed})
    if os.path.exists(os.path.join(path, "transforms_train.json")):
        allowed = ("white_background", "eval_split", "extension")
        return read_blender_scene(path, **{k: v for k, v in kwargs.items() if k in allowed})
    if os.path.exists(os.path.join(path, "transforms.json")):
        return read_lerf_scene(path)
    raise ValueError(f"could not recognise scene type at {path}")
