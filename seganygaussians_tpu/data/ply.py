"""Minimal self-contained PLY reader/writer + 3DGS attribute schemas.

Replaces the reference's `plyfile` dependency.  Supports the formats the 3DGS
ecosystem actually uses: ``binary_little_endian`` and ``ascii``, float32/
float64/uint8 scalar properties, single `vertex` element (list properties are
skipped on read headers that contain none — 3DGS PLYs never do).

Attribute schemas match the reference exactly so PLYs interoperate both ways:

* scene model  (`scene/gaussian_model.py:201-234`):
  x y z nx ny nz f_dc_0..2 f_rest_0..(3R-1) opacity scale_0..2 rot_0..3
  with SH coefficients flattened **channel-major** (transpose(1,2).flatten).
* feature model (`scene/gaussian_model_ff.py:552-594`):
  x y z nx ny nz f_0..(D-1) opacity scale_0..2 rot_0..3
"""

from __future__ import annotations

import os
from typing import Mapping

import numpy as np

_DTYPES = {
    "float": np.float32,
    "float32": np.float32,
    "double": np.float64,
    "float64": np.float64,
    "uchar": np.uint8,
    "uint8": np.uint8,
    "char": np.int8,
    "int8": np.int8,
    "short": np.int16,
    "ushort": np.uint16,
    "int": np.int32,
    "int32": np.int32,
    "uint": np.uint32,
}


def read_ply(path: str) -> dict[str, np.ndarray]:
    """Read a PLY file's `vertex` element into {property: (N,) array}."""
    with open(path, "rb") as f:
        magic = f.readline().strip()
        assert magic == b"ply", f"not a PLY file: {path}"
        fmt = None
        elements: list[tuple[str, int, list[tuple[str, np.dtype]]]] = []
        props: list[tuple[str, np.dtype]] = []
        while True:
            line = f.readline()
            if not line:
                raise ValueError("unterminated PLY header")
            tokens = line.decode("ascii").strip().split()
            if not tokens:
                continue
            if tokens[0] == "format":
                fmt = tokens[1]
            elif tokens[0] == "element":
                props = []
                elements.append((tokens[1], int(tokens[2]), props))
            elif tokens[0] == "property":
                if tokens[1] == "list":
                    raise ValueError("list properties unsupported")
                props.append((tokens[-1], np.dtype(_DTYPES[tokens[1]])))
            elif tokens[0] == "end_header":
                break

        out: dict[str, np.ndarray] = {}
        for name, count, eprops in elements:
            dtype = np.dtype(
                [(p, d.newbyteorder("<" if fmt != "binary_big_endian" else ">"))
                 for p, d in eprops]
            )
            if fmt == "ascii":
                rows = np.loadtxt(
                    (f.readline() for _ in range(count)), dtype=np.float64, ndmin=2
                )
                rec = np.zeros(count, dtype=dtype)
                for i, (p, _) in enumerate(eprops):
                    rec[p] = rows[:, i]
            else:
                rec = np.frombuffer(f.read(count * dtype.itemsize), dtype=dtype)
            if name == "vertex":
                for p, _ in eprops:
                    out[p] = np.ascontiguousarray(rec[p])
        return out


def write_ply(path: str, data: Mapping[str, np.ndarray], order: list[str]) -> None:
    """Write named float32 columns as a binary_little_endian vertex element."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n = len(next(iter(data.values())))
    dtype = np.dtype([(name, "<f4") for name in order])
    rec = np.zeros(n, dtype=dtype)
    for name in order:
        rec[name] = np.asarray(data[name], np.float32)
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    header += [f"property float {name}" for name in order]
    header += ["end_header"]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(rec.tobytes())


# --------------------------------------------------------------------------
# 3DGS scene-model schema
# --------------------------------------------------------------------------


def save_gaussians_ply(
    path: str,
    xyz: np.ndarray,  # (N, 3)
    features_dc: np.ndarray,  # (N, 1, 3)
    features_rest: np.ndarray,  # (N, R, 3)
    opacity: np.ndarray,  # (N, 1)
    scaling: np.ndarray,  # (N, 3)
    rotation: np.ndarray,  # (N, 4)
) -> None:
    n = xyz.shape[0]
    f_dc = features_dc.transpose(0, 2, 1).reshape(n, -1)  # channel-major
    f_rest = features_rest.transpose(0, 2, 1).reshape(n, -1)
    cols: dict[str, np.ndarray] = {}
    order = []
    for i, ax in enumerate("xyz"):
        cols[ax] = xyz[:, i]
        order.append(ax)
    for ax in ("nx", "ny", "nz"):
        cols[ax] = np.zeros(n, np.float32)
        order.append(ax)
    for i in range(f_dc.shape[1]):
        cols[f"f_dc_{i}"] = f_dc[:, i]
        order.append(f"f_dc_{i}")
    for i in range(f_rest.shape[1]):
        cols[f"f_rest_{i}"] = f_rest[:, i]
        order.append(f"f_rest_{i}")
    cols["opacity"] = opacity[:, 0]
    order.append("opacity")
    for i in range(scaling.shape[1]):
        cols[f"scale_{i}"] = scaling[:, i]
        order.append(f"scale_{i}")
    for i in range(rotation.shape[1]):
        cols[f"rot_{i}"] = rotation[:, i]
        order.append(f"rot_{i}")
    write_ply(path, cols, order)


def load_gaussians_ply(path: str) -> dict[str, np.ndarray]:
    """Read a 3DGS PLY → pre-activation arrays with our layouts.

    Mirrors `scene/gaussian_model.py:271-321` (load_ply) including the sorted
    f_rest index ordering and the (N, 3, R) → (N, R, 3) transpose.
    """
    v = read_ply(path)
    n = v["x"].shape[0]
    xyz = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float32)
    opacity = v["opacity"].reshape(n, 1).astype(np.float32)

    f_dc = np.stack([v[f"f_dc_{i}"] for i in range(3)], axis=1)  # (N, 3)
    rest_names = sorted(
        (k for k in v if k.startswith("f_rest_")), key=lambda k: int(k.split("_")[-1])
    )
    r3 = len(rest_names)
    assert r3 % 3 == 0
    f_rest = np.stack([v[k] for k in rest_names], axis=1).reshape(n, 3, r3 // 3)

    scale_names = sorted(
        (k for k in v if k.startswith("scale_")), key=lambda k: int(k.split("_")[-1])
    )
    rot_names = sorted(
        (k for k in v if k.startswith("rot_")), key=lambda k: int(k.split("_")[-1])
    )
    return {
        "xyz": xyz,
        "features_dc": f_dc[:, None, :].astype(np.float32),  # (N, 1, 3)
        "features_rest": f_rest.transpose(0, 2, 1).astype(np.float32),  # (N, R, 3)
        "opacity": opacity,
        "scaling": np.stack([v[k] for k in scale_names], axis=1).astype(np.float32),
        "rotation": np.stack([v[k] for k in rot_names], axis=1).astype(np.float32),
    }


# --------------------------------------------------------------------------
# Feature-model schema (`scene/gaussian_model_ff.py:552-594`)
# --------------------------------------------------------------------------


def save_feature_gaussians_ply(
    path: str,
    xyz: np.ndarray,  # (N, 3)
    features: np.ndarray,  # (N, D)
    opacity: np.ndarray,  # (N, 1)
    scaling: np.ndarray,  # (N, 3)
    rotation: np.ndarray,  # (N, 4)
) -> None:
    n = xyz.shape[0]
    cols: dict[str, np.ndarray] = {}
    order = []
    for i, ax in enumerate("xyz"):
        cols[ax] = xyz[:, i]
        order.append(ax)
    for ax in ("nx", "ny", "nz"):
        cols[ax] = np.zeros(n, np.float32)
        order.append(ax)
    for i in range(features.shape[1]):
        cols[f"f_{i}"] = features[:, i]
        order.append(f"f_{i}")
    cols["opacity"] = opacity[:, 0]
    order.append("opacity")
    for i in range(scaling.shape[1]):
        cols[f"scale_{i}"] = scaling[:, i]
        order.append(f"scale_{i}")
    for i in range(rotation.shape[1]):
        cols[f"rot_{i}"] = rotation[:, i]
        order.append(f"rot_{i}")
    write_ply(path, cols, order)


def load_feature_gaussians_ply(path: str) -> dict[str, np.ndarray]:
    v = read_ply(path)
    n = v["x"].shape[0]
    f_names = sorted(
        (k for k in v if k.startswith("f_") and k.split("_")[-1].isdigit()
         and not k.startswith(("f_dc", "f_rest"))),
        key=lambda k: int(k.split("_")[-1]),
    )
    scale_names = sorted(
        (k for k in v if k.startswith("scale_")), key=lambda k: int(k.split("_")[-1])
    )
    rot_names = sorted(
        (k for k in v if k.startswith("rot_")), key=lambda k: int(k.split("_")[-1])
    )
    return {
        "xyz": np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float32),
        "features": np.stack([v[k] for k in f_names], axis=1).astype(np.float32),
        "opacity": v["opacity"].reshape(n, 1).astype(np.float32),
        "scaling": np.stack([v[k] for k in scale_names], axis=1).astype(np.float32),
        "rotation": np.stack([v[k] for k in rot_names], axis=1).astype(np.float32),
    }


def save_point_cloud_ply(path: str, points: np.ndarray, colors: np.ndarray) -> None:
    """Plain xyz+rgb+normals point cloud (`scene/dataset_readers.py:124-138`)."""
    n = points.shape[0]
    cols = {
        "x": points[:, 0], "y": points[:, 1], "z": points[:, 2],
        "nx": np.zeros(n), "ny": np.zeros(n), "nz": np.zeros(n),
        "red": colors[:, 0] * 255.0, "green": colors[:, 1] * 255.0,
        "blue": colors[:, 2] * 255.0,
    }
    write_ply(path, cols, list(cols.keys()))


def load_point_cloud_ply(path: str) -> tuple[np.ndarray, np.ndarray]:
    v = read_ply(path)
    points = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float32)
    if "red" in v:
        scale = 255.0 if v["red"].dtype == np.uint8 else 1.0
        colors = np.stack([v["red"], v["green"], v["blue"]], axis=1).astype(
            np.float32
        ) / scale
        if colors.max() > 1.5:  # float-valued 0..255
            colors = colors / 255.0
    else:
        colors = np.full_like(points, 0.5)
    return points, colors
