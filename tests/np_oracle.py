"""Slow NumPy oracle: a literal re-statement of the CUDA rasterizer algorithm
(per-pixel sequential front-to-back march, `cuda_rasterizer/forward.cu`),
independent of the vectorized JAX implementation.  Used only in tests."""

from __future__ import annotations

import numpy as np


def compute_cov3d(scales, rotations, scale_modifier=1.0):
    n = scales.shape[0]
    out = np.zeros((n, 6), dtype=np.float64)
    for i in range(n):
        q = rotations[i] / np.linalg.norm(rotations[i])
        r, x, y, z = q
        R = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
                [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
                [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
            ]
        )
        S = np.diag(scale_modifier * scales[i])
        L = R @ S
        sigma = L @ L.T
        out[i] = [
            sigma[0, 0],
            sigma[0, 1],
            sigma[0, 2],
            sigma[1, 1],
            sigma[1, 2],
            sigma[2, 2],
        ]
    return out


def rasterize_reference(
    means3d,
    opacities,
    colors,
    scales,
    rotations,
    world_view,  # (4,4) row-vector convention: p_view = [p,1] @ world_view
    full_proj,
    width,
    height,
    tan_fovx,
    tan_fovy,
    bg,
    tile_size=16,
):
    """Returns (image, final_T, n_contrib (count of included), radii)."""
    n = means3d.shape[0]
    c = colors.shape[1]
    fx = width / (2.0 * tan_fovx)
    fy = height / (2.0 * tan_fovy)
    grid_x = (width + tile_size - 1) // tile_size
    grid_y = (height + tile_size - 1) // tile_size

    cov3d = compute_cov3d(scales, rotations)

    means2d = np.zeros((n, 2))
    depths = np.zeros(n)
    conics = np.zeros((n, 3))
    radii = np.zeros(n, dtype=np.int32)
    rects = np.zeros((n, 4), dtype=np.int32)
    valid = np.zeros(n, dtype=bool)

    Wv = world_view[:3, :3].T  # column-vector rotation
    tvec = world_view[3, :3]

    for i in range(n):
        p = means3d[i]
        hom = np.concatenate([p, [1.0]]) @ full_proj
        pw = 1.0 / (hom[3] + 1e-7)
        proj = hom[:3] * pw
        p_view = Wv @ p + tvec
        if p_view[2] <= 0.2:
            continue
        tx, ty, tz = p_view
        limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
        txc = min(limx, max(-limx, tx / tz)) * tz
        tyc = min(limy, max(-limy, ty / tz)) * tz
        J = np.array(
            [[fx / tz, 0, -fx * txc / tz**2], [0, fy / tz, -fy * tyc / tz**2]]
        )
        M = J @ Wv
        xx, xy, xz, yy, yz, zz = cov3d[i]
        Sig = np.array([[xx, xy, xz], [xy, yy, yz], [xz, yz, zz]])
        cov = M @ Sig @ M.T
        cov[0, 0] += 0.3
        cov[1, 1] += 0.3
        det = cov[0, 0] * cov[1, 1] - cov[0, 1] ** 2
        if det == 0:
            continue
        conic = np.array([cov[1, 1], -cov[0, 1], cov[0, 0]]) / det
        mid = 0.5 * (cov[0, 0] + cov[1, 1])
        lam = mid + np.sqrt(max(0.1, mid * mid - det))
        radius = np.ceil(3.0 * np.sqrt(lam))
        px = ((proj[0] + 1) * width - 1) * 0.5
        py = ((proj[1] + 1) * height - 1) * 0.5
        x0 = min(grid_x, max(0, int((px - radius) / tile_size)))
        y0 = min(grid_y, max(0, int((py - radius) / tile_size)))
        x1 = min(grid_x, max(0, int((px + radius + tile_size - 1) / tile_size)))
        y1 = min(grid_y, max(0, int((py + radius + tile_size - 1) / tile_size)))
        if (x1 - x0) * (y1 - y0) == 0:
            continue
        valid[i] = True
        means2d[i] = [px, py]
        depths[i] = p_view[2]
        conics[i] = conic
        radii[i] = int(radius)
        rects[i] = [x0, y0, x1, y1]

    image = np.zeros((height, width, c))
    final_t = np.ones((height, width))
    n_contrib = np.zeros((height, width), dtype=np.int32)

    for tile_y in range(grid_y):
        for tile_x in range(grid_x):
            in_tile = valid & (
                (rects[:, 0] <= tile_x)
                & (tile_x < rects[:, 2])
                & (rects[:, 1] <= tile_y)
                & (tile_y < rects[:, 3])
            )
            ids = np.nonzero(in_tile)[0]
            ids = ids[np.argsort(depths[ids], kind="stable")]
            for py_l in range(tile_size):
                for px_l in range(tile_size):
                    x = tile_x * tile_size + px_l
                    y = tile_y * tile_size + py_l
                    if x >= width or y >= height:
                        continue
                    T = 1.0
                    C = np.zeros(c)
                    last = 0
                    for g in ids:
                        dx = means2d[g, 0] - x
                        dy = means2d[g, 1] - y
                        a, b, cc = conics[g]
                        power = -0.5 * (a * dx * dx + cc * dy * dy) - b * dx * dy
                        if power > 0:
                            continue
                        alpha = min(0.99, opacities[g] * np.exp(power))
                        if alpha < 1.0 / 255.0:
                            continue
                        test_t = T * (1 - alpha)
                        if test_t < 1e-4:
                            break
                        C += colors[g] * alpha * T
                        T = test_t
                        last += 1
                    image[y, x] = C + T * bg[:c]
                    final_t[y, x] = T
                    n_contrib[y, x] = last
    return image, final_t, n_contrib, radii
