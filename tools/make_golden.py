"""Generate committed golden fixtures for the rasterizer (tests/golden/).

Forward images are checked in tests against the fp64 NumPy oracle at
generation time (tests/np_oracle.py re-states the CUDA algorithm,
`cuda_rasterizer/forward.cu`); gradients are the CPU XLA-path values at the
pinned seed.  Committing the arrays freezes today's verified behaviour so any
future numerical drift in preprocess/binning/blend (on any platform) fails
loudly instead of silently shifting both sides of a recomputed comparison.

Usage: JAX_PLATFORMS=cpu python tools/make_golden.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from seganygaussians_tpu.ops.camera import make_camera
from seganygaussians_tpu.ops.rasterize import RasterConfig, rasterize

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def make_fixture_scene(c):
    """The pinned golden scene (seed 7): mid-density cloud, mixed scales."""
    rng = np.random.default_rng(7)
    n = 80
    camera = make_camera(
        np.eye(3), np.zeros(3), fovx=1.0, fovy=0.8, width=64, height=48
    )
    means = np.stack(
        [
            rng.uniform(-1.0, 1.0, n),
            rng.uniform(-0.8, 0.8, n),
            rng.uniform(1.5, 5.0, n),
        ],
        axis=1,
    ).astype(np.float32)
    scales = rng.uniform(0.03, 0.25, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.05, 0.95, n).astype(np.float32)
    colors = rng.uniform(0.0, 1.0, (n, c)).astype(np.float32)
    bg = np.linspace(0.2, 0.8, c).astype(np.float32)
    return camera, means, scales, quats, opac, colors, bg


def main():
    os.makedirs(OUT, exist_ok=True)
    for c in (3, 32):
        camera, means, scales, quats, opac, colors, bg = make_fixture_scene(c)
        cfg = RasterConfig(capacity=1 << 13, backend="xla")

        def fwd(m, s, q, o, col, ndc):
            return rasterize(
                m, o, camera,
                colors=col, scales=s, rotations=q, bg=jnp.asarray(bg),
                with_depth=(c == 3), ndc_offset=ndc, config=cfg,
            )

        args = tuple(
            jnp.asarray(a) for a in (means, scales, quats, opac, colors)
        ) + (jnp.zeros((len(means), 2), jnp.float32),)
        out = fwd(*args)

        def loss(*a):
            o = fwd(*a)
            h = jnp.cos(jnp.arange(o.color.size, dtype=jnp.float32)).reshape(
                o.color.shape
            )
            l = jnp.sum(o.color * h)
            if o.extra is not None:
                l = l + 0.1 * jnp.sum(o.extra)
            return l

        grads = jax.grad(loss, argnums=tuple(range(6)))(*args)
        np.savez_compressed(
            os.path.join(OUT, f"blend_golden_c{c}.npz"),
            color=np.asarray(out.color),
            final_t=np.asarray(out.final_t),
            n_contrib=np.asarray(out.n_contrib),
            extra=np.asarray(out.extra) if out.extra is not None else np.zeros(0),
            d_means=np.asarray(grads[0]),
            d_scales=np.asarray(grads[1]),
            d_quats=np.asarray(grads[2]),
            d_opac=np.asarray(grads[3]),
            d_colors=np.asarray(grads[4]),
            d_ndc=np.asarray(grads[5]),
        )
        print(f"wrote blend_golden_c{c}.npz  color={out.color.shape}")


if __name__ == "__main__":
    main()
