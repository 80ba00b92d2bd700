"""Pallas blend kernels vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seganygaussians_tpu.ops.camera import make_camera
from seganygaussians_tpu.ops.rasterize import RasterConfig, rasterize
from tests.test_rasterize import make_scene


def render_both(rng, n=50, c=3, with_depth=False, width=48, height=32):
    camera, means, scales, quats, opac, colors = make_scene(
        rng, n=n, c=c, width=width, height=height
    )
    bg = np.linspace(0.1, 0.9, c).astype(np.float32)
    outs = {}
    for backend in ("xla", "pallas"):
        outs[backend] = rasterize(
            jnp.asarray(means),
            jnp.asarray(opac),
            camera,
            colors=jnp.asarray(colors),
            scales=jnp.asarray(scales),
            rotations=jnp.asarray(quats),
            bg=jnp.asarray(bg),
            with_depth=with_depth,
            config=RasterConfig(capacity=1 << 13, backend=backend),
        )
    return camera, (means, scales, quats, opac, colors), outs


@pytest.mark.parametrize("c", [3, 32])
def test_pallas_forward_matches_oracle(rng, c):
    _, _, outs = render_both(rng, c=c)
    np.testing.assert_allclose(
        np.asarray(outs["pallas"].color), np.asarray(outs["xla"].color), atol=1e-4
    )
    # The Pallas kernel evaluates the Gaussian exponent via a quadratic-basis
    # MXU matmul; its f32 cancellation error is ~1e-5 in the exponent, which
    # bounds |Δα| ≈ 1e-5·α and hence |ΔT| at the same scale.
    np.testing.assert_allclose(
        np.asarray(outs["pallas"].final_t), np.asarray(outs["xla"].final_t), atol=5e-5
    )
    np.testing.assert_array_equal(
        np.asarray(outs["pallas"].n_contrib), np.asarray(outs["xla"].n_contrib)
    )


def test_pallas_depth_variant_matches_oracle(rng):
    _, _, outs = render_both(rng, with_depth=True)
    np.testing.assert_allclose(
        np.asarray(outs["pallas"].extra), np.asarray(outs["xla"].extra), atol=1e-4
    )


def test_pallas_gradients_match_oracle(rng):
    camera, (means, scales, quats, opac, colors), _ = render_both(rng, n=40)
    bg = jnp.asarray([0.3, 0.5, 0.7])
    target = jnp.asarray(np.random.default_rng(3).uniform(size=(32, 48, 3)).astype(np.float32))

    def loss(backend, means_, scales_, opac_, colors_, offset):
        out = rasterize(
            means_, opac_, camera,
            colors=colors_, scales=scales_, rotations=jnp.asarray(quats),
            bg=bg, ndc_offset=offset,
            config=RasterConfig(capacity=1 << 13, backend=backend),
        )
        return jnp.sum((out.color - target) ** 2) + 0.1 * jnp.sum(out.final_t)

    args = (
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(opac),
        jnp.asarray(colors), jnp.zeros((40, 2)),
    )
    g_x = jax.grad(lambda *a: loss("xla", *a), argnums=(0, 1, 2, 3, 4))(*args)
    g_p = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2, 3, 4))(*args)

    names = ["means3d", "scales", "opacity", "colors", "ndc_offset"]
    for name, gx, gp in zip(names, g_x, g_p):
        gx, gp = np.asarray(gx), np.asarray(gp)
        scale = np.abs(gx).max() + 1e-6
        np.testing.assert_allclose(
            gp / scale, gx / scale, atol=2e-4, err_msg=f"grad mismatch: {name}"
        )


def test_pallas_tile32_matches_oracle(rng):
    """32x32 tiles (the TPU perf configuration: ~2.7x fewer tile instances
    than 16x16 at typical footprints) must render identically to the XLA
    oracle at the same tile size."""
    camera, means, scales, quats, opac, colors = make_scene(
        rng, n=60, c=3, width=96, height=64
    )
    bg = np.linspace(0.1, 0.9, 3).astype(np.float32)
    outs = {}
    for backend in ("xla", "pallas"):
        outs[backend] = rasterize(
            jnp.asarray(means), jnp.asarray(opac), camera,
            colors=jnp.asarray(colors), scales=jnp.asarray(scales),
            rotations=jnp.asarray(quats), bg=jnp.asarray(bg),
            config=RasterConfig(capacity=1 << 13, backend=backend, tile_size=32),
        )
    np.testing.assert_allclose(
        np.asarray(outs["pallas"].color), np.asarray(outs["xla"].color), atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(outs["pallas"].n_contrib), np.asarray(outs["xla"].n_contrib)
    )


def test_pallas_chunk128_gradients(rng, monkeypatch):
    """CHUNK=128 (the tile-32 kernel configuration) must produce the same
    gradients as the XLA oracle — exercises chunk-boundary bookkeeping in
    the backward kernel at a different chunk granularity."""
    from seganygaussians_tpu.ops import blend_pallas

    monkeypatch.setattr(blend_pallas, "CHUNK", 128)
    camera, means, scales, quats, opac, colors = make_scene(
        rng, n=40, c=3, width=48, height=32
    )
    bg = jnp.asarray([0.3, 0.5, 0.7])

    def loss(backend, m, o, col):
        out = rasterize(
            jnp.asarray(m), jnp.asarray(o), camera,
            colors=jnp.asarray(col), scales=jnp.asarray(scales),
            rotations=jnp.asarray(quats), bg=bg,
            config=RasterConfig(capacity=1 << 13, backend=backend, tile_size=32),
        )
        return jnp.sum(out.color * jnp.cos(jnp.arange(out.color.size).reshape(out.color.shape)))

    g_x = jax.grad(lambda *a: loss("xla", *a), argnums=(0, 1, 2))(means, opac, colors)
    g_p = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2))(means, opac, colors)
    for a, b in zip(g_x, g_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3, rtol=1e-3)
