"""Segmentation/query layer tests: clustering, similarity, CLIP scoring, PCA."""

import numpy as np
import jax
import jax.numpy as jnp

from seganygaussians_tpu.seg import clip_text, clustering, queries
from seganygaussians_tpu.seg.scale_gate import (
    ScaleGateParams,
    apply_scale_gate,
    fixed_scale_gate,
    init_scale_gate,
    load_scale_gate,
    save_scale_gate,
)


def _two_cluster_features(rng, n=200, d=16):
    a = rng.normal(0, 0.05, (n // 2, d)) + np.eye(d)[0]
    b = rng.normal(0, 0.05, (n // 2, d)) + np.eye(d)[1]
    x = np.concatenate([a, b]).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_kmeans_separates_clusters(rng):
    x = _two_cluster_features(rng)
    res = clustering.kmeans(jax.random.PRNGKey(0), jnp.asarray(x), k=2, iters=15)
    labels = np.asarray(res.labels)
    # same-cluster purity
    first, second = labels[:100], labels[100:]
    assert (first == first[0]).mean() > 0.95
    assert (second == second[0]).mean() > 0.95
    assert first[0] != second[0]


def test_density_filter_marks_noise(rng):
    x = _two_cluster_features(rng)
    res = clustering.kmeans(jax.random.PRNGKey(0), jnp.asarray(x), k=2)
    filt = clustering.density_filter(res, noise_quantile=0.1)
    labels = np.asarray(filt.labels)
    assert (labels == -1).sum() >= 10  # ~10% noise


def test_cluster_features_shape(rng):
    x = _two_cluster_features(rng, n=600)
    centers = clustering.cluster_features(
        jax.random.PRNGKey(1), jnp.asarray(x), k=4, sample_rate=0.5
    )
    assert centers.shape == (4, 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(centers), axis=-1), 1.0, atol=1e-5
    )


def test_scale_gate_roundtrip(tmp_path):
    gate = init_scale_gate(jax.random.PRNGKey(0), 32)
    p = str(tmp_path / "scale_gate.pt")
    save_scale_gate(p, gate)
    back = load_scale_gate(p)
    np.testing.assert_allclose(np.asarray(back.w), np.asarray(gate.w), atol=1e-7)
    g = apply_scale_gate(gate, jnp.asarray([[0.5]]))
    assert g.shape == (1, 32) and (np.asarray(g) > 0).all() and (np.asarray(g) < 1).all()


def test_fixed_scale_gate():
    table = fixed_scale_gate(4, 32)
    assert table.shape == (5, 32)
    assert float(table[0].sum()) == 28  # keeps 32-4 channels
    assert float(table[-1].sum()) == 32


def test_segment3d_thresholding(rng):
    feats = _two_cluster_features(rng, n=100, d=32)
    gate = ScaleGateParams(w=jnp.zeros((1, 32)), b=jnp.full((32,), 10.0))  # gate ≈ 1
    prompt = feats[:3]  # prompts from cluster A
    mask = queries.segment3d(
        jnp.asarray(feats), gate, jnp.asarray(0.5), jnp.asarray(prompt),
        threshold=0.9,
    )
    m = np.asarray(mask)
    assert m[:50].mean() > 0.9  # cluster A selected
    assert m[50:].mean() < 0.1  # cluster B rejected


def test_click_similarity_and_pca(rng):
    fmap = rng.normal(size=(8, 10, 16)).astype(np.float32)
    sim = queries.click_similarity(jnp.asarray(fmap), (3, 2))
    assert sim.shape == (8, 10)
    np.testing.assert_allclose(
        float(sim[2, 3]), float(np.sum(fmap[2, 3] ** 2)), rtol=1e-5
    )
    proj = queries.feature_pca(jnp.asarray(fmap.reshape(-1, 16)))
    assert proj.shape == (16, 3)
    rgb = queries.apply_pca(jnp.asarray(fmap), proj)
    assert rgb.shape == (8, 10, 3)
    assert float(rgb.min()) >= 0 and float(rgb.max()) <= 1 + 1e-6


def test_clip_relevancy(rng):
    d = 64
    pos = rng.normal(size=(1, d)).astype(np.float32)
    pos /= np.linalg.norm(pos)
    negs = rng.normal(size=(4, d)).astype(np.float32)
    negs /= np.linalg.norm(negs, axis=-1, keepdims=True)
    # an embedding aligned with pos should score near 1
    aligned = pos + 0.01 * rng.normal(size=(1, d)).astype(np.float32)
    opposed = -pos
    embeds = jnp.asarray(np.concatenate([aligned, opposed]))
    rel = clip_text.get_relevancy(embeds, jnp.asarray(pos), jnp.asarray(negs))
    assert rel.shape == (2, 2)
    assert float(rel[0, 0]) > 0.7
    assert float(rel[1, 0]) < 0.3
    np.testing.assert_allclose(np.asarray(rel).sum(-1), 1.0, atol=1e-6)

    multi = clip_text.get_relevancy_multi(
        embeds, jnp.asarray(np.concatenate([pos, negs[:1]])), jnp.asarray(negs)
    )
    assert multi.shape == (2, 2, 2)
    # single-positive path consistency
    np.testing.assert_allclose(
        np.asarray(multi[:, 0, 0]), np.asarray(rel[:, 0]), atol=1e-6
    )


def test_scores_to_pixel_map(rng):
    masks = np.zeros((2, 4, 4), np.float32)
    masks[0, :2] = 1
    masks[1, 2:] = 1
    scores = jnp.asarray([1.0, 3.0])
    pix = clip_text.scores_to_pixel_map(scores, jnp.asarray(masks))
    assert pix.shape == (4, 4)
    np.testing.assert_allclose(np.asarray(pix[0, 0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pix[3, 3]), 3.0, atol=1e-5)


def test_lift_scores_to_3d(rng):
    """2D score masks over half the image select the Gaussians on that side."""
    from seganygaussians_tpu.models import gaussians as gm
    from seganygaussians_tpu.ops.camera import make_camera
    from seganygaussians_tpu.ops.rasterize import RasterConfig

    n = 40
    pts = np.stack(
        [np.linspace(-0.8, 0.8, n), np.zeros(n), np.full(n, 3.0)], 1
    ).astype(np.float32)
    st = gm.create_from_points(pts, np.full((n, 3), 0.7, np.float32), 0, 64)
    cam = make_camera(np.eye(3), np.zeros(3), fovx=1.1, fovy=0.9,
                      width=64, height=48)

    class V:
        params = cam

    score = np.zeros((48, 64), np.float32)
    score[:, :32] = 1.0  # left half of the screen
    mask3d = clip_text.lift_scores_to_3d(
        [V()], [jnp.asarray(score)], st,
        config=RasterConfig(capacity=1 << 12, backend="xla"),
    )
    m = np.asarray(mask3d)
    # left-side points (x<0 project to left half) selected, right side not
    assert m[:15].mean() > 0.8
    assert m[25:40].mean() < 0.2


class _StubEncoder:
    """Records crops; returns deterministic per-crop embeddings."""

    dim = 8

    def __init__(self):
        self.crops = []

    def encode_image(self, images):
        self.crops.extend(images)
        out = np.stack(
            [np.full(self.dim, float(np.asarray(im).mean()), np.float32)
             for im in images]
        )
        return out / np.linalg.norm(out, axis=-1, keepdims=True).clip(1e-9)


def test_mask_clip_features_pipeline():
    """Blank → bbox-crop → encode logic (`clip_utils/__init__.py:91-191`)
    without CLIP weights: crops match the mask bboxes, background blanked,
    empty masks get zero features."""
    from seganygaussians_tpu.seg import clip_image

    img = np.zeros((16, 20, 3), np.uint8)
    img[2:6, 3:9] = 200  # object A
    img[10:14, 12:18] = 120  # object B
    masks = np.zeros((3, 16, 20), np.float32)
    masks[0, 2:6, 3:9] = 1.0
    masks[1, 10:14, 12:18] = 1.0
    # masks[2] stays empty
    enc = _StubEncoder()
    feats = clip_image.mask_clip_features(img, masks, enc)
    assert feats.shape == (3, 8)
    assert len(enc.crops) == 2
    assert enc.crops[0].shape == (4, 6, 3)  # tight bbox of mask 0
    assert enc.crops[1].shape == (4, 6, 3)
    # background==0 → crop equals the object pixels exactly
    np.testing.assert_allclose(enc.crops[0], 200.0)
    np.testing.assert_allclose(feats[2], 0.0)  # empty mask → zero feature
    assert np.all(np.abs(np.linalg.norm(feats[:2], axis=-1) - 1.0) < 1e-5)


def test_mask_clip_features_lowres_masks_and_background():
    """Masks at half resolution are upsampled + binarized; background=1
    blanks to white (`get_clip_features` background flag)."""
    from seganygaussians_tpu.seg import clip_image

    img = np.full((8, 8, 3), 50, np.uint8)
    masks = np.zeros((1, 4, 4), np.float32)
    masks[0, 1:3, 1:3] = 1.0  # upsamples to roughly the center block
    enc = _StubEncoder()
    feats = clip_image.mask_clip_features(img, masks, enc, background=1.0)
    assert feats.shape == (1, 8)
    crop = enc.crops[0]
    assert crop.min() == 50.0  # object pixels
    assert crop.shape[0] >= 2 and crop.shape[1] >= 2


def test_extract_scene_clip_features_sidecars(tmp_path):
    """Scene sweep writes reference-compatible clip_features/<image>.pt."""
    import torch
    from PIL import Image

    from seganygaussians_tpu.seg import clip_image

    root = tmp_path / "scene"
    (root / "images").mkdir(parents=True)
    (root / "sam_masks").mkdir()
    img = np.random.default_rng(0).integers(0, 255, (12, 16, 3), dtype=np.uint8)
    Image.fromarray(img).save(root / "images" / "v0.png")
    Image.fromarray(img).save(root / "images" / "v1.png")  # no sidecar
    masks = np.zeros((2, 12, 16), bool)
    masks[0, 2:8, 3:10] = True
    masks[1, 5:11, 8:15] = True
    torch.save(torch.tensor(masks), root / "sam_masks" / "v0.pt")

    written = clip_image.extract_scene_clip_features(
        str(root), _StubEncoder(), log=lambda *a: None
    )
    assert len(written) == 1
    feats = torch.load(written[0], weights_only=False)
    assert tuple(feats.shape) == (2, 8)


def test_clip_encoder_raises_without_weights():
    """ClipEncoder must fail with actionable guidance when weights are
    unavailable (zero-egress environment)."""
    import pytest

    with pytest.raises(RuntimeError, match="clip_features"):
        clip_text.ClipEncoder("definitely/not-a-local-model")


def test_clip_encoder_injected_impl_to_scores():
    """End-to-end encoder → get_scores with an injected deterministic
    backend (the `_impl` seam): template averaging, normalisation, and the
    pairwise-softmax scoring math run exactly as they would with real
    OpenCLIP laion2b weights (`clip_utils/clip_utils.py:56-95,148-164`)."""
    rng = np.random.default_rng(7)

    class _DetImpl:
        def encode_text(self, prompts):
            # deterministic pseudo-embedding per prompt string
            out = []
            for p in prompts:
                r = np.random.default_rng(abs(hash(p)) % (2**31))
                out.append(r.normal(size=16))
            return np.asarray(out, np.float32)

        def encode_image(self, images):
            return np.asarray(
                [im.mean(axis=(0, 1)).repeat(6)[:16] for im in images],
                np.float32,
            )

    enc = clip_text.ClipEncoder(_impl=_DetImpl())
    assert enc.backend == "injected"
    pos = enc.encode_text_with_template(["red chair", "green lamp"])
    assert pos.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(pos, axis=-1), 1.0, atol=1e-5)
    neg = enc.encode_text(list(clip_text.CANONICAL_NEGATIVES))
    sem = np.asarray(rng.normal(size=(30, 16)), np.float32)
    sem /= np.linalg.norm(sem, axis=-1, keepdims=True)
    scores = np.asarray(clip_text.get_scores(
        jnp.asarray(sem), jnp.asarray(pos[:1]), jnp.asarray(neg)))
    assert scores.shape == (30,)
    assert np.isfinite(scores).all()
    assert (scores >= 0).all() and (scores <= 1).all()
    # determinism: a second encoder instance reproduces the same scores
    enc2 = clip_text.ClipEncoder(_impl=_DetImpl())
    pos2 = enc2.encode_text_with_template(["red chair", "green lamp"])
    np.testing.assert_allclose(pos, pos2, atol=1e-6)
    scores2 = np.asarray(clip_text.get_scores(
        jnp.asarray(sem), jnp.asarray(pos2[:1]), jnp.asarray(neg)))
    np.testing.assert_allclose(scores, scores2, atol=1e-6)
