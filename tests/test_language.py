"""Language-driven segmentation pipeline (`prompt_segmenting.ipynb` cells
41-54 parity): synthetic two-object fixture exercises mask pooling, anchor
identifiers, the IoU distance graph, clustering, template scoring, and the
final 0.85-threshold 3D mask — no CLIP weights or renders needed."""

import jax
import jax.numpy as jnp
import numpy as np

from seganygaussians_tpu.ops.quantile import fit_quantile_transform
from seganygaussians_tpu.seg import language
from seganygaussians_tpu.seg.scale_gate import ScaleGateParams


def _const_gate(dim=8):
    # zero weights/bias → sigmoid(0)=0.5 gates: uniform, cancelled by the
    # L2 normalisations, so the fixture's feature geometry is untouched.
    return ScaleGateParams(
        w=jnp.zeros((1, dim), jnp.float32), b=jnp.zeros((dim,), jnp.float32)
    )


def _fixture(n=200, d=8, h=16, w=24, n_views=2, seed=0):
    rng = np.random.default_rng(seed)
    feats = np.zeros((n, d), np.float32)
    feats[: n // 2, 0] = 1.0  # object A
    feats[n // 2 :, 1] = 1.0  # object B
    feats += rng.normal(scale=0.02, size=feats.shape).astype(np.float32)

    fmap = np.zeros((h, w, d), np.float32)
    fmap[:, : w // 2, 0] = 1.0  # A on the left
    fmap[:, w // 2 :, 1] = 1.0  # B on the right

    class View:
        pass

    views = []
    for _ in range(n_views):
        v = View()
        masks = np.zeros((2, h, w), np.float32)
        masks[0, :, : w // 2] = 1.0
        masks[1, :, w // 2 :] = 1.0
        v.sam_masks = masks
        v.mask_scales = np.array([0.3, 0.6], np.float32)
        # 4-dim fake CLIP embeddings: A-masks near e0, B-masks near e1.
        v.clip_features = np.array(
            [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]], np.float32
        )
        views.append(v)
    return jnp.asarray(feats), jnp.asarray(fmap), views


def test_erode_masks_interior_only():
    m = np.zeros((1, 8, 8), np.float32)
    m[0, 2:6, 2:6] = 1.0
    out = np.asarray(language.erode_masks(jnp.asarray(m), (8, 8)))
    assert out[0, 3, 3]  # interior kept
    assert not out[0, 0, 0]  # background off


def test_mask_iou_distance():
    ids = jnp.asarray(
        [[1, 1, 0, 0], [1, 1, 0, 0], [0, 0, 1, 1]], bool
    )
    d = np.asarray(language.mask_iou_distance(ids))
    assert d[0, 1] < 1e-4  # identical identifier sets
    assert d[0, 2] > 0.99  # disjoint


def test_cluster_precomputed_components_and_noise():
    d = np.ones((5, 5))
    np.fill_diagonal(d, 0.0)
    d[0, 1] = d[1, 0] = 0.1
    d[2, 3] = d[3, 2] = 0.1
    labels = language.cluster_precomputed(d, eps=0.25, min_cluster_size=2)
    assert labels[0] == labels[1] >= 0
    assert labels[2] == labels[3] >= 0
    assert labels[0] != labels[2]
    assert labels[4] == -1  # singleton → noise


def test_select_queries_threshold_and_fallback():
    labels = np.array([0, 0, 1, 1])
    scores = np.array([0.9, 0.8, 0.1, 0.2])
    feats = np.eye(4, 6, dtype=np.float32)
    scales = np.array([1.0, 2.0, 3.0, 4.0])
    qf, qs = language.select_queries(labels, scores, feats, scales)
    # only cluster 0 clears 0.45; its best member is index 0
    assert qf.shape == (1, 6) and qs[0] == 1.0
    # nothing clears the bar → argmax cluster is kept
    qf2, qs2 = language.select_queries(
        labels, scores * 0.1, feats, scales
    )
    assert qs2[0] == 1.0


def test_text_segment_selects_prompted_object():
    feats, fmap, views = _fixture()
    gate = _const_gate()
    qt = fit_quantile_transform(jnp.asarray([0.3, 0.6, 0.9]), n_quantiles=3)

    def text_scores(clip_embeds):
        # prompt "object A": high relevancy for embeddings near e0
        return clip_embeds[:, 0]

    res = language.text_segment(
        render_feature_map=lambda v: fmap,
        views=views,
        point_features=feats,
        gate=gate,
        qt=qt,
        text_scores=text_scores,
        key=jax.random.PRNGKey(0),
        anchor_rate=0.25,
        min_cluster_size=2,
        downsample=2,
    )
    m = np.asarray(res.mask3d)
    n = feats.shape[0]
    assert m[: n // 2].mean() > 0.9  # object A selected
    assert m[n // 2 :].mean() < 0.1  # object B not
    # the two views' A-masks clustered together
    a_labels = res.labels[[0, 2]]
    assert a_labels[0] == a_labels[1] >= 0


def test_text_segment_respects_alive_capacity_padding():
    feats, fmap, views = _fixture()
    gate = _const_gate()
    qt = fit_quantile_transform(jnp.asarray([0.3, 0.6, 0.9]), n_quantiles=3)
    alive = jnp.zeros((feats.shape[0] + 56,), bool).at[: feats.shape[0]].set(True)
    res = language.text_segment(
        render_feature_map=lambda v: fmap,
        views=views,
        point_features=feats,
        gate=gate,
        qt=qt,
        text_scores=lambda e: e[:, 0],
        key=jax.random.PRNGKey(0),
        anchor_rate=0.25,
        min_cluster_size=2,
        downsample=2,
        alive=alive,
    )
    assert res.mask3d.shape[0] == alive.shape[0]
    assert not np.asarray(res.mask3d)[feats.shape[0]:].any()
