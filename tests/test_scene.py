"""Scene orchestrator tests: load → train-ish save → reload per target."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from seganygaussians_tpu.models import feature_gaussians as fgm
from seganygaussians_tpu.models import gaussians as gm
from seganygaussians_tpu.scene import ModelConfig, Scene, search_for_max_iteration


def test_scene_init_and_save_roundtrip(colmap_scene, tmp_path):
    model_path = str(tmp_path / "model")
    cfg = ModelConfig(source_path=colmap_scene, model_path=model_path, resolution=1)
    scene = Scene(cfg, shuffle=False)
    assert len(scene.get_train_cameras()) == 6
    assert scene.cameras_extent > 0
    assert int(gm.num_alive(scene.gaussians)) == 100
    assert os.path.exists(os.path.join(model_path, "input.ply"))
    assert os.path.exists(os.path.join(model_path, "cameras.json"))

    path = scene.save(30, target="scene")
    assert os.path.exists(path)
    assert search_for_max_iteration(os.path.join(model_path, "point_cloud")) == 30

    # reload as eval
    scene2 = Scene(cfg, load_iteration=-1, mode="eval", shuffle=False)
    assert scene2.loaded_iter == 30
    assert int(gm.num_alive(scene2.gaussians)) == 100
    a = gm.compact(scene.gaussians)
    b = gm.compact(scene2.gaussians)
    np.testing.assert_allclose(a["xyz"], b["xyz"], atol=1e-6)
    np.testing.assert_allclose(a["features_rest"], b["features_rest"], atol=1e-6)


def test_scene_feature_model_init(colmap_scene, tmp_path):
    model_path = str(tmp_path / "model")
    cfg = ModelConfig(source_path=colmap_scene, model_path=model_path, resolution=1)
    scene = Scene(cfg, shuffle=False)
    scene.save(30, target="scene")

    # contrastive_feature train mode: feature gaussians from the 3DGS PLY
    scene3 = Scene(
        cfg, need_scene=False, need_features_model=True,
        load_iteration=-1, target="contrastive_feature", mode="train",
        shuffle=False,
    )
    fs = scene3.feature_gaussians
    assert fs.point_features.shape == (100, 32)
    assert float(np.abs(np.asarray(fs.point_features)).mean()) < 0.1  # randn*1e-2
    assert fs.smooth_map.shape == (100, 16)
    # col 0 is self
    np.testing.assert_array_equal(np.asarray(fs.smooth_map)[:, 0], np.arange(100))

    # save + eval reload
    p = scene3.save_feature(10, target="contrastive_feature")
    assert os.path.exists(p)
    scene4 = Scene(
        cfg, need_scene=False, need_features_model=True,
        load_iteration=-1, feature_load_iteration=-1,
        target="contrastive_feature", mode="eval", shuffle=False,
    )
    assert scene4.feature_loaded_iter == 10
    assert scene4.feature_gaussians.point_features.shape == (100, 32)


def test_smoothed_features_shapes(colmap_scene, tmp_path):
    import jax

    model_path = str(tmp_path / "model")
    cfg = ModelConfig(source_path=colmap_scene, model_path=model_path, resolution=1)
    scene = Scene(cfg, shuffle=False)
    scene.save(30, target="scene")
    scene3 = Scene(
        cfg, need_scene=False, need_features_model=True,
        load_iteration=-1, target="contrastive_feature", mode="train",
        shuffle=False,
    )
    fs = scene3.feature_gaussians
    sm = fgm.smoothed_point_features(fs, key=jax.random.PRNGKey(0), dropout=0.5)
    assert sm.shape == (100, 32)
    assert np.isfinite(np.asarray(sm)).all()
    # dropout<0 → all neighbours
    sm_all = fgm.smoothed_point_features(fs, key=None, dropout=-1.0)
    assert np.isfinite(np.asarray(sm_all)).all()
    maps = fgm.build_multi_res_maps(fs, jax.random.split(jax.random.PRNGKey(1), 3))
    ms = fgm.multi_res_smoothed_features(fs, maps)
    assert ms.shape == (100, 32)
    # per-point (N, L) smooth weights are differentiable inputs
    w = jnp.ones((100, len(maps))) / len(maps)
    gw = jax.grad(
        lambda ww: jnp.sum(fgm.multi_res_smoothed_features(fs, maps, ww) ** 2)
    )(w)
    assert np.isfinite(np.asarray(gw)).all() and float(jnp.sum(jnp.abs(gw))) > 0
    # grid-level concat analog (`gaussian_model_ff.py:456-469`)
    grids = fgm.init_grid_levels(fs.geom.xyz)
    cat = fgm.concat_point_features(fs, grids)
    assert cat.shape == (100, 32 + 30)
    assert fgm.concat_point_features(fs, None).shape == (100, 32)
