"""Aux subsystem tests: checkpoint/resume, network protocol, mask scales,
interactive session."""

import os
import socket
import threading

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seganygaussians_tpu import checkpoint as ckpt
from seganygaussians_tpu.models import feature_gaussians as fgm
from seganygaussians_tpu.models import gaussians as gm
from seganygaussians_tpu.ops.camera import make_camera
from seganygaussians_tpu.ops.quantile import fit_quantile_transform
from seganygaussians_tpu.ops.rasterize import RasterConfig


def make_state(rng, n=30, cap=64):
    pts = rng.normal(scale=0.3, size=(n, 3)).astype(np.float32)
    pts[:, 2] += 3.0
    return gm.create_from_points(
        pts, rng.uniform(size=(n, 3)).astype(np.float32), 1, cap
    )


def test_checkpoint_roundtrip(tmp_path, rng):
    state = make_state(rng)
    path = ckpt.save_checkpoint(str(tmp_path / "ck"), state, 123,
                                extra={"sh": 2})
    assert ckpt.latest_iteration(str(tmp_path / "ck")) == 123
    template = make_state(np.random.default_rng(1))  # same shapes, diff values
    restored, meta = ckpt.load_checkpoint(str(tmp_path / "ck"), template)
    assert meta["iteration"] == 123 and meta["sh"] == 2
    np.testing.assert_allclose(
        np.asarray(restored.params.xyz), np.asarray(state.params.xyz)
    )
    np.testing.assert_allclose(
        np.asarray(restored.opt.mu.xyz), np.asarray(state.opt.mu.xyz)
    )
    np.testing.assert_array_equal(
        np.asarray(restored.alive), np.asarray(state.alive)
    )


def test_network_gui_protocol():
    import json

    from seganygaussians_tpu.viewer.network_gui import NetworkGUI

    gui = NetworkGUI(port=0)  # ephemeral port
    port = gui.listener.getsockname()[1]

    received = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port))
        msg = {
            "resolution_x": 8, "resolution_y": 6, "train": 1,
            "fov_y": 0.8, "fov_x": 1.0, "z_near": 0.01, "z_far": 100.0,
            "shs_python": 0, "rot_scale_python": 0, "keep_alive": 1,
            "scaling_modifier": 1.0,
            "view_matrix": list(np.eye(4).flatten().astype(float)),
            "view_projection_matrix": list(np.eye(4).flatten().astype(float)),
        }
        payload = json.dumps(msg).encode()
        s.sendall(len(payload).to_bytes(4, "little") + payload)
        img = b""
        want = 8 * 6 * 3
        while len(img) < want:
            img += s.recv(want - len(img))
        received["img"] = img
        vlen = int.from_bytes(s.recv(4), "little")
        received["verify"] = s.recv(vlen).decode()
        s.close()

    t = threading.Thread(target=client)
    t.start()
    while not gui.try_connect():
        pass
    req = gui.receive()
    assert req is not None and req.width == 8 and req.do_training
    # OpenGL flips applied
    assert req.camera.world_view[1, 1] == -1.0
    gui.send(np.full((6, 8, 3), 0.5, np.float32), "source/path")
    t.join(timeout=5)
    gui.close()
    assert received["verify"] == "source/path"
    assert len(received["img"]) == 8 * 6 * 3
    assert received["img"][0] == 127


def test_mask_scale_extraction(rng):
    from seganygaussians_tpu.preprocess import compute_mask_scales

    state = make_state(rng, n=50)
    cam_params = make_camera(np.eye(3), np.zeros(3), fovx=1.0, fovy=0.8,
                             width=64, height=48)

    class Cam:
        params = cam_params
        fovx, fovy = 1.0, 0.8

    # two masks: full frame and a small center crop → scale(full) > scale(crop)
    masks = np.zeros((2, 24, 32), np.float32)
    masks[0] = 1.0
    masks[1, 8:16, 12:20] = 1.0
    scales = np.asarray(
        compute_mask_scales(Cam(), state, masks,
                            RasterConfig(capacity=1 << 12, backend="xla"))
    )
    assert scales.shape == (2,)
    assert np.isfinite(scales).all()
    assert scales[0] > scales[1] > 0


def test_interactive_session(rng):
    from seganygaussians_tpu.seg.scale_gate import init_scale_gate
    from seganygaussians_tpu.viewer.interactive import SagaSession

    state = make_state(rng, n=40)
    d = gm.compact(state)
    feat = fgm.from_scene_geometry(
        d["xyz"], d["scaling"], d["rotation"], d["opacity"],
        feature_dim=16, smooth_k=4, capacity=64,
    )
    qt = fit_quantile_transform(jnp.asarray(rng.uniform(0.5, 3.0, 100)))
    sess = SagaSession(
        state, feat, init_scale_gate(jax.random.PRNGKey(0), 16), qt,
        config=RasterConfig(capacity=1 << 12, backend="xla"),
    )
    sess.orbit.width, sess.orbit.height = 64, 48
    rgb = sess.render_rgb()
    assert rgb.shape == (48, 64, 3)
    pca = sess.render_pca()
    assert pca.shape == (48, 64, 3)
    sess.click(32, 24)
    sim = sess.render_similarity()
    assert sim.shape == (48, 64)
    n_before = int(gm.num_alive(sess.scene_state))
    sess.threshold = 0.0
    mask = sess.segment3d()
    assert int(gm.num_alive(sess.scene_state)) <= n_before
    sess.roll_back()
    assert int(gm.num_alive(sess.scene_state)) == n_before
    sess.cluster_in_3d(k=4)
    cl = sess.render_cluster()
    assert cl.shape == (48, 64, 3)


def test_save_mask(tmp_path, rng):
    import torch

    from seganygaussians_tpu.seg.scale_gate import init_scale_gate
    from seganygaussians_tpu.viewer.interactive import SagaSession

    state = make_state(rng, n=20, cap=32)
    d = gm.compact(state)
    feat = fgm.from_scene_geometry(
        d["xyz"], d["scaling"], d["rotation"], d["opacity"],
        feature_dim=8, smooth_k=4, capacity=32,
    )
    qt = fit_quantile_transform(jnp.asarray(rng.uniform(0.5, 3.0, 50)))
    sess = SagaSession(
        state, feat, init_scale_gate(jax.random.PRNGKey(0), 8), qt,
        config=RasterConfig(capacity=1 << 10, backend="xla"),
    )
    p = sess.save_mask("m0", str(tmp_path))
    back = torch.load(p, weights_only=False)
    assert back.shape[0] == 32 and back.dtype == torch.bool


def test_training_reporter(tmp_path):
    """metrics.jsonl + TensorBoard mirroring (`train_scene.py:159-202`
    training_report analogue)."""
    import json

    from seganygaussians_tpu.utils.reporting import TrainingReporter

    rep = TrainingReporter(str(tmp_path))
    rep.scalars(10, {"train/loss": 0.5, "train/l1": 0.3})
    rep.eval_report(20, "test", 0.1, 25.0)
    rep.histogram(20, "scene/opacity", np.random.default_rng(0).random(100))
    rep.image(20, "render", np.zeros((8, 8, 3), np.float32))
    rep.close()
    lines = [json.loads(l) for l in
             open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert lines[0]["train/loss"] == 0.5
    assert any("test/psnr" in l for l in lines)
    # tensorboard event file written when SummaryWriter is available
    assert any(f.startswith("events") for f in os.listdir(tmp_path))


def test_web_gui_endpoints():
    """Browser GUI protocol (`viewer/web_gui.py`): every saga_gui widget
    endpoint round-trips against a stub session — no weights needed."""
    import json as _json
    import urllib.request

    from seganygaussians_tpu.viewer.web_gui import WebGUI

    class Orbit:
        azimuth = 0.0
        elevation = 0.0
        radius = 4.0

    class StubSession:
        def __init__(self):
            self.orbit = Orbit()
            self.scale = 0.5
            self.threshold = 0.75
            self.chosen_features = []
            self.calls = []

        def render_rgb(self):
            return np.full((6, 8, 3), 0.5, np.float32)

        render_pca = render_cluster = render_rgb

        def render_similarity(self):
            return np.zeros((6, 8), np.float32)

        def click(self, x, y):
            self.chosen_features.append((x, y))

        def segment3d(self):
            self.calls.append("segment")
            return np.ones(7, bool)

        def roll_back(self):
            self.calls.append("undo")

        def clear_clicks(self):
            self.chosen_features = []

        def save_mask(self):
            return "/tmp/mask.pt"

        def cluster_in_3d(self):
            self.calls.append("cluster")

    sess = StubSession()
    gui = WebGUI(sess, port=0)  # ephemeral port
    host, port = gui.start_background()
    base = f"http://{host}:{port}"
    try:
        page = urllib.request.urlopen(base + "/").read().decode()
        assert "segment 3D" in page
        for mode in ("rgb", "pca", "similarity", "cluster"):
            png = urllib.request.urlopen(
                f"{base}/render?mode={mode}&az=0.3&el=0.1&r=3"
            ).read()
            assert png[:8] == b"\x89PNG\r\n\x1a\n"
        assert abs(sess.orbit.azimuth - 0.3) < 1e-9

        def post(path, body=None):
            req = urllib.request.Request(
                base + path, data=_json.dumps(body or {}).encode(),
                method="POST")
            return _json.loads(urllib.request.urlopen(req).read())

        assert "1 prompts" in post("/click", {"x": 3, "y": 2})["status"]
        assert sess.chosen_features == [(3, 2)]
        post("/state", {"scale": 0.8, "threshold": 0.9})
        assert sess.scale == 0.8 and sess.threshold == 0.9
        assert "segmented 7" in post("/segment")["status"]
        post("/undo"); post("/cluster"); post("/clear")
        assert sess.calls == ["segment", "undo", "cluster"]
        assert sess.chosen_features == []
        assert "saved" in post("/save")["status"]
        st = _json.loads(urllib.request.urlopen(base + "/state").read())
        assert st["scale"] == 0.8
    finally:
        gui.shutdown()
