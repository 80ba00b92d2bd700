"""SIBR remote-viewer TCP protocol (parity: `gaussian_renderer/network_gui.py`).

Wire format: 4-byte little-endian length + JSON camera/flags request, raw
RGB bytes + length-prefixed verify string response.  The viewer's OpenGL
convention flips (negate view-matrix columns 1 and 2;
`network_gui.py:73-76`) are applied before building the ``CameraParams``.
Implemented as a class (no module globals) and polled non-blocking from the
train loop exactly like `train_scene.py:56-69`.
"""

from __future__ import annotations

import json
import socket
from typing import Optional

import numpy as np

from seganygaussians_tpu.ops.camera import CameraParams


class ViewerRequest:
    def __init__(self, msg: dict):
        self.width = msg["resolution_x"]
        self.height = msg["resolution_y"]
        self.empty = self.width == 0 or self.height == 0
        if self.empty:
            return
        self.do_training = bool(msg["train"])
        self.keep_alive = bool(msg["keep_alive"])
        self.scaling_modifier = msg["scaling_modifier"]
        self.fovy = msg["fov_y"]
        self.fovx = msg["fov_x"]
        self.znear = msg["z_near"]
        self.zfar = msg["z_far"]
        wv = np.array(msg["view_matrix"], np.float32).reshape(4, 4)
        wv[:, 1] *= -1
        wv[:, 2] *= -1
        fp = np.array(msg["view_projection_matrix"], np.float32).reshape(4, 4)
        fp[:, 1] *= -1
        cam_center = np.linalg.inv(wv)[3, :3]
        import math

        self.camera = CameraParams(
            world_view=wv,
            full_proj=fp,
            cam_center=cam_center,
            width=self.width,
            height=self.height,
            tan_fovx=math.tan(self.fovx / 2.0),
            tan_fovy=math.tan(self.fovy / 2.0),
        )


class NetworkGUI:
    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn: Optional[socket.socket] = None

    def try_connect(self) -> bool:
        if self.conn is not None:
            return True
        try:
            self.conn, _ = self.listener.accept()
            self.conn.settimeout(None)
            return True
        except (BlockingIOError, socket.timeout, OSError):
            return False

    def _read_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("viewer disconnected")
            buf += chunk
        return buf

    def receive(self) -> Optional[ViewerRequest]:
        """Blocking read of one request; None if resolution is 0×0."""
        length = int.from_bytes(self._read_exact(4), "little")
        msg = json.loads(self._read_exact(length).decode("utf-8"))
        req = ViewerRequest(msg)
        return None if req.empty else req

    def send(self, image: Optional[np.ndarray], verify: str) -> None:
        """``image``: (H, W, 3) float [0,1] or None; ``verify``: source path
        echo (the SIBR handshake string)."""
        if image is not None:
            raw = (
                np.ascontiguousarray(np.clip(image, 0, 1)) * 255
            ).astype(np.uint8).tobytes()
            self.conn.sendall(raw)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(verify.encode("ascii"))

    def drop(self) -> None:
        if self.conn is not None:
            try:
                self.conn.close()
            finally:
                self.conn = None

    def close(self) -> None:
        self.drop()
        self.listener.close()
