"""Socket round-trip tests for the SIBR-compatible network GUI.

Exercises the exact wire format of the reference protocol
(gaussian_renderer/network_gui.py:43-85): [u32 len][json] request with the
torch-layout view matrix (y/z columns negated), raw RGB byte response
followed by [u32 len]["verify"].
"""
from __future__ import annotations

import json
import socket
import struct
import threading
import time

import numpy as np

from hidegs_tpu.core.camera_math import make_camera
from hidegs_tpu.viewer.network_gui import NetworkGUI


def _client_message(width, height, view, fov_x=0.8, fov_y=0.6, train=True):
    return {
        "resolution_x": width,
        "resolution_y": height,
        "train": train,
        "fov_x": fov_x,
        "fov_y": fov_y,
        "z_near": 0.01,
        "z_far": 100.0,
        "shs_python": False,
        "rot_scale_python": False,
        "keep_alive": True,
        "scaling_modifier": 1.0,
        "view_matrix": view,
        "view_projection_matrix": view,
    }


def _send_msg(sock, msg: dict):
    payload = json.dumps(msg).encode("utf-8")
    sock.sendall(struct.pack("<I", len(payload)) + payload)


def _recv_exact(sock, n):
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        assert chunk, "server closed early"
        buf += chunk
    return buf


def _reference_view_matrix(R, t):
    """Build the wire-format matrix the SIBR/reference client sends: the
    row-major torch world→cam transpose with columns 1,2 negated
    (the inverse of network_gui.py:receive_camera's unflipping)."""
    Rt = np.eye(4, dtype=np.float32)
    Rt[:3, :3] = R
    Rt[:3, 3] = t
    view = Rt.T.copy()
    view[:, 1] *= -1
    view[:, 2] *= -1
    return [float(x) for x in view.reshape(-1)]


def _poll_until_served(gui, render_fn, verify, deadline_s=15.0):
    t_end = time.monotonic() + deadline_s
    while time.monotonic() < t_end:
        if gui.poll(render_fn, verify=verify) is not None:
            return
        time.sleep(0.002)
    raise AssertionError("GUI never served the client within the deadline")


def test_network_gui_round_trip():
    gui = NetworkGUI(port=0)
    port = gui.listener.getsockname()[1]
    seen = {}

    W, H = 32, 24
    # a nontrivial camera pose
    th = 0.3
    R = np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]],
        np.float32,
    )
    t = np.array([0.1, -0.2, 3.0], np.float32)

    def client():
        with socket.create_connection(("127.0.0.1", port), timeout=10) as s:
            _send_msg(s, _client_message(W, H, _reference_view_matrix(R, t)))
            img = _recv_exact(s, H * W * 3)
            n = struct.unpack("<I", _recv_exact(s, 4))[0]
            verify = _recv_exact(s, n).decode("ascii")
            seen["img"] = np.frombuffer(img, np.uint8).reshape(H, W, 3)
            seen["verify"] = verify

    th_client = threading.Thread(target=client)
    th_client.start()

    def render_fn(cam, msg):
        # check the pose was decoded back to our convention
        np.testing.assert_allclose(np.asarray(cam.R), R, atol=1e-5)
        np.testing.assert_allclose(np.asarray(cam.t), t, atol=1e-5)
        assert cam.width == W and cam.height == H
        seen["msg"] = msg
        img = np.zeros((3, cam.height, cam.width), np.float32)
        img[0, :, :] = 1.0  # pure red
        img[1, 0, 0] = 0.5  # one marker pixel
        return img

    # poll until the client's request lands (accept is non-blocking); use a
    # wall-clock deadline — a fixed iteration count was flaky under load
    _poll_until_served(gui, render_fn, "modelpath")
    th_client.join(timeout=10)
    gui.close()
    assert not th_client.is_alive()

    assert seen["verify"] == "modelpath"
    assert seen["msg"]["train"] is True
    img = seen["img"]
    assert img.shape == (H, W, 3)
    assert (img[:, :, 0] == 255).all()
    assert img[0, 0, 1] == 127 or img[0, 0, 1] == 128  # the marker pixel
    assert (img[1:, :, 1] == 0).all() and (img[:, :, 2] == 0).all()


def test_network_gui_empty_resolution_skips_render():
    gui = NetworkGUI(port=0)
    port = gui.listener.getsockname()[1]
    done = {}

    def client():
        with socket.create_connection(("127.0.0.1", port), timeout=10) as s:
            _send_msg(s, _client_message(0, 0, [0.0] * 16, train=False))
            n = struct.unpack("<I", _recv_exact(s, 4))[0]
            done["verify"] = _recv_exact(s, n).decode("ascii")

    th_client = threading.Thread(target=client)
    th_client.start()

    calls = []

    def render_fn(cam, msg):  # must not be called
        calls.append(1)
        return np.zeros((3, 1, 1), np.float32)

    _poll_until_served(gui, render_fn, "v")
    th_client.join(timeout=10)
    gui.close()
    assert not th_client.is_alive()
    assert done["verify"] == "v"
    assert not calls


def test_http_viewer_serves_frames():
    """Browser viewer: page, info, and a rendered PNG frame over HTTP."""
    import io
    import urllib.error
    import urllib.request

    import jax.numpy as jnp
    from PIL import Image

    from hidegs_tpu.data.synthetic import make_toy_gaussians
    from hidegs_tpu.raster.api import RasterConfig, render
    from hidegs_tpu.viewer.http_viewer import HttpViewer

    scene = make_toy_gaussians(80, seed=0)
    cfg = RasterConfig(backend="jnp", max_instances=1 << 12)

    def render_fn(cam):
        return np.asarray(jnp.clip(render(*scene, cam, config=cfg)["render"], 0, 1))

    viewer = HttpViewer(render_fn, center=(0, 0, 0), dist=6.0,
                        host="127.0.0.1", port=0, width=64, height=48,
                        info={"n_gaussians": 80})
    viewer.serve_background()
    try:
        base = f"http://127.0.0.1:{viewer.port}"
        page = urllib.request.urlopen(base + "/", timeout=30).read()
        assert b"hidegs_tpu viewer" in page
        info = json.loads(urllib.request.urlopen(base + "/info", timeout=30).read())
        assert info["n_gaussians"] == 80
        try:
            png = urllib.request.urlopen(
                base + "/frame?yaw=0.5&pitch=0.8&dist=6&w=64&h=48", timeout=60
            ).read()
        except urllib.error.HTTPError as e:  # surface the server-side error
            raise AssertionError(f"/frame failed: {e.code} {e.read().decode()}")
        img = Image.open(io.BytesIO(png))
        assert img.size == (64, 48)
        arr = np.asarray(img)
        assert arr.std() > 0, "frame is blank"
        # cache path: identical request returns identical bytes
        png2 = urllib.request.urlopen(
            base + "/frame?yaw=0.5&pitch=0.8&dist=6&w=64&h=48", timeout=60
        ).read()
        assert png2 == png
    finally:
        viewer.shutdown()
