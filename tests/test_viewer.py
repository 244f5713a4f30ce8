"""Viewer tests: camera controller semantics (ModelViewController.cpp
parity) and the HTTP server end-to-end on a tiny scene."""

import json
import math
import urllib.request

import numpy as np
import pytest

from gsrt.core.types import look_at, make_camera
from gsrt.viewer.controller import ROTATION_DIV, CameraController


def _ctl(eye=(0.0, 0.0, -5.0), target=(0.0, 0.0, 0.0)):
    return CameraController(look_at(eye, target))


def test_reset_roundtrip():
    view = look_at((1.0, 2.0, -5.0), (0.3, -0.2, 1.0))
    c = CameraController(view)
    np.testing.assert_allclose(c.view(), view, atol=1e-9)
    # position recovered: -R^T t
    np.testing.assert_allclose(c.position, (1.0, 2.0, -5.0), atol=1e-9)


def test_wasd_moves_along_camera_basis():
    # reference: MoveForward/MoveRight/MoveUp along the camera basis
    # scaled by speed*dt (ModelViewController.cpp:88-131)
    c = _ctl()
    fwd = c.forward.copy()
    c.on_key("w", True)
    assert c.update(speed=2.0, dt=0.25)
    np.testing.assert_allclose(c.position, (0, 0, -5) + 0.5 * fwd,
                               atol=1e-9)
    c.on_key("w", False)
    assert not c.update(2.0, 0.25)      # no flags, no drag -> unchanged
    c.on_key("shift", True)             # up (reference LEFT_SHIFT)
    c.update(1.0, 1.0)
    # screen-up for this camera is world +y (look_at puts camera-y down)
    np.testing.assert_allclose(c.position[1], 1.0, atol=1e-9)
    np.testing.assert_allclose(c.up, (0.0, 1.0, 0.0), atol=1e-9)


def test_unknown_key_ignored():
    c = _ctl()
    assert not c.on_key("x", True)
    assert not c.update(1.0, 1.0)


def test_drag_without_button_does_nothing():
    c = _ctl()
    c.on_cursor(10, 10)
    c.on_cursor(50, 40)
    assert not c.update(1.0, 0.1)


def test_yaw_rotates_forward_about_world_y():
    # 300 px drag = 1 radian (rotationDiv, ModelViewController.cpp:98)
    c = _ctl()
    c.on_mouse_button("left", True)
    c.on_cursor(0, 0)
    c.on_cursor(ROTATION_DIV * math.pi / 2, 0)   # 90 deg yaw
    assert c.update(1.0, 0.1)
    # position unchanged; forward rotated 90 deg in the XZ plane
    np.testing.assert_allclose(c.position, (0, 0, -5), atol=1e-12)
    assert abs(c.forward[1]) < 1e-12             # still level
    assert abs(abs(c.forward[0]) - 1.0) < 1e-9   # now looking along +-x
    # orientation stays orthonormal
    R = c.orientation
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)


def test_pitch_is_camera_space():
    c = _ctl()
    c.on_mouse_button("left", True)
    c.on_cursor(0, 0)
    c.on_cursor(0, ROTATION_DIV * 0.5)           # 0.5 rad pitch
    c.update(1.0, 0.1)
    f = c.forward
    # pure pitch tilts forward out of the XZ plane, keeps x = 0
    assert abs(f[0]) < 1e-12 and abs(f[1]) > 0.4


def test_many_drags_keep_orthonormal():
    rng = np.random.default_rng(0)
    c = _ctl()
    c.on_mouse_button("left", True)
    c.on_cursor(0, 0)
    x = y = 0.0
    for _ in range(200):
        x += float(rng.normal() * 40)
        y += float(rng.normal() * 40)
        c.on_cursor(x, y)
        c.update(1.0, 0.016)
    R = c.orientation
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
    assert np.linalg.det(R) > 0.999


def test_model_rotation_composes_into_view():
    # right-drag rotates the model: view_total = view @ model
    # (ModelView(), ModelViewController.cpp:23-35)
    c = _ctl()
    c.on_mouse_button("right", True)
    c.on_cursor(0, 0)
    c.on_cursor(300.0, 0.0)                      # 90 deg model yaw
    c.update(1.0, 0.1)
    m = c.model_matrix()
    # world +x maps to -z under a +90deg yaw about Y (right-handed)
    np.testing.assert_allclose(m[:3, :3] @ [1, 0, 0], [0, 0, -1],
                               atol=1e-12)
    base = look_at((0, 0, -5), (0, 0, 0))
    np.testing.assert_allclose(c.view(), base @ m, atol=1e-12)


@pytest.fixture(scope="module")
def viewer():
    from gsrt.core.config import RenderConfig
    from gsrt.scene.catalog import random_cloud
    from gsrt.viewer.server import ViewerServer

    W, H = 64, 48
    cloud, cam0 = random_cloud(500, width=W, height=H)
    cfg = RenderConfig(width=W, height=H, conic_mode="standard")
    srv = ViewerServer(cloud, cfg, cam0, renderer="fast", port=0,
                       max_fps=1000.0)
    srv.start()
    yield srv
    srv.stop()


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=30) as r:
        return r.read()


def _post(port, path, obj):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                 data=json.dumps(obj).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.read()


def _wait_frame(srv, min_id=1, tries=300):
    import time
    for _ in range(tries):
        with srv.state.lock:
            if srv.state.frame_id >= min_id and srv.state.png:
                return srv.state.frame_id
        time.sleep(0.05)
    raise AssertionError(f"no frame >= {min_id} rendered")


def test_server_serves_page_and_frame(viewer):
    page = _get(viewer.port, "/").decode()
    assert "gsrt viewer" in page and "/input" in page
    _wait_frame(viewer)
    png = _get(viewer.port, "/frame.png")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    stats = json.loads(_get(viewer.port, "/stats"))
    assert stats["splats"] == 500
    assert stats["width"] == 64 and stats["height"] == 48
    assert stats["mrays_s"] > 0 and "overlay" in stats


def test_server_input_drives_camera_and_rerender(viewer):
    first = _wait_frame(viewer)
    pos0 = viewer.state.controller.position.copy()
    _post(viewer.port, "/input", {"type": "key", "key": "w",
                                  "pressed": True})
    _wait_frame(viewer, first + 1)
    _post(viewer.port, "/input", {"type": "key", "key": "w",
                                  "pressed": False})
    assert not np.allclose(viewer.state.controller.position, pos0)


def test_server_heatmap_toggle(viewer):
    import time
    _wait_frame(viewer)
    _post(viewer.port, "/input", {"type": "setting", "heatmap": True})
    # poll until a heatmap frame lands (frames from earlier queued input
    # may still be in flight)
    for _ in range(300):
        stats = json.loads(_get(viewer.port, "/stats"))
        if stats["heatmap"]:
            break
        time.sleep(0.05)
    assert stats["heatmap"] is True
    _post(viewer.port, "/input", {"type": "setting", "heatmap": False})


def test_server_rejects_bad_input(viewer):
    req = urllib.request.Request(
        f"http://127.0.0.1:{viewer.port}/input", data=b"{not json",
        method="POST")
    with pytest.raises(urllib.error.HTTPError):
        urllib.request.urlopen(req, timeout=30)
