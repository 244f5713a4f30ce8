"""Smoke tests against the reference's own data assets (read-only, skipped
when /root/reference is not mounted) — proves the loaders handle the real
scene files the reference ships."""

import os

import numpy as np
import pytest

REF = "/root/reference/RayTracingInVulkan"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference assets not mounted")


def test_load_reference_cube_obj():
    from gsrt.scene.obj import load_obj
    s = load_obj(os.path.join(REF, "assets/models/cube_multi.obj"))
    assert s.tri_v0.shape[0] == 12          # cube = 12 triangles
    v = np.asarray(s.tri_v0)
    assert np.allclose(v.min(0), [-0.5, -0.5, -0.5])
    assert np.allclose(v.max(0), [0.5, 0.5, 0.5])


def test_load_reference_schooner_obj():
    from gsrt.scene.obj import load_obj
    s = load_obj(os.path.join(REF, "assets/models/karimSchooner.obj"))
    assert s.tri_v0.shape[0] > 1000
    assert np.isfinite(np.asarray(s.tri_v0)).all()


def test_render_reference_obj_scene():
    """Path-trace the reference cube asset end-to-end."""
    from gsrt.core.config import RenderConfig
    from gsrt.core.types import make_camera, look_at
    from gsrt.models.path_tracer import render_path_traced
    from gsrt.scene.obj import load_obj
    s = load_obj(os.path.join(REF, "assets/models/cube_multi.obj"))
    camera = make_camera(look_at((2, 1.5, 2), (0, 0, 0)), 45.0, 24, 24)
    cfg = RenderConfig(width=24, height=24, samples=2, bounces=3,
                       gamma_correction=False)
    img = np.asarray(render_path_traced(s, camera, cfg))
    assert np.isfinite(img).all()
    # the cube occludes sky at the center
    assert img[12, 12].mean() != img[0, 0].mean()


def test_load_reference_camera_file():
    from gsrt.scene.obj import load_camera_file
    path = os.path.join(REF, "Scenes/Bathroom/Camera.camera")
    if not os.path.exists(path):
        pytest.skip("Scenes data not present")
    eye, center = load_camera_file(path)
    assert len(eye) == 3 and len(center) == 3
    assert all(np.isfinite(v) for v in eye + center)


def test_bare_usemtl_line_parses():
    """Reference Scenes data contains nameless `usemtl` lines
    (Blender_2.83/_scaffold_000.obj) — must fall back to the default
    material, not crash (regression: IndexError on tok[1])."""
    import tempfile
    from gsrt.scene.obj import load_obj
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "bare.obj")
        with open(p, "w") as f:
            f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nusemtl\nf 1 2 3\n")
        s = load_obj(p)
        assert int(s.tri_v0.shape[0]) == 1
