"""OBJ texcoords + map_Kd/map_d loading and triangle-UV texturing
(reference: tinyobjloader texcoords in Assets/Model.cpp, textures sampled
in Scatter.glsl:18, alpha cutout in TraceTree.rahit)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from gsrt.core.config import RenderConfig
from gsrt.scene.obj import load_obj, load_obj_dir, TEX_RES


def _write_png(path, arr):
    from PIL import Image
    Image.fromarray(arr).save(path)


def _make_textured_obj(d, name="quad", alpha=False):
    """A unit quad in z=0 with full [0,1]² UVs and a 2-tone texture:
    left half red, right half green (+ optional alpha: left transparent)."""
    tex = np.zeros((8, 8, 4 if alpha else 3), np.uint8)
    tex[:, :4, 0] = 255                      # left red
    tex[:, 4:, 1] = 255                      # right green
    if alpha:
        tex[:, :, 3] = 255
        tex[:, :4, 3] = 0                    # left transparent
    _write_png(os.path.join(d, f"{name}.png"), tex)
    with open(os.path.join(d, f"{name}.mtl"), "w") as f:
        f.write(f"newmtl tx\nKd 1 1 1\nmap_Kd {name}.png\n")
        if alpha:
            f.write(f"map_d {name}.png\n")
    with open(os.path.join(d, f"{name}.obj"), "w") as f:
        f.write(f"mtllib {name}.mtl\n")
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n")
        f.write("vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n")
        f.write("usemtl tx\nf 1/1 2/2 3/3 4/4\n")
    return os.path.join(d, f"{name}.obj")


def test_load_texcoords_and_map_kd(tmp_path):
    pytest.importorskip("PIL")
    path = _make_textured_obj(str(tmp_path))
    scene = load_obj(path)
    assert scene.tri_v0.shape[0] == 2          # quad fan-triangulated
    assert scene.tri_uv0 is not None
    assert scene.textures is not None
    assert scene.textures.shape == (1, TEX_RES, TEX_RES, 3)
    assert scene.materials.texture_id is not None
    # fan (1,2,3)+(1,3,4): corner UVs of the first triangle
    np.testing.assert_allclose(np.asarray(scene.tri_uv0[0]), [0, 0],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(scene.tri_uv1[0]), [1, 0],
                               atol=1e-6)
    # texture content: left half red, right half green (v flipped to
    # OBJ bottom-left origin)
    t = np.asarray(scene.textures[0])
    assert t[TEX_RES // 2, 8, 0] > 0.9 and t[TEX_RES // 2, 8, 1] < 0.1
    assert t[TEX_RES // 2, -8, 1] > 0.9


def test_textured_render_uses_triangle_uvs(tmp_path):
    """Path-trace the textured quad face-on: left pixels red, right green —
    only true if the sampler uses interpolated triangle UVs (a sphere-UV
    fallback would smear both halves)."""
    pytest.importorskip("PIL")
    from gsrt.core.types import make_camera, look_at
    from gsrt.models.path_tracer import render_path_traced

    path = _make_textured_obj(str(tmp_path))
    scene = load_obj(path)
    cam = make_camera(look_at((0.5, 0.5, 2.0), (0.5, 0.5, 0.0)),
                      40.0, 32, 32)
    cfg = RenderConfig(width=32, height=32, samples=4, bounces=2,
                       has_sky=True, gamma_correction=False)
    img = np.asarray(render_path_traced(scene, cam, cfg, seed=0))
    left = img[16, 6]
    right = img[16, 26]
    assert left[0] > left[1] * 2, f"left should be red, got {left}"
    assert right[1] > right[0] * 2, f"right should be green, got {right}"


def test_alpha_cutout_with_triangle_uvs(tmp_path):
    """map_d mask: rays through the transparent left half must pass
    through (TraceTree.rahit semantics on real UVs)."""
    pytest.importorskip("PIL")
    from gsrt.models.path_tracer import _closest_hit_cutout

    path = _make_textured_obj(str(tmp_path), alpha=True)
    scene = load_obj(path)
    assert scene.alpha_textures is not None
    # ray at u≈0.25 (transparent), ray at u≈0.75 (opaque)
    orig = jnp.asarray([[0.25, 0.5, 2.0], [0.75, 0.5, 2.0]])
    dirn = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    t, n, m, hit, uv, _ = _closest_hit_cutout(scene, orig, dirn, 1e-3, 1e4)
    assert not bool(hit[0]), "transparent texel should be cut out"
    assert bool(hit[1]), "opaque texel should hit"


def test_load_obj_dir_with_overrides(tmp_path):
    pytest.importorskip("PIL")
    from gsrt.core.types import Materials

    _make_textured_obj(str(tmp_path), "a")
    _make_textured_obj(str(tmp_path), "b")
    scene = load_obj_dir(
        str(tmp_path),
        overrides=[("b*", (Materials.METALLIC, (0.9, 0.9, 0.9), 0.1, 1.0))])
    assert scene.tri_v0.shape[0] == 4
    models = np.asarray(scene.materials.model)
    assert (models == Materials.METALLIC).sum() >= 1
    assert (models == Materials.LAMBERTIAN).sum() >= 1
