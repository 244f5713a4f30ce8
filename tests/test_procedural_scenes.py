"""Cylinder/Mandelbulb procedurals in the path-traced scene + the
remaining SceneList catalog factories (CubesAndCommonScene,
CylinderCubesCommonScene, MandelbulbScene, SimpleTest, the OBJ-backed
CubeAndSpheres — SceneList.cpp:70-99).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gsrt.core.config import RenderConfig
from gsrt.models.path_tracer import _closest_hit, render_path_traced
from gsrt.scene.primitives_catalog import (
    _SceneBuilder,
    cube_and_spheres,
    cubes_and_common_scene,
    cylinder_cubes_common_scene,
    mandelbulb_scene,
    simple_test,
)


def _single_cyl_scene(radius=0.5, half_h=0.5):
    b = _SceneBuilder()
    b.cylinder((0.0, 0.0, 0.0), radius, b.lambertian((0.5, 0.5, 0.5)),
               half_h=half_h)
    return b.build()


def test_cylinder_side_hit():
    scene = _single_cyl_scene()
    orig = jnp.array([[2.0, 0.25, 0.0]])
    dirn = jnp.array([[-1.0, 0.0, 0.0]])
    t, n, m, hit, _, _ = _closest_hit(scene, orig, dirn, 1e-3, 1e4)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 1.5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(n[0]), [1.0, 0.0, 0.0], atol=1e-5)


def test_cylinder_cap_hit():
    scene = _single_cyl_scene()
    orig = jnp.array([[0.1, 2.0, 0.1]])
    dirn = jnp.array([[0.0, -1.0, 0.0]])
    t, n, m, hit, _, _ = _closest_hit(scene, orig, dirn, 1e-3, 1e4)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 1.5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(n[0]), [0.0, 1.0, 0.0], atol=1e-5)


def test_cylinder_y_window_matches_reference():
    """The reference rint accepts side hits only within center.y ± radius
    (ProceduralCylinder.rint:44-45); the builder's default half_h=radius
    mirrors that."""
    scene = _single_cyl_scene(radius=0.5)  # default half_h = radius
    orig = jnp.array([[2.0, 0.49, 0.0], [2.0, 0.51, 0.0]])
    dirn = jnp.array([[-1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
    t, _, _, hit, _, _ = _closest_hit(scene, orig, dirn, 1e-3, 1e4)
    assert bool(hit[0]) and not bool(hit[1])


def test_mandelbulb_hit_and_normal():
    b = _SceneBuilder()
    b.mandelbulb((0.0, 0.0, 0.0), 1.25, b.lambertian((0.5, 0.7, 1.0)))
    scene = b.build()
    orig = jnp.array([[0.0, 0.0, 3.0], [0.0, 3.0, 3.0]])
    dirn = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    t, n, _, hit, _, _ = _closest_hit(scene, orig, dirn, 1e-3, 1e4)
    # the center ray enters the bulb; the offset ray misses its bound
    assert bool(hit[0]) and not bool(hit[1])
    assert 3.0 - 1.3 < float(t[0]) < 3.0
    np.testing.assert_allclose(float(jnp.linalg.norm(n[0])), 1.0, rtol=1e-4)
    # surface normal faces the incoming ray
    assert float(jnp.dot(n[0], dirn[0])) < 0.0


def test_closer_primitive_wins_over_cylinder():
    b = _SceneBuilder()
    b.cylinder((0.0, 0.0, 0.0), 0.5, b.lambertian((0.5, 0.5, 0.5)))
    msph = b.metallic((0.9, 0.9, 0.9), 0.0)
    b.sphere((0.0, 0.0, 1.0), 0.25, msph)
    scene = b.build()
    orig = jnp.array([[0.0, 0.0, 3.0]])
    dirn = jnp.array([[0.0, 0.0, -1.0]])
    t, _, m, hit, _, _ = _closest_hit(scene, orig, dirn, 1e-3, 1e4)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 1.75, rtol=1e-5)
    assert int(m[0]) == msph


@pytest.mark.parametrize("factory,kwargs", [
    (cubes_and_common_scene, dict(grid=4)),
    (cylinder_cubes_common_scene, dict(grid=4)),
    (mandelbulb_scene, dict()),
    (simple_test, dict()),
    (cube_and_spheres, dict()),
])
def test_factory_renders_finite(factory, kwargs):
    scene, camera, extra = factory(16, 12, **kwargs)
    cfg = RenderConfig(width=16, height=12, samples=1, bounces=3,
                       has_sky=extra["has_sky"],
                       gamma_correction=extra["gamma"])
    img = np.asarray(render_path_traced(scene, camera, cfg, seed=5,
                                        aperture=extra["aperture"],
                                        focus=extra["focus"]))
    assert img.shape == (12, 16, 3)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0


def test_factories_deterministic():
    a, _, _ = cylinder_cubes_common_scene(16, 12, grid=4)
    b, _, _ = cylinder_cubes_common_scene(16, 12, grid=4)
    np.testing.assert_array_equal(np.asarray(a.cyl_center),
                                  np.asarray(b.cyl_center))
    np.testing.assert_array_equal(np.asarray(a.sph_center),
                                  np.asarray(b.sph_center))


def test_cylinder_instancing():
    from gsrt.scene.instancing import instantiate_scene, make_transform
    b = _SceneBuilder()
    b.cylinder((1.0, 0.0, 0.0), 0.5, b.light((1.0, 0.5, 0.2)))
    b.mandelbulb((0.0, 2.0, 0.0), 1.0, b.lambertian((0.5, 0.7, 1.0)))
    scene = b.build()
    inst = instantiate_scene(scene, [
        make_transform((0, 0, 0)),
        make_transform((0, 0, -4), rotate_y_deg=90.0, scale=2.0),
    ])
    assert inst.cyl_center.shape == (2, 3)
    assert inst.mnd_center.shape == (2, 3)
    # y-rotation moves the center in the xz plane and scales r and h
    np.testing.assert_allclose(np.asarray(inst.cyl_center[1]),
                               [0.0, 0.0, -4.0 - 1.0 * 2.0], atol=1e-5)
    np.testing.assert_allclose(float(inst.cyl_radius[1]), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(inst.cyl_half_h[1]), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(inst.mnd_radius[1]), 2.0, rtol=1e-5)


def test_cylinder_instancing_rejects_tilt():
    from gsrt.scene.instancing import instantiate_scene
    b = _SceneBuilder()
    b.cylinder((0.0, 0.0, 0.0), 0.5, b.lambertian((0.5, 0.5, 0.5)))
    scene = b.build()
    a = np.radians(30.0)
    tilt = np.zeros((3, 4), np.float32)
    tilt[:, :3] = np.array([[1, 0, 0],
                            [0, np.cos(a), -np.sin(a)],
                            [0, np.sin(a), np.cos(a)]], np.float32)
    with pytest.raises(AssertionError):
        instantiate_scene(scene, [tilt])
