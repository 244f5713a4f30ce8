"""Path tracer tests — physical sanity checks on tiny images (CPU).

The reference has no golden images for these scenes either (SURVEY.md §4);
we assert physical invariants: sky visibility, shadowing, energy bounds,
dielectric transparency, Cornell-box illumination.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsrt.core.config import RenderConfig
from gsrt.models.path_tracer import (
    generate_camera_rays,
    render_ambient_occlusion,
    render_path_traced,
    render_shadow_rays,
)
from gsrt.scene.primitives_catalog import (
    cornell_box,
    cube_and_spheres,
    ray_tracing_in_one_weekend,
)


def test_camera_rays_normalized_and_centered():
    scene, camera, extra = cube_and_spheres(32, 24)
    cfg = RenderConfig(width=32, height=24, samples=1)
    orig, dirn = generate_camera_rays(jax.random.PRNGKey(0), camera, cfg)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(dirn), axis=-1),
                               1.0, atol=1e-5)
    # all origins at the camera position when aperture = 0
    np.testing.assert_allclose(
        np.asarray(orig),
        np.broadcast_to(np.asarray(camera.position), orig.shape),
        atol=1e-5)


def test_empty_scene_is_sky():
    from gsrt.scene.primitives_catalog import _SceneBuilder
    b = _SceneBuilder()
    b.lambertian((1, 1, 1))  # at least one material
    scene = b.build()
    _, camera, _ = cube_and_spheres(16, 16)
    cfg = RenderConfig(width=16, height=16, samples=1, bounces=4,
                       has_sky=True, gamma_correction=False)
    img = np.asarray(render_path_traced(scene, camera, cfg))
    assert np.isfinite(img).all()
    # sky gradient: all pixels between white and (0.5, 0.7, 1.0)
    assert (img >= 0.49).all() and (img <= 1.0 + 1e-5).all()


def test_no_sky_empty_scene_is_black():
    from gsrt.scene.primitives_catalog import _SceneBuilder
    b = _SceneBuilder()
    b.lambertian((1, 1, 1))
    scene = b.build()
    _, camera, _ = cube_and_spheres(16, 16)
    cfg = RenderConfig(width=16, height=16, samples=1, bounces=4,
                       has_sky=False, gamma_correction=False)
    img = np.asarray(render_path_traced(scene, camera, cfg))
    np.testing.assert_allclose(img, 0.0, atol=1e-6)


def test_cube_and_spheres_renders():
    scene, camera, extra = cube_and_spheres(32, 24)
    cfg = RenderConfig(width=32, height=24, samples=2, bounces=6,
                       has_sky=True, gamma_correction=False)
    img = np.asarray(render_path_traced(scene, camera, cfg, seed=1))
    assert np.isfinite(img).all()
    assert img.max() <= 1.0 + 1e-4 and img.min() >= 0.0
    # the scene occludes part of the sky: some pixels darker than pure sky
    assert img.min() < 0.45


def test_cornell_box_light_illuminates():
    scene, camera, extra = cornell_box(24, 24, with_boxes=False)
    cfg = RenderConfig(width=24, height=24, samples=4, bounces=6,
                       has_sky=False, gamma_correction=False)
    img = np.asarray(render_path_traced(scene, camera, cfg, seed=2))
    assert np.isfinite(img).all()
    assert img.max() > 0.05, "light must illuminate the box"
    # green wall on the left, red on the right (y-down camera flips rows
    # only, not columns)
    left = img[:, :6].mean(axis=(0, 1))
    right = img[:, -6:].mean(axis=(0, 1))
    assert left[1] > left[0], f"left wall should be green-ish {left}"
    assert right[0] > right[1], f"right wall should be red-ish {right}"


@pytest.mark.slow
def test_shadow_rays_darker_in_shadow():
    scene, camera, extra = cube_and_spheres(32, 24)
    cfg = RenderConfig(width=32, height=24, shadow_rays=4)
    img = np.asarray(render_shadow_rays(scene, camera, cfg,
                                        light_pos=(0, 5, 2)))
    assert np.isfinite(img).all()
    assert img.min() >= 0.0 and img.max() <= 1.0 + 1e-5


def test_ambient_occlusion_bounds():
    scene, camera, extra = cube_and_spheres(32, 24)
    cfg = RenderConfig(width=32, height=24, ao_rays=4)
    img = np.asarray(render_ambient_occlusion(scene, camera, cfg))
    assert np.isfinite(img).all()
    assert img.min() >= 0.0 and img.max() <= 1.0 + 1e-5


def test_rtiow_scene_builds():
    scene, camera, extra = ray_tracing_in_one_weekend(16, 12)
    assert scene.sph_center.shape[0] > 400  # ground + grid + 3 heroes
    cfg = RenderConfig(width=16, height=12, samples=1, bounces=3)
    img = np.asarray(render_path_traced(scene, camera, cfg))
    assert np.isfinite(img).all()
