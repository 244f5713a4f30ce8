"""Mixed splat+mesh scenes: Gaussians composited through the path tracer's
bounce loop (the reference's TLAS-with-hit-groups capability — splat BLAS
hit group 4 beside triangles/procedurals, Application.cpp:253-398;
closed by VERDICT round-1 item 5)."""

import numpy as np
import pytest
import jax.numpy as jnp

from gsrt.core.config import RenderConfig
from gsrt.core.types import GaussianCloud, Materials, make_camera, look_at
from gsrt.models.path_tracer import render_path_traced
from gsrt.ops.gaussian import quat_scale_to_cov3d
from gsrt.ops.sh import C0
from gsrt.scene.primitives_catalog import _SceneBuilder, mirror_in_gaussians


def _single_splat(center, scale, opacity, rgb):
    sh = ((jnp.asarray([rgb], jnp.float32) - 0.5) / C0)[:, None, :]
    return GaussianCloud(
        means=jnp.asarray([center], jnp.float32),
        cov3d=quat_scale_to_cov3d(jnp.asarray([[1.0, 0, 0, 0]]),
                                  jnp.asarray([[scale] * 3])),
        opacity=jnp.asarray([opacity], jnp.float32),
        sh=sh)


def _mirror_scene():
    b = _SceneBuilder()
    # fuzz-0 mirror quad at z=0 facing +z
    b.quad((-4, -4, 0), (4, -4, 0), (4, 4, 0), (-4, 4, 0),
           b.metallic((0.95, 0.95, 0.95), 0.0))
    cam = make_camera(look_at((0, 0, 6.0), (0, 0, 0.0)), 50.0, 24, 24)
    return b.build(), cam


@pytest.mark.slow
def test_splat_visible_to_primary_rays():
    """An opaque red splat between camera and mirror tints/attenuates."""
    scene, cam = _mirror_scene()
    cfg = RenderConfig(width=24, height=24, samples=2, bounces=3,
                       has_sky=True, gamma_correction=False)
    base = np.asarray(render_path_traced(scene, cam, cfg, seed=0))
    cloud = _single_splat((0.0, 0.0, 3.0), 0.6, 0.95, (1.0, 0.1, 0.1))
    mixed = np.asarray(render_path_traced(scene, cam, cfg, seed=0,
                                          gaussians=cloud))
    c = mixed[12, 12]
    c0 = base[12, 12]
    # red in-scatter dominates the center pixel
    assert c[0] > c0[0] + 0.1, (c, c0)
    assert c[0] > c[2] * 1.5, c


@pytest.mark.slow
def test_splat_visible_in_mirror_reflection():
    """A splat BEHIND the camera shows up only via the mirror bounce —
    the capability the reference structurally has but never exercises
    (any-ray splat hits)."""
    scene, cam = _mirror_scene()
    cfg = RenderConfig(width=24, height=24, samples=2, bounces=3,
                       has_sky=True, gamma_correction=False)
    base = np.asarray(render_path_traced(scene, cam, cfg, seed=0))
    # camera at z=6 looking at -z; splat at z=9 is behind the camera:
    # primary rays travel away from it, reflected rays travel +z through it
    cloud = _single_splat((0.0, 0.0, 9.0), 0.8, 0.95, (1.0, 0.1, 0.1))
    mixed = np.asarray(render_path_traced(scene, cam, cfg, seed=0,
                                          gaussians=cloud))
    c = mixed[12, 12]
    c0 = base[12, 12]
    assert c[0] > c0[0] + 0.05, (c, c0)
    assert c[0] > c[2] * 1.2, c


@pytest.mark.slow
def test_empty_cloud_is_identity():
    scene, cam = _mirror_scene()
    cfg = RenderConfig(width=24, height=24, samples=1, bounces=2,
                       has_sky=True, gamma_correction=False)
    base = np.asarray(render_path_traced(scene, cam, cfg, seed=0))
    cloud = _single_splat((0.0, 0.0, 3.0), 0.3, 0.0, (1.0, 0.1, 0.1))
    mixed = np.asarray(render_path_traced(scene, cam, cfg, seed=0,
                                          gaussians=cloud))
    np.testing.assert_allclose(base, mixed, atol=1e-5)


@pytest.mark.slow
def test_occlusion_bounds_splat_segment():
    """A splat BEHIND an opaque wall must not contribute (per-ray t_max
    clamps the medium segment at the surface hit)."""
    b = _SceneBuilder()
    b.quad((-4, -4, 0), (4, -4, 0), (4, 4, 0), (-4, 4, 0),
           b.lambertian((0.1, 0.1, 0.1)))
    scene = b.build()
    cam = make_camera(look_at((0, 0, 6.0), (0, 0, 0.0)), 50.0, 16, 16)
    cfg = RenderConfig(width=16, height=16, samples=1, bounces=1,
                       has_sky=True, gamma_correction=False)
    base = np.asarray(render_path_traced(scene, cam, cfg, seed=0))
    cloud = _single_splat((0.0, 0.0, -3.0), 0.6, 0.95, (1.0, 0.1, 0.1))
    mixed = np.asarray(render_path_traced(scene, cam, cfg, seed=0,
                                          gaussians=cloud))
    np.testing.assert_allclose(base[8, 8], mixed[8, 8], atol=1e-4)


def test_mirror_in_gaussians_catalog_scene():
    scene, cloud, cam, opts = mirror_in_gaussians(width=16, height=16,
                                                  n_splats=20)
    cfg = RenderConfig(width=16, height=16, samples=1, bounces=2,
                       has_sky=opts["has_sky"], gamma_correction=False)
    img = np.asarray(render_path_traced(scene, cam, cfg, seed=0,
                                        gaussians=cloud))
    assert np.isfinite(img).all()
    assert img.max() > 0.05
