"""Arbitrary-ray Gaussian tracing (ray-space response) tests."""

import jax.numpy as jnp
import numpy as np

from gsrt.core.config import RenderConfig
from gsrt.models.gaussian_rt import render_fast, trace_gaussian_rays
from gsrt.ops.gaussian import (
    invert_cov3d,
    quat_scale_to_cov3d,
    ray_gaussian_response,
)
from gsrt.scene.catalog import random_cloud


def test_invert_cov3d():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(32, 4)).astype(np.float32)
    s = rng.uniform(0.2, 2.0, (32, 3)).astype(np.float32)
    cov = quat_scale_to_cov3d(jnp.asarray(q), jnp.asarray(s))
    inv = invert_cov3d(cov)

    def mat(c):
        c = np.asarray(c)
        m = np.zeros((c.shape[0], 3, 3))
        m[:, 0, 0], m[:, 0, 1], m[:, 0, 2] = c[:, 0], c[:, 1], c[:, 2]
        m[:, 1, 0], m[:, 1, 1], m[:, 1, 2] = c[:, 1], c[:, 3], c[:, 4]
        m[:, 2, 0], m[:, 2, 1], m[:, 2, 2] = c[:, 2], c[:, 4], c[:, 5]
        return m

    prod = mat(cov) @ mat(inv)
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape),
                               atol=2e-3)


def test_ray_response_center_hit():
    """A ray through the center reaches g_min = 0 at t* = distance."""
    cov = quat_scale_to_cov3d(jnp.array([[1.0, 0, 0, 0]]),
                              jnp.array([[0.5, 0.5, 0.5]]))
    inv = invert_cov3d(cov)
    orig = jnp.array([[0.0, 0.0, 0.0]])
    dirn = jnp.array([[0.0, 0.0, 1.0]])
    means = jnp.array([[0.0, 0.0, 4.0]])
    t, g = ray_gaussian_response(orig, dirn, means, inv)
    np.testing.assert_allclose(float(t[0, 0]), 4.0, atol=1e-5)
    np.testing.assert_allclose(float(g[0, 0]), 0.0, atol=1e-6)


def test_ray_response_offset():
    """Offset b from center of an isotropic σ gaussian → g = b²/(2σ²)."""
    sigma = 0.5
    cov = quat_scale_to_cov3d(jnp.array([[1.0, 0, 0, 0]]),
                              jnp.array([[sigma] * 3]))
    inv = invert_cov3d(cov)
    orig = jnp.array([[0.3, 0.0, 0.0]])
    dirn = jnp.array([[0.0, 0.0, 1.0]])
    means = jnp.array([[0.0, 0.0, 4.0]])
    t, g = ray_gaussian_response(orig, dirn, means, inv)
    np.testing.assert_allclose(float(g[0, 0]), 0.3 ** 2 / (2 * sigma ** 2),
                               rtol=1e-4)


def test_trace_matches_camera_render_on_axis():
    """For on-axis camera rays of a head-on scene, trace_gaussian_rays'
    transmittance must be close to the pixel-space renderer's (they use
    different projections — 3D exact vs EWA linearization — so tolerance is
    loose; on-axis the linearization is exact up to fx quantization)."""
    cloud, camera = random_cloud(100, seed=5, width=32, height=32)
    cfg = RenderConfig(width=32, height=32, conic_mode="standard")
    out = render_fast(cloud, camera, cfg)

    # central pixel's camera ray
    c2w = np.linalg.inv(np.asarray(camera.view))
    d_cam = np.array([(16.0 - float(camera.cx)) / float(camera.fx),
                      (16.0 - float(camera.cy)) / float(camera.fy), 1.0])
    d_world = c2w[:3, :3] @ d_cam
    orig = jnp.asarray(c2w[:3, 3])[None]
    dirn = jnp.asarray(d_world / d_cam[2])[None]  # t parameter == camera z

    trans, color, hits = trace_gaussian_rays(cloud, orig, dirn, cfg)
    t_pix = float(out.trans[16, 16])
    t_ray = float(trans[0])
    assert abs(t_pix - t_ray) < 0.15, (t_pix, t_ray)


def test_shadow_ray_through_cloud_attenuates():
    """Transmittance along a ray through the cloud < a ray that misses."""
    cloud, camera = random_cloud(200, seed=6, width=16, height=16)
    cfg = RenderConfig(width=16, height=16, conic_mode="standard")
    center = jnp.mean(cloud.means, axis=0)
    orig = jnp.stack([center + jnp.array([0, 0, -20.0]),
                      center + jnp.array([500.0, 0, -20.0])])
    dirn = jnp.asarray([[0.0, 0, 1.0], [0.0, 0, 1.0]])
    trans, _, hits = trace_gaussian_rays(cloud, orig, dirn, cfg)
    assert float(trans[0]) < float(trans[1])
    np.testing.assert_allclose(float(trans[1]), 1.0, atol=1e-5)
    assert int(hits[0]) > 0 and int(hits[1]) == 0
