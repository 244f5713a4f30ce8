"""Unit tests: covariance construction, projection, response evaluation.

Cross-checked against the NumPy oracle and closed-form expectations
(reference math at RayTracingInVulkan/src/Assets/Sphere.hpp:129-160 and
assets/shaders/RayTracing.ProceduralGauss.rint:66-102).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gsrt.core.types import make_camera, look_at
from gsrt.ops.gaussian import (
    cov3d_to_matrix,
    eval_gaussian_response,
    project_gaussians,
    quat_scale_to_cov3d,
    screen_radius,
)
from gsrt.utils.oracle import quat_scale_to_cov3d_np


def test_identity_quat_isotropic_scale():
    quat = jnp.array([[1.0, 0, 0, 0]])
    scale = jnp.array([[2.0, 2.0, 2.0]])
    cov = np.asarray(quat_scale_to_cov3d(quat, scale))[0]
    np.testing.assert_allclose(cov, [4, 0, 0, 4, 0, 4], atol=1e-6)


def test_cov3d_matches_oracle_random():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(64, 4)).astype(np.float32)
    s = rng.uniform(0.1, 3.0, (64, 3)).astype(np.float32)
    got = np.asarray(quat_scale_to_cov3d(jnp.asarray(q), jnp.asarray(s)))
    want = quat_scale_to_cov3d_np(q, s)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_cov3d_is_psd():
    rng = np.random.default_rng(2)
    q = rng.normal(size=(128, 4)).astype(np.float32)
    s = rng.uniform(0.05, 5.0, (128, 3)).astype(np.float32)
    cov = quat_scale_to_cov3d(jnp.asarray(q), jnp.asarray(s))
    mats = np.asarray(cov3d_to_matrix(cov))
    eig = np.linalg.eigvalsh(mats)
    assert (eig > -1e-4).all()
    # eigenvalues of Σ = R S² Rᵀ are the squared scales
    np.testing.assert_allclose(np.sort(eig, -1), np.sort(s * s, -1),
                               rtol=1e-3, atol=1e-3)


def _simple_camera(w=64, h=64, fov=90.0, eye=(0, 0, 0), target=(0, 0, 1)):
    return make_camera(look_at(eye, target), fov, w, h)


def test_projection_center_pixel():
    """A splat straight ahead projects to the principal point with depth =
    distance along the view axis."""
    cam = _simple_camera()
    means = jnp.array([[0.0, 0.0, 5.0]])
    cov3d = quat_scale_to_cov3d(jnp.array([[1.0, 0, 0, 0]]),
                                jnp.array([[1.0, 1, 1]]))
    depth, mean2d, quad, det, in_front = project_gaussians(means, cov3d, cam)
    assert np.asarray(in_front)[0]
    np.testing.assert_allclose(np.asarray(depth)[0], 5.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mean2d)[0], [32.0, 32.0], atol=1e-4)


def test_projection_behind_camera_culled():
    cam = _simple_camera()
    means = jnp.array([[0.0, 0.0, -5.0]])
    cov3d = jnp.array([[1.0, 0, 0, 1, 0, 1]])
    *_, in_front = project_gaussians(means, cov3d, cam)
    assert not np.asarray(in_front)[0]


def test_isotropic_projection_cov2d():
    """Isotropic Σ = σ²I at distance z on-axis → Cov2D ≈ (fσ/z)² I, so the
    standard-mode quad is (z/(fσ))² on the diagonal."""
    sigma, z = 0.5, 4.0
    cam = _simple_camera(w=128, h=128, fov=90.0)
    f = 64.0  # 0.5*128/tan(45°)
    means = jnp.array([[0.0, 0.0, z]])
    cov3d = jnp.array([[sigma**2, 0, 0, sigma**2, 0, sigma**2]])
    depth, mean2d, quad, det, _ = project_gaussians(means, cov3d, cam,
                                                    conic_mode="standard")
    expected_var = (f * sigma / z) ** 2
    q = np.asarray(quad)[0]
    np.testing.assert_allclose(q[0], 1.0 / expected_var, rtol=1e-4)
    np.testing.assert_allclose(q[2], 1.0 / expected_var, rtol=1e-4)
    np.testing.assert_allclose(q[1], 0.0, atol=1e-6)
    # reference mode returns the covariance itself
    _, _, quad_ref, _, _ = project_gaussians(means, cov3d, cam,
                                             conic_mode="reference")
    np.testing.assert_allclose(np.asarray(quad_ref)[0][0], expected_var,
                               rtol=1e-4)


def test_response_quadratic_form():
    quad = jnp.array([2.0, 0.5, 1.0])
    pix = jnp.array([3.0, 4.0])
    mean = jnp.array([1.0, 2.0])
    g = eval_gaussian_response(pix, mean, quad)
    # dx=2, dy=2 → ½(2·4 + 2·0.5·4 + 1·4) = ½·16 = 8
    np.testing.assert_allclose(np.asarray(g), 8.0, atol=1e-6)


def test_screen_radius_contains_cutoff_region():
    """Every pixel with g ≤ cutoff must lie within screen_radius of mean2d."""
    rng = np.random.default_rng(3)
    for _ in range(10):
        a = rng.uniform(0.05, 2.0)
        c = rng.uniform(0.05, 2.0)
        b = rng.uniform(-1, 1) * np.sqrt(a * c) * 0.9
        quad = jnp.array([[a, b, c]])
        r = float(np.asarray(screen_radius(quad, "standard", 5.6))[0])
        # sample the ellipse boundary: g = 5.6 at points x with ½xᵀQx = 5.6
        Q = np.array([[a, b], [b, c]])
        eigval, eigvec = np.linalg.eigh(Q)
        for lam, v in zip(eigval, eigvec.T):
            x = v * np.sqrt(2 * 5.6 / lam)
            assert np.linalg.norm(x) <= r * 1.0001
