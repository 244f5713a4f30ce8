"""End-to-end parity: JAX renderers vs the NumPy oracle.

This is the golden-image test strategy the reference lacked (SURVEY.md §4):
the oracle plays the role of the functional simulator.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gsrt.core.config import RenderConfig
from gsrt.core.types import make_camera, look_at
from gsrt.models.gaussian_rt import render_fast, render_reference
from gsrt.scene.catalog import demo_gauss_splat, random_cloud
from gsrt.utils.oracle import render_reference_oracle
from gsrt.ops.sh import eval_sh


def _oracle_args(cloud, camera):
    return dict(
        means=np.asarray(cloud.means), cov3d=np.asarray(cloud.cov3d),
        opacity=np.asarray(cloud.opacity), view=np.asarray(camera.view),
        fx=float(camera.fx), fy=float(camera.fy),
        cx=float(camera.cx), cy=float(camera.cy),
        width=camera.width, height=camera.height,
    )


def _sh_dc_colors(cloud, camera, degree=None):
    dirs = np.asarray(cloud.means) - np.asarray(camera.position)
    dirs /= np.maximum(np.linalg.norm(dirs, axis=-1, keepdims=True), 1e-9)
    if degree is None:
        degree = cloud.sh_degree
    return np.asarray(eval_sh(cloud.sh, jnp.asarray(dirs), degree))


@pytest.mark.parametrize("mode", ["reference", "fast"])
@pytest.mark.parametrize("conic", ["reference", "standard"])
def test_demo_scene_matches_oracle(mode, conic):
    """The reference's own 2-gaussian 16x16 demo (SceneList.cpp:124-125)."""
    cloud, camera = demo_gauss_splat()
    cfg = RenderConfig(width=16, height=16, k=8, use_exp_lut=True,
                       conic_mode=conic, max_passes=16)
    sh_dc = _sh_dc_colors(cloud, camera)
    want_t, want_p, want_c = render_reference_oracle(
        **_oracle_args(cloud, camera), k=cfg.k, max_passes=cfg.max_passes,
        use_exp_lut=True, conic_mode=conic, sh_dc=sh_dc)
    fn = {"reference": render_reference, "fast": render_fast}[mode]
    out = fn(cloud, camera, cfg)
    np.testing.assert_allclose(np.asarray(out.trans), want_t,
                               rtol=2e-4, atol=2e-5)
    # atol 3e-3: a pixel whose g lands exactly on an exp-LUT segment edge can
    # round to the adjacent segment (f32 g·32 → int), shifting alpha by
    # ~e⁻ᵍ/32 — inherent to the reference's LUT quantization, not a bug.
    np.testing.assert_allclose(np.asarray(out.color), want_c,
                               rtol=2e-3, atol=3e-3)
    if mode == "reference":
        np.testing.assert_array_equal(np.asarray(out.passes), want_p)


@pytest.mark.parametrize("mode", ["reference", "fast"])
def test_random_cloud_matches_oracle(mode):
    """200 random anisotropic splats at 32x24, standard conic, exact exp."""
    cloud, camera = random_cloud(200, seed=7, width=32, height=24)
    cfg = RenderConfig(width=32, height=24, k=8, use_exp_lut=False,
                       conic_mode="standard", max_passes=64, splat_chunk=64)
    sh_dc = _sh_dc_colors(cloud, camera)
    res = render_reference_oracle(
        **_oracle_args(cloud, camera), k=cfg.k, max_passes=cfg.max_passes,
        use_exp_lut=False, conic_mode="standard", sh_dc=sh_dc)
    want_t, want_p, want_c = res
    fn = {"reference": render_reference, "fast": render_fast}[mode]
    out = fn(cloud, camera, cfg)
    np.testing.assert_allclose(np.asarray(out.trans), want_t,
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out.color), want_c,
                               rtol=5e-3, atol=2e-3)


@pytest.mark.slow
def test_fast_equals_reference_mode():
    """The sorted one-sweep path must equal the multi-pass k-buffer path
    (mathematical identity; see gaussian_rt module docstring)."""
    cloud, camera = random_cloud(500, seed=11, width=48, height=32)
    cfg = RenderConfig(width=48, height=32, k=8, conic_mode="standard",
                       max_passes=128, splat_chunk=128)
    a = render_reference(cloud, camera, cfg)
    b = render_fast(cloud, camera, cfg)
    np.testing.assert_allclose(np.asarray(a.trans), np.asarray(b.trans),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                               rtol=1e-3, atol=1e-4)


def test_transmittance_decreases_with_opacity():
    cloud, camera = demo_gauss_splat()
    cfg = RenderConfig(width=16, height=16, conic_mode="standard")
    out1 = render_fast(cloud, camera, cfg)
    cloud2 = cloud._replace(opacity=cloud.opacity * 0.5)
    out2 = render_fast(cloud2, camera, cfg)
    center_t1 = float(out1.trans[8, 8])
    center_t2 = float(out2.trans[8, 8])
    assert center_t1 < center_t2 < 1.0


def test_empty_scene_is_background():
    cloud, camera = demo_gauss_splat()
    cloud = cloud._replace(opacity=jnp.zeros_like(cloud.opacity))
    cfg = RenderConfig(width=16, height=16)
    out = render_fast(cloud, camera, cfg)
    np.testing.assert_allclose(np.asarray(out.trans), 1.0)
    np.testing.assert_allclose(np.asarray(out.color), 0.0)


def test_depth_map_output():
    """render_fast's expected-depth map: a single opaque splat straight
    ahead yields E[z] ≈ alpha-weighted splat depth at the center pixel."""
    from gsrt.core.types import GaussianCloud
    from gsrt.ops.gaussian import quat_scale_to_cov3d
    cov = quat_scale_to_cov3d(jnp.array([[1.0, 0, 0, 0]]),
                              jnp.array([[0.3, 0.3, 0.3]]))
    cloud = GaussianCloud(means=jnp.array([[0.0, 0.0, 5.0]]), cov3d=cov,
                          opacity=jnp.array([0.9]), sh=jnp.zeros((1, 1, 3)))
    camera = make_camera(look_at((0, 0, 0), (0, 0, 1)), 60.0, 16, 16)
    cfg = RenderConfig(width=16, height=16, conic_mode="standard")
    out = render_fast(cloud, camera, cfg, with_depth=True)
    assert out.depth is not None
    center = float(out.depth[8, 8])
    alpha = 1.0 - float(out.trans[8, 8])
    np.testing.assert_allclose(center, alpha * 5.0, rtol=1e-3)
    # empty corner: no depth
    np.testing.assert_allclose(float(out.depth[0, 0]), 0.0, atol=1e-6)
