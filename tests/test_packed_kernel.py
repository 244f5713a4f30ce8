"""Packed Pallas blend kernel (gsrt.ops.splat_packed) vs the brute-force
sorted path and vs the legacy kernels. Interpret mode on CPU (SURVEY.md §4
— simulator role).

The packed kernel's unique risks, each covered here:
  * chunks spanning several subtile segments (MXU segment bookkeeping);
  * the group's 128-lane alignment prefix (lanes belonging to the previous
    group's last subtile must stay inert);
  * empty subtiles inside a group;
  * the log-space exclusive cumprod (precision and alpha_clamp edge).
"""

import numpy as np
import pytest

from gsrt.core.config import RenderConfig
from gsrt.models.gaussian_rt import render_fast, render_tiled
from gsrt.scene.catalog import demo_gauss_splat, random_cloud


def _cmp(cloud, camera, cfg, max_pairs):
    a = render_fast(cloud, camera, cfg)
    b = render_tiled(cloud, camera, cfg, max_pairs=max_pairs, interpret=True)
    np.testing.assert_allclose(np.asarray(a.trans), np.asarray(b.trans),
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                               rtol=1e-3, atol=4e-4)


@pytest.mark.parametrize("tw,th", [(16, 16), (32, 8)])
def test_packed_matches_fast(tw, th):
    cloud, camera = random_cloud(150, seed=3, width=96, height=48)
    cfg = RenderConfig(width=96, height=48, conic_mode="standard",
                       tile_w=tw, tile_h=th, blend_impl="packed")
    _cmp(cloud, camera, cfg, max_pairs=1 << 14)


def test_packed_matches_fast_lut():
    cloud, camera = random_cloud(120, seed=5, width=64, height=48)
    cfg = RenderConfig(width=64, height=48, conic_mode="standard",
                       tile_w=16, tile_h=16, blend_impl="packed",
                       use_exp_lut=True)
    fast_cfg = cfg  # render_fast honors use_exp_lut too
    a = render_fast(cloud, camera, fast_cfg)
    b = render_tiled(cloud, camera, cfg, max_pairs=1 << 14, interpret=True)
    np.testing.assert_allclose(np.asarray(a.trans), np.asarray(b.trans),
                               rtol=2e-4, atol=2e-4)


def test_packed_vs_subtile_many_small_segments():
    """Dense tiny subtiles -> single chunks hold many segments, groups have
    empty subtiles and misaligned starts. The packed and subtile kernels
    share the binning, so any segment-bookkeeping bug shows as a diff far
    above f32/log-exp noise."""
    cloud, camera = random_cloud(250, seed=11, width=80, height=80)
    base = RenderConfig(width=80, height=80, conic_mode="standard",
                        tile_w=16, tile_h=8)
    b = render_tiled(cloud, camera, base.replace(blend_impl="packed"),
                     max_pairs=1 << 14, interpret=True)
    c = render_tiled(cloud, camera, base.replace(blend_impl="subtile"),
                     max_pairs=1 << 14, interpret=True)
    np.testing.assert_allclose(np.asarray(b.trans), np.asarray(c.trans),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.color), np.asarray(c.color),
                               rtol=1e-4, atol=1e-5)


def test_packed_empty_tiles_background():
    from gsrt.core.types import GaussianCloud, make_camera, look_at
    from gsrt.ops.gaussian import quat_scale_to_cov3d
    import jax.numpy as jnp
    cov = quat_scale_to_cov3d(jnp.array([[1.0, 0, 0, 0]]),
                              jnp.array([[0.05, 0.05, 0.05]]))
    cloud = GaussianCloud(
        means=jnp.array([[0.0, 0.0, 3.0]]), cov3d=cov,
        opacity=jnp.array([0.9]), sh=jnp.zeros((1, 1, 3)))
    camera = make_camera(look_at((0, 0, 0), (0, 0, 1)), 90.0, 256, 24)
    cfg = RenderConfig(width=256, height=24, conic_mode="standard",
                       tile_w=16, tile_h=16, blend_impl="packed")
    out = render_tiled(cloud, camera, cfg, max_pairs=1 << 13, interpret=True)
    t = np.asarray(out.trans)
    assert np.isfinite(t).all()
    assert (t <= 1.0 + 1e-6).all() and (t >= 0).all()
    assert t[0, 0] == 1.0 and t[-1, -1] == 1.0
