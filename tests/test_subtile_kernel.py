"""Subtile Pallas kernel (gsrt.ops.splat_subtile) vs the brute-force sorted
path. blend_impl is pinned to "subtile" — the packed successor kernel has
its own suite (test_packed_kernel.py). Interpret mode on CPU (SURVEY.md §4 — simulator role). The subtile
path must reproduce render_fast (itself oracle-validated), for several tile
shapes including groups that span framebuffer row boundaries."""

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
    # atol 4e-4: payload colors/opacity are 15-bit packed (tile_binning.pack15)
    np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                               rtol=1e-3, atol=4e-4)


@pytest.mark.parametrize("tw,th", [(16, 16), (16, 8), (32, 8)])
def test_subtile_matches_fast(tw, th):
    cloud, camera = random_cloud(150, seed=3, width=96, height=48)
    cfg = RenderConfig(width=96, height=48, conic_mode="standard",
                       tile_w=tw, tile_h=th, pair_chunk=128,
                       blend_impl="subtile")
    _cmp(cloud, camera, cfg, max_pairs=1 << 15)


@pytest.mark.slow
def test_subtile_row_spanning_groups():
    """width=48 -> ntx=3 subtiles per row at 16px: a BS=4 group spans the
    framebuffer row boundary; per-subtile (ty, tx) math must stay exact.

    Checked against the legacy (128, 8) kernel, which must agree to f32
    noise: both kernels share the binning, so any group-geometry bug in the
    subtile path shows up as a subtile-vs-legacy diff. (vs render_fast both
    paths show one ~2e-3 pixel on this scene — a splat exactly at the alpha
    threshold whose bbox-binned footprint misses one marginal tile.)"""
    cloud, camera = random_cloud(80, seed=7, width=48, height=64)
    cfg = RenderConfig(width=48, height=64, conic_mode="standard",
                       tile_w=16, tile_h=16, pair_chunk=128,
                       blend_impl="subtile")
    b = render_tiled(cloud, camera, cfg, max_pairs=1 << 14, interpret=True)
    cfg_legacy = cfg.replace(tile_w=128, tile_h=8)
    c = render_tiled(cloud, camera, cfg_legacy, max_pairs=1 << 14,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(b.trans), np.asarray(c.trans),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.color), np.asarray(c.color),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_subtile_reference_conic_mode():
    cloud, camera = demo_gauss_splat(width=128, height=16)
    cfg = RenderConfig(width=128, height=16, conic_mode="reference",
                       tile_w=16, tile_h=16, pair_chunk=128,
                       blend_impl="subtile")
    a = render_fast(cloud, camera, cfg)
    b = render_tiled(cloud, camera, cfg, max_pairs=1 << 12, interpret=True)
    np.testing.assert_allclose(np.asarray(a.trans), np.asarray(b.trans),
                               rtol=2e-4, atol=1e-4)


def test_subtile_empty_tiles_background():
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
                       tile_w=16, tile_h=16, pair_chunk=128,
                       blend_impl="subtile")
    out = render_tiled(cloud, camera, cfg, max_pairs=1 << 13, interpret=True)
    t = np.asarray(out.trans)
    assert np.isfinite(t).all()
    assert (t <= 1.0 + 1e-6).all() and (t >= 0).all()
    assert t[0, 0] == 1.0 and t[-1, -1] == 1.0
