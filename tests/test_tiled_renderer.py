"""Tiled (binning + Pallas kernel) path vs the brute-force sorted path.

Runs the Pallas kernel in interpret mode on CPU (SURVEY.md §4 — simulator
role). The tiled path must reproduce render_fast, which is itself validated
against the NumPy oracle.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsrt.core.config import RenderConfig
from gsrt.models.gaussian_rt import render_fast, render_tiled
from gsrt.ops.gaussian import project_gaussians, screen_extents
from gsrt.ops.tile_binning import build_tile_binning, compute_tile_spans
from gsrt.scene.catalog import demo_gauss_splat, random_cloud


def _render_tiled_interp(cloud, camera, cfg, max_pairs):
    return render_tiled(cloud, camera, cfg, max_pairs=max_pairs,
                        interpret=True)


@pytest.mark.slow
@pytest.mark.parametrize("seed,n", [(3, 120)])
def test_tiled_matches_fast(seed, n):
    cloud, camera = random_cloud(n, seed=seed, width=128, height=32)
    # payload="f32": bit-parity tier (the compact default is a ~4e-3
    # fast tier — covered by test_tiled_default_tier_close_to_fast)
    cfg = RenderConfig(width=128, height=32, conic_mode="standard",
                       payload="f32", blend_math="f32")
    a = render_fast(cloud, camera, cfg)
    b = _render_tiled_interp(cloud, camera, cfg, max_pairs=1 << 15)
    np.testing.assert_allclose(np.asarray(a.trans), np.asarray(b.trans),
                               rtol=2e-4, atol=1e-4)
    # atol 4e-4: payload colors/opacity are 16-bit packed (see
    # tile_binning.pack16), quantization ~6e-5 per blended splat
    np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                               rtol=1e-3, atol=4e-4)


def test_tiled_default_tier_close_to_fast():
    """The DEFAULT RenderConfig selects the compact payload + logmm scan +
    bf16 blend-math fast tier (the measured sweep winner, 78.9 ms vs 83.5
    f32-math on v5e 1M@1080p); it must stay within the documented
    ~1e-2-class bound of the exact render_fast image (config.py blend_math
    comment; the pure-payload bound without bf16 is ~6e-3)."""
    cloud, camera = random_cloud(150, seed=4, width=128, height=32)
    cfg = RenderConfig(width=128, height=32, conic_mode="standard")
    assert (cfg.payload == "compact" and cfg.scan_impl == "logmm"
            and cfg.blend_math == "bf16")
    a = render_fast(cloud, camera, cfg)
    b = _render_tiled_interp(cloud, camera, cfg, max_pairs=1 << 15)
    np.testing.assert_allclose(np.asarray(a.trans), np.asarray(b.trans),
                               atol=6e-2)
    np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                               atol=6e-2)
    # typical error stays 1e-3-class even with bf16 EWA math
    assert np.abs(np.asarray(a.color) - np.asarray(b.color)).mean() < 2e-3


def test_tiled_reference_conic_mode():
    """The tiled path must also reproduce the reference's quirk conic."""
    cloud, camera = demo_gauss_splat(width=128, height=16)
    # payload="f32": this asserts the bit-parity tier (compact, the
    # default, is a documented ~4e-3 fast tier with its own test)
    cfg = RenderConfig(width=128, height=16, conic_mode="reference",
                       payload="f32", blend_math="f32")
    a = render_fast(cloud, camera, cfg)
    b = _render_tiled_interp(cloud, camera, cfg, max_pairs=1 << 12)
    np.testing.assert_allclose(np.asarray(a.trans), np.asarray(b.trans),
                               rtol=2e-4, atol=1e-4)


def test_tiled_demo_scene():
    cloud, camera = demo_gauss_splat(width=128, height=16)
    # payload="f32": bit-parity tier (the compact default quantizes
    # opacity to u8 since the rgba8888 payload word — its looser bound is
    # test_tiled_default_tier_close_to_fast's)
    cfg = RenderConfig(width=128, height=16, conic_mode="standard",
                       payload="f32", blend_math="f32")
    a = render_fast(cloud, camera, cfg)
    b = _render_tiled_interp(cloud, camera, cfg, max_pairs=1 << 13)
    np.testing.assert_allclose(np.asarray(a.trans), np.asarray(b.trans),
                               rtol=2e-4, atol=1e-4)


def test_tiled_overflow_flag():
    """max_pairs smaller than the true pair count must set overflow and drop
    the farthest splats (deterministic by sort order), not crash."""
    cloud, camera = random_cloud(500, seed=1, width=160, height=96)
    cfg = RenderConfig(width=160, height=96, conic_mode="standard")
    depth, mean2d, quad, det, in_front = project_gaussians(
        cloud.means, cloud.cov3d, camera)
    rx, ry = screen_extents(quad, "standard", cfg.g_cutoff)
    colors = jnp.ones((cloud.n, 3)) * 0.5
    b = build_tile_binning(
        depth, mean2d[:, 0], mean2d[:, 1], quad[:, 0], quad[:, 1],
        quad[:, 2], cloud.opacity, colors[:, 0], colors[:, 1], colors[:, 2],
        rx, ry, in_front,
        width=160, height=96, chunk=128, max_pairs=128)
    assert bool(b.overflow)
    assert int(b.total_pairs) > 128


def test_tile_spans_cover_footprints():
    """Every pixel within `radius` of a projected center must land in a tile
    inside the splat's span."""
    rng = np.random.default_rng(0)
    mean2d = jnp.asarray(rng.uniform(-50, 200, (64, 2)).astype(np.float32))
    radius = jnp.asarray(rng.uniform(0.5, 40, 64).astype(np.float32))
    alive = jnp.ones(64, bool)
    W, H, TW, TH = 160, 96, 128, 8
    x0, x1, y0, y1, touched = compute_tile_spans(
        mean2d[:, 0], mean2d[:, 1], radius, radius, alive, W, H, TW, TH)
    x0, x1, y0, y1 = map(np.asarray, (x0, x1, y0, y1))
    m2, r, tch = np.asarray(mean2d), np.asarray(radius), np.asarray(touched)
    for i in range(64):
        if tch[i] == 0:
            continue
        for dx, dy in [(-1, 0), (1, 0), (0, -1), (0, 1), (0, 0)]:
            px = np.clip(m2[i, 0] + dx * r[i] * 0.99, 0, W - 1)
            py = np.clip(m2[i, 1] + dy * r[i] * 0.99, 0, H - 1)
            tx, ty = int(px // TW), int(py // TH)
            assert x0[i] <= tx <= x1[i], (i, tx, x0[i], x1[i])
            assert y0[i] <= ty <= y1[i], (i, ty, y0[i], y1[i])
    # structural check: spans are within grid and non-inverted
    assert (x0 <= x1).all() and (y0 <= y1).all()
    assert (x0 >= 0).all() and (y0 >= 0).all()


def test_empty_tiles_render_background():
    """A tiny splat leaves most tiles empty — they must come out as
    background (trans=1), not garbage."""
    from gsrt.core.types import GaussianCloud, make_camera, look_at
    from gsrt.ops.gaussian import quat_scale_to_cov3d
    cov = quat_scale_to_cov3d(jnp.array([[1.0, 0, 0, 0]]),
                              jnp.array([[0.05, 0.05, 0.05]]))
    cloud = GaussianCloud(
        means=jnp.array([[0.0, 0.0, 3.0]]), cov3d=cov,
        opacity=jnp.array([0.9]), sh=jnp.zeros((1, 1, 3)))
    camera = make_camera(look_at((0, 0, 0), (0, 0, 1)), 90.0, 256, 24)
    cfg = RenderConfig(width=256, height=24, conic_mode="standard")
    out = _render_tiled_interp(cloud, camera, cfg, max_pairs=1 << 13)
    t = np.asarray(out.trans)
    assert np.isfinite(t).all()
    assert (t <= 1.0 + 1e-6).all() and (t >= 0).all()
    # splat footprint is a couple of pixels at image center → corners clean
    assert t[0, 0] == 1.0 and t[-1, -1] == 1.0
    assert t[12, 128] < 1.0  # center actually hit


@pytest.mark.slow
def test_overflow_recalibrates_and_matches_fast():
    """A camera zoom after calibration overflows the pair bucket; the
    wrapper must detect it, re-calibrate, and produce the same image as
    render_fast (regression: jnp.repeat used to truncate silently)."""
    from gsrt.models.gaussian_rt import GaussianRayTracer

    cloud, camera = random_cloud(150, seed=9, width=128, height=32)
    cfg = RenderConfig(width=128, height=32, conic_mode="standard",
                       payload="f32", blend_math="f32")
    # a stale calibration too small for this view (as after a camera zoom)
    rt = GaussianRayTracer(cfg, "tiled", max_pairs=128, interpret=True)
    out = rt(cloud, camera)
    assert rt.max_pairs > 128, "overflow must trigger re-calibration"
    assert not bool(out.overflow)
    ref = render_fast(cloud, camera, cfg)
    np.testing.assert_allclose(np.asarray(out.trans), np.asarray(ref.trans),
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                               rtol=1e-3, atol=4e-4)


def test_numpy_count_matches_jax():
    """Buffer sizing (pure-NumPy count) must track the jax pair count."""
    from gsrt.models.gaussian_rt import count_pairs, count_pairs_numpy
    cloud, camera = random_cloud(400, seed=8, width=256, height=64)
    cfg = RenderConfig(width=256, height=64, conic_mode="standard")
    a = int(count_pairs(cloud, camera, cfg))
    b = count_pairs_numpy(cloud, camera, cfg)
    # fp rounding at tile borders may move a handful of pairs
    assert abs(a - b) <= max(4, a // 1000), (a, b)


@pytest.mark.slow
def test_tiled_lut_mode_matches_fast_lut():
    """cfg.use_exp_lut=True runs the reference's 256-segment piecewise
    exp (ExpLUT.hpp:10-24) INSIDE the Pallas kernel; must match
    render_fast's LUT path (VERDICT round-1 item 10)."""
    cloud, camera = random_cloud(250, seed=7, width=64, height=48)
    cfg = RenderConfig(width=64, height=48, conic_mode="standard",
                       use_exp_lut=True, payload="f32", blend_math="f32")
    a = render_fast(cloud, camera, cfg)
    b = _render_tiled_interp(cloud, camera, cfg, max_pairs=1 << 13)
    np.testing.assert_allclose(np.asarray(a.trans), np.asarray(b.trans),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                               atol=5e-4)
    # and the LUT image must actually DIFFER from exact-exp (same scene)
    cfg2 = RenderConfig(width=64, height=48, conic_mode="standard",
                        use_exp_lut=False, payload="f32")
    c = _render_tiled_interp(cloud, camera, cfg2, max_pairs=1 << 13)
    assert float(np.abs(np.asarray(b.trans) - np.asarray(c.trans)).max()) \
        > 1e-5
