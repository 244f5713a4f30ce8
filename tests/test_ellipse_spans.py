"""Ellipse-exact per-tile-row spans (span_mode='ellipse') vs the rect path.

The ellipse span rule must (a) generate a SUBSET of the rect pairs, (b)
keep per-tile counts exactly consistent with the expanded pair stream, and
(c) render the IDENTICAL image — a bbox tile the ellipse skips contains no
pixel whose alpha clears the threshold, so the blend cannot see the
difference (tile_binning._build_ellipse docstring).
"""

import numpy as np
import pytest

from gsrt.core.config import RenderConfig
from gsrt.models.gaussian_rt import (GaussianRayTracer, count_pairs_numpy,
                                     count_rows_pairs_numpy, fm_from_cloud,
                                     render_tiled, _precompute_fm)
from gsrt.ops.gaussian import screen_extents_abc
from gsrt.ops.tile_binning import build_tile_binning
from gsrt.scene.catalog import random_cloud


def _binning_inputs(cloud, camera, cfg):
    fm = fm_from_cloud(cloud)
    depth, m2x, m2y, qa, qb, qc, in_front, cr, cg, cb = _precompute_fm(
        fm, camera, cfg)
    rx, ry = screen_extents_abc(qa, qb, qc, cfg.conic_mode, cfg.g_cutoff,
                                opacity=fm.opacity,
                                alpha_threshold=cfg.alpha_threshold)
    alive = in_front & (fm.opacity > cfg.alpha_threshold)
    return (depth, m2x, m2y, qa, qb, qc, fm.opacity, cr, cg, cb, rx, ry,
            alive)


def test_ellipse_pairs_subset_and_consistent():
    # the tier's one FAST regression (ellipse measured slower end-to-end on
    # TPU — ROADMAP.md dead-ends — so it is opt-in; everything heavier in
    # this module is @slow and runs in the full merge gate)
    cloud, camera = random_cloud(1000, seed=0, width=160, height=120,
                                 scale_range=(0.01, 0.08))
    cfg = RenderConfig(width=160, height=120, conic_mode="standard",
                       tile_w=16, tile_h=16)
    args = _binning_inputs(cloud, camera, cfg)
    kw = dict(width=160, height=120, tile_w=16, tile_h=16, chunk=256,
              max_pairs=1 << 16, g_cutoff=cfg.g_cutoff,
              alpha_threshold=cfg.alpha_threshold)
    br = build_tile_binning(*args, **kw)
    be = build_tile_binning(*args, span_mode="ellipse", **kw)
    pr, pe = int(br.total_pairs), int(be.total_pairs)
    assert 0 < pe <= pr
    assert pe < pr  # large splats => some bbox corner gets trimmed
    # per-tile counts match the pair stream (tile_start built from counts)
    assert int(np.asarray(be.tile_count).sum()) == pe
    # ellipse never emits MORE pairs for any tile than rect
    assert (np.asarray(be.tile_count) <= np.asarray(br.tile_count)).all()
    # host-side sizing counter mirrors the device path (f64 vs f32 rounding
    # may flip the odd floor() at a tile boundary; sizing carries 10% slack
    # + the overflow re-render guard)
    pairs_np, rows_np = count_rows_pairs_numpy(cloud, camera, cfg)
    assert abs(pairs_np - pe) <= max(8, pe // 100)
    assert rows_np > 0
    assert count_pairs_numpy(cloud, camera, cfg) == pr


@pytest.mark.slow
@pytest.mark.parametrize("payload", ["f32", "compact"])
@pytest.mark.parametrize("expand_impl", ["xla", "pallas"])
def test_ellipse_render_parity(payload, expand_impl):
    cloud, camera = random_cloud(500, seed=7, width=128, height=96,
                                 scale_range=(0.01, 0.1))
    base = RenderConfig(width=128, height=96, conic_mode="standard",
                        tile_w=16, tile_h=8, blend_impl="packed",
                        payload=payload, expand_impl=expand_impl)
    r = render_tiled(cloud, camera, base, max_pairs=1 << 15, interpret=True)
    e = render_tiled(cloud, camera, base.replace(span_mode="ellipse"),
                     max_pairs=1 << 15, interpret=True)
    # identical pair semantics -> only fp-order noise
    np.testing.assert_allclose(np.asarray(e.color), np.asarray(r.color),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(e.trans), np.asarray(r.trans),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.slow
def test_ellipse_row_overflow_flag():
    cloud, camera = random_cloud(2000, seed=1, width=256, height=192,
                                 scale_range=(0.01, 0.08))
    cfg = RenderConfig(width=256, height=192, conic_mode="standard",
                       tile_w=16, tile_h=16)
    args = _binning_inputs(cloud, camera, cfg)
    kw = dict(width=256, height=192, tile_w=16, tile_h=16, chunk=256,
              max_pairs=1 << 16, g_cutoff=cfg.g_cutoff,
              alpha_threshold=cfg.alpha_threshold)
    ok = build_tile_binning(*args, span_mode="ellipse", **kw)
    assert not bool(ok.overflow)
    tiny = build_tile_binning(*args, span_mode="ellipse", max_rows=128, **kw)
    assert bool(tiny.overflow)


@pytest.mark.slow
def test_ellipse_tracer_calibrates_rows():
    cloud, camera = random_cloud(800, seed=3, width=160, height=128,
                                 scale_range=(0.01, 0.08))
    cfg = RenderConfig(width=160, height=128, conic_mode="standard",
                       tile_w=16, tile_h=16, blend_impl="packed",
                       span_mode="ellipse")
    tr = GaussianRayTracer(cfg, "tiled", interpret=True)
    out = tr(cloud, camera)
    assert tr.max_rows is not None and tr.max_rows < tr.max_pairs * 2
    rt = GaussianRayTracer(cfg.replace(span_mode="rect"), "tiled",
                           interpret=True)
    ref = rt(cloud, camera)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                               atol=2e-5, rtol=1e-5)
    assert tr.max_pairs <= rt.max_pairs
