"""Group-contiguous pair stream (tile_binning._build_group_stream):
parity against the tile-sorted stream, unit bookkeeping, and gating.

The group stream deletes the pair-level tile sort: pairs are only
contiguous per kernel group (k full tile rows) and depth-ordered per
tile, which the packed kernel's one-hot routing + logmm scan +
order-independent chunk totals handle. The image must match the
tile-sorted stream to float-reassociation tolerance (same pairs, same
per-tile order, different chunk grouping/summation order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsrt.core.config import RenderConfig
from gsrt.models.gaussian_rt import render_tiled
from gsrt.ops.tile_binning import group_rows_k
from gsrt.scene.catalog import random_cloud


def _cfg(stream, **kw):
    base = dict(width=256, height=256, conic_mode="standard",
                tile_w=16, tile_h=16, payload="compact",
                scan_impl="logmm", blend_math="f32", stream=stream)
    base.update(kw)
    return RenderConfig(**base)


def test_group_rows_k():
    assert group_rows_k(16) == 8          # 128 lanes, %8
    assert group_rows_k(60) == 2          # 120: the 1080p/32px case
    assert group_rows_k(120) == 1
    assert group_rows_k(127) is None      # no multiple of 8 fits
    assert group_rows_k(50) is None


@pytest.mark.parametrize("seed,n", [(0, 3000), (3, 800)])
def test_group_stream_matches_tile_stream(seed, n):
    cloud, camera = random_cloud(n, seed=seed, width=256, height=256)
    mp = 1 << 16
    out_t = render_tiled(cloud, camera, cfg=_cfg("tile"), max_pairs=mp,
                         interpret=True)
    out_g = render_tiled(cloud, camera, cfg=_cfg("group"), max_pairs=mp,
                         max_rows=1 << 14, interpret=True)
    assert not bool(out_g.overflow)
    # same pairs, same per-tile depth order; only chunk grouping (and so
    # float reassociation in the scan/total updates) differs
    np.testing.assert_allclose(np.asarray(out_g.color),
                               np.asarray(out_t.color), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_g.trans),
                               np.asarray(out_t.trans), atol=2e-3)


def test_group_stream_vs_reference_renderer():
    # absolute grounding, not just A/B: the brute-force per-pixel
    # renderer is the semantics oracle for the tiled paths
    from gsrt.models.gaussian_rt import render_fast
    cloud, camera = random_cloud(1200, seed=1, width=256, height=256)
    cfg = _cfg("group")
    out_g = render_tiled(cloud, camera, cfg=cfg, max_pairs=1 << 16,
                         max_rows=1 << 13, interpret=True)
    ref = render_fast(cloud, camera, cfg=cfg)
    # compact payload quantization dominates (documented ~1e-2 bound)
    np.testing.assert_allclose(np.asarray(out_g.color),
                               np.asarray(ref.color), atol=2e-2)


def test_group_stream_unit_overflow_flag():
    cloud, camera = random_cloud(3000, seed=0, width=256, height=256)
    out = render_tiled(cloud, camera, cfg=_cfg("group"),
                       max_pairs=1 << 16, max_rows=256,  # far too small
                       interpret=True)
    assert bool(out.overflow)


def test_group_stream_gating_falls_back():
    # span_mode="ellipse" is incompatible -> must fall back to the tile
    # stream and still render correctly
    cloud, camera = random_cloud(500, seed=2, width=256, height=256)
    cfg = _cfg("group", span_mode="ellipse")
    out = render_tiled(cloud, camera, cfg=cfg, max_pairs=1 << 16,
                       max_rows=1 << 14, interpret=True)
    cfg_t = _cfg("tile", span_mode="ellipse")
    ref = render_tiled(cloud, camera, cfg=cfg_t, max_pairs=1 << 16,
                       max_rows=1 << 14, interpret=True)
    np.testing.assert_allclose(np.asarray(out.color),
                               np.asarray(ref.color), atol=1e-5)


def test_group_stream_tracer_calibration():
    from gsrt.models.gaussian_rt import GaussianRayTracer
    cloud, camera = random_cloud(1500, seed=0, width=256, height=256)
    tr = GaussianRayTracer(_cfg("group"), "tiled", interpret=True)
    tr.calibrate(cloud, camera)
    assert tr.max_rows is not None        # unit buffer got sized
    out = tr(cloud, camera)
    assert not bool(out.overflow)
    assert np.isfinite(np.asarray(out.color)).all()
