"""Temporal-reuse serving loop (gsrt.serving) — CPU interpret mode.

Covers the serving path's unique risks:
  * serving=True must not change frame-1 images (extra sort operand,
    consumed tracking are passive);
  * the conservative supertile cull keeps a superset of the exact
    per-tile rect test;
  * a static camera converges: later frames cull pairs yet match the
    exact image within the saturation tolerance;
  * self-correction: an over-aggressive cutoff map triggers violations
    and resets to +inf (and strict mode serves the exact frame).
"""

import numpy as np
import pytest

from gsrt.core.config import RenderConfig
from gsrt.models.gaussian_rt import render_tiled
from gsrt.scene.campath import dolly_path, orbit_path
from gsrt.scene.catalog import random_cloud
from gsrt.serving import ServingRenderer
from gsrt.ops.tile_binning import SUPER, cutoff_cull

W, H = 96, 64
MP = 1 << 16


def _cfg(**kw):
    # serving_super=2: the test image is only 6x4 tiles, so the default
    # 8x8-tile supertile would span the whole frame and any unsaturated
    # edge tile would veto the entire cull.
    # stream="tile" + pair_chunk=128: serving itself forces this tier
    # (render_tiled gates the group stream off and clamps the kernel
    # chunk for saturation-position granularity) — pinning it here keeps
    # the serving-vs-plain comparisons config-matched, so they test the
    # serving FLAG's passivity rather than the tier switch
    return RenderConfig(width=W, height=H, conic_mode="standard",
                        tile_w=16, tile_h=16, blend_impl="packed",
                        serving_super=2, stream="tile", pair_chunk=128,
                        **kw)


def _dense_cloud(n=1500, seed=7):
    # big overlapping splats so EVERY tile saturates with culled-tail
    # headroom: the test image is smaller than one 8x8-tile supertile, so
    # the conservative cull only engages once all tiles have finite
    # cutoffs (supertile max = max over the whole image)
    return random_cloud(n, seed=seed, width=W, height=H,
                        scale_range=(0.3, 0.7))


@pytest.mark.slow
def test_serving_flag_is_passive_on_frame_one():
    cloud, camera = _dense_cloud()
    cfg = _cfg()
    a = render_tiled(cloud, camera, cfg, max_pairs=MP, interpret=True)
    b, aux = render_tiled(cloud, camera, cfg, max_pairs=MP, interpret=True,
                          cutoff_map=None, serving=True)
    np.testing.assert_allclose(np.asarray(a.trans), np.asarray(b.trans),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                               atol=1e-6)
    assert aux.pair_depth.shape == (MP,)
    # depths within each tile segment are non-decreasing (front-to-back)
    ts = np.asarray(aux.tile_start)
    pd = np.asarray(aux.pair_depth)
    for t in range(len(ts) - 1):
        seg = pd[ts[t]:ts[t + 1]]
        assert (np.diff(seg) >= -1e-6).all()


def test_cutoff_cull_conservative_vs_exact():
    rng = np.random.default_rng(0)
    ntx, nty = 13, 9
    N = 400
    x0 = rng.integers(0, ntx, N).astype(np.int32)
    x1 = np.minimum(x0 + rng.integers(0, 5, N), ntx - 1).astype(np.int32)
    y0 = rng.integers(0, nty, N).astype(np.int32)
    y1 = np.minimum(y0 + rng.integers(0, 5, N), nty - 1).astype(np.int32)
    depth = rng.uniform(0, 10, N).astype(np.float32)
    cmap = rng.uniform(0, 10, (nty, ntx)).astype(np.float32)
    cmap[rng.random((nty, ntx)) < 0.3] = np.inf

    keep = np.asarray(cutoff_cull(depth, x0, x1, y0, y1,
                                  cmap.reshape(-1), ntx, nty))
    for s in range(N):
        exact = depth[s] <= cmap[y0[s]:y1[s] + 1, x0[s]:x1[s] + 1].max()
        big = (x1[s] // SUPER - x0[s] // SUPER > 1) or \
              (y1[s] // SUPER - y0[s] // SUPER > 1)
        if exact or big:
            assert keep[s], f"conservative cull dropped needed splat {s}"


@pytest.mark.slow
def test_static_camera_converges_with_cull():
    cloud, camera = _dense_cloud()
    cfg = _cfg()
    exact = render_tiled(cloud, camera, cfg, max_pairs=MP, interpret=True)
    srv = ServingRenderer(cfg, max_pairs=MP, interpret=True,
                          pipeline_depth=1)
    outs = [srv(cloud, camera) for _ in range(3)]
    srv.finish()
    s = srv.stats
    assert s[0]["violations"] == 0
    # the dense center must saturate and cull pairs on later frames
    assert s[2]["pairs"] < s[0]["pairs"], s
    for out in outs:
        np.testing.assert_allclose(np.asarray(out.trans),
                                   np.asarray(exact.trans), atol=3e-3)
        np.testing.assert_allclose(np.asarray(out.color),
                                   np.asarray(exact.color), atol=3e-3)
    # under a static camera there must be no violations at all
    assert all(f["violations"] == 0 for f in s), s


@pytest.mark.slow
def test_over_aggressive_cutoff_self_corrects():
    cloud, camera = _dense_cloud()
    cfg = _cfg()
    exact = render_tiled(cloud, camera, cfg, max_pairs=MP, interpret=True)
    srv = ServingRenderer(cfg, max_pairs=MP, interpret=True,
                          pipeline_depth=1)
    srv(cloud, camera)  # initialize state shapes
    T = srv.cutoff_map.shape[0]
    import jax.numpy as jnp
    srv.cutoff_map = jnp.full((T,), 1e-3, jnp.float32)  # cull ~everything
    srv._use_cull = True     # bypass the lagged cull-enable heuristic
    srv(cloud, camera)
    srv.finish()
    assert srv.stats[-1]["violations"] > 0
    # violated tiles reset to +inf -> next frame is exact again
    out = srv(cloud, camera)
    np.testing.assert_allclose(np.asarray(out.trans),
                               np.asarray(exact.trans), atol=3e-3)
    np.testing.assert_allclose(np.asarray(out.color),
                               np.asarray(exact.color), atol=3e-3)


def test_strict_mode_serves_exact_frames():
    cloud, camera = _dense_cloud()
    cfg = _cfg()
    exact = render_tiled(cloud, camera, cfg, max_pairs=MP, interpret=True)
    srv = ServingRenderer(cfg, max_pairs=MP, strict=True, interpret=True)
    srv(cloud, camera)
    import jax.numpy as jnp
    srv.cutoff_map = jnp.full_like(srv.cutoff_map, 1e-3)
    srv._use_cull = True     # bypass the lagged cull-enable heuristic
    out = srv(cloud, camera)  # degraded frame -> strict re-render
    srv.finish()
    assert srv.stats[-1]["full_renders"] >= 1
    np.testing.assert_allclose(np.asarray(out.trans),
                               np.asarray(exact.trans), atol=3e-3)


def test_camera_paths():
    cams = orbit_path((0, 0, 0), radius=5.0, n_frames=8, width=64,
                      height_px=48)
    assert len(cams) == 8
    for c in cams:
        assert np.allclose(np.linalg.norm(np.asarray(c.position)), 5.0,
                           atol=1e-4)
    cams = dolly_path((0, 0, -5), (0, 0, -2), (0, 0, 0), 5, width=64,
                      height_px=48)
    p0 = np.asarray(cams[0].position)
    p1 = np.asarray(cams[-1].position)
    assert np.allclose(p0, (0, 0, -5), atol=1e-5)
    assert np.allclose(p1, (0, 0, -2), atol=1e-5)


@pytest.mark.slow
def test_serving_with_ellipse_and_compact():
    """Serving (carry_depth + cutoff cull) composes with the ellipse-span
    and compact-payload tiers: frame-1 parity and a working cull frame."""
    cloud, camera = _dense_cloud()
    for tier in (dict(span_mode="ellipse"),
                 dict(payload="compact"),
                 dict(span_mode="ellipse", payload="compact")):
        cfg = _cfg(**tier)
        base = render_tiled(cloud, camera, _cfg(), max_pairs=MP,
                            interpret=True)
        out, aux = render_tiled(cloud, camera, cfg, max_pairs=MP,
                                interpret=True, cutoff_map=None,
                                serving=True)
        # ellipse drops below-threshold pairs -> scan order shifts;
        # ~1e-5-class fp noise at ~300 blended splats/pixel
        tol = 2e-2 if tier.get("payload") == "compact" else 1e-4
        np.testing.assert_allclose(np.asarray(out.color),
                                   np.asarray(base.color),
                                   rtol=tol, atol=tol)
        assert aux.pair_depth is not None
        # second frame with the computed cutoff map must stay finite
        from gsrt.serving import update_cutoff_map
        import jax.numpy as jnp
        ntx, nty = -(-W // 16), -(-H // 16)
        cm0 = jnp.full((ntx * nty,), jnp.inf)
        cm, _ = update_cutoff_map(aux, out.trans, cm0, width=W, height=H,
                                  tile_w=16, tile_h=16, bs=cfg.blend_bs)
        out2, _ = render_tiled(cloud, camera, cfg, max_pairs=MP,
                               interpret=True, cutoff_map=cm,
                               serving=True)
        assert np.isfinite(np.asarray(out2.color)).all()
