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


@pytest.mark.parametrize("chunk", [256, 384])
def test_packed_nondefault_pair_chunk(chunk):
    """The cw (pair_chunk) generalization of the kernel — cw-wide DMA,
    (cw, cw) segment matrix, roll scan depth — at non-default chunks
    (384 = the value the config cites as measured-best on the 128x8
    kernel, and a non-power-of-two multiple of 128)."""
    cloud, camera = random_cloud(200, seed=7, width=96, height=64)
    cfg = RenderConfig(width=96, height=64, conic_mode="standard",
                       tile_w=16, tile_h=16, blend_impl="packed",
                       payload="f32", blend_math="f32", pair_chunk=chunk)
    ref = RenderConfig(width=96, height=64, conic_mode="standard",
                       tile_w=16, tile_h=16, blend_impl="packed",
                       payload="f32", blend_math="f32")
    a = render_tiled(cloud, camera, ref, max_pairs=1 << 14, interpret=True)
    b = render_tiled(cloud, camera, cfg, max_pairs=1 << 14, interpret=True)
    np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("tw,th", [(16, 16), (32, 8)])
def test_packed_matches_fast(tw, th):
    cloud, camera = random_cloud(150, seed=3, width=96, height=48)
    # payload="f32": these assert the bit-parity tier (compact, the
    # default, is a documented ~4e-3 fast tier — test_compact_payload_*)
    cfg = RenderConfig(width=96, height=48, conic_mode="standard",
                       tile_w=tw, tile_h=th, blend_impl="packed",
                       payload="f32", blend_math="f32")
    _cmp(cloud, camera, cfg, max_pairs=1 << 14)


@pytest.mark.slow
def test_packed_matches_fast_lut():
    cloud, camera = random_cloud(120, seed=5, width=64, height=48)
    cfg = RenderConfig(width=64, height=48, conic_mode="standard",
                       tile_w=16, tile_h=16, blend_impl="packed",
                       use_exp_lut=True, payload="f32",
                       blend_math="f32")
    fast_cfg = cfg  # render_fast honors use_exp_lut too
    a = render_fast(cloud, camera, fast_cfg)
    b = render_tiled(cloud, camera, cfg, max_pairs=1 << 14, interpret=True)
    np.testing.assert_allclose(np.asarray(a.trans), np.asarray(b.trans),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_packed_vs_subtile_many_small_segments():
    """Dense tiny subtiles -> single chunks hold many segments, groups have
    empty subtiles and misaligned starts. The packed and subtile kernels
    share the binning, so any segment-bookkeeping bug shows as a diff far
    above f32/log-exp noise."""
    cloud, camera = random_cloud(250, seed=11, width=80, height=80)
    base = RenderConfig(width=80, height=80, conic_mode="standard",
                        tile_w=16, tile_h=8, payload="f32",
                        blend_math="f32")
    b = render_tiled(cloud, camera, base.replace(blend_impl="packed"),
                     max_pairs=1 << 14, interpret=True)
    c = render_tiled(cloud, camera, base.replace(blend_impl="subtile"),
                     max_pairs=1 << 14, interpret=True)
    np.testing.assert_allclose(np.asarray(b.trans), np.asarray(c.trans),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.color), np.asarray(c.color),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
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

@pytest.mark.slow
@pytest.mark.parametrize("expand_impl", ["xla", "pallas"])
def test_compact_payload_matches_f32(expand_impl):
    """The compact (int32-packed) payload is a documented fast tier:
    tile-relative u16 fixed-point means (1/32 px) + bf16 Cholesky factors
    bound the alpha error at ~1e-2 worst / 1e-3 typical (tile_binning.py
    layout comment). Checked against the f32-payload packed kernel AND
    against render_fast on a dense multi-tile scene."""
    cloud, camera = random_cloud(400, seed=7, width=128, height=96)
    base = RenderConfig(width=128, height=96, conic_mode="standard",
                        tile_w=16, tile_h=8, blend_impl="packed",
                        expand_impl=expand_impl)
    f = render_tiled(cloud, camera, base, max_pairs=1 << 15, interpret=True)
    c = render_tiled(cloud, camera, base.replace(payload="compact"),
                     max_pairs=1 << 15, interpret=True)
    cf, ff = np.asarray(c.color), np.asarray(f.color)
    assert np.abs(cf - ff).max() < 2e-2
    assert np.abs(np.asarray(c.trans) - np.asarray(f.trans)).max() < 2e-2
    # typical error must be ~1e-3-class, not just bounded
    assert np.abs(cf - ff).mean() < 2e-3
    a = render_fast(cloud, camera, base)
    assert np.abs(cf - np.asarray(a.color)).max() < 2e-2


@pytest.mark.slow
@pytest.mark.parametrize("payload", ["f32", "compact"])
def test_bf16_math_tier(payload):
    """blend_math="bf16" is a documented ~1e-2-class fast tier: the EWA/
    alpha elementwise math runs in bfloat16 (splat_packed math_dtype).
    Interpret mode exercises the bf16 elementwise path (the MXU dots stay
    exact-f32 under interpret — see the kernel docstring), so this bounds
    the bf16 EWA error against the f32-math tier and render_fast."""
    cloud, camera = random_cloud(400, seed=7, width=128, height=96)
    base = RenderConfig(width=128, height=96, conic_mode="standard",
                        tile_w=16, tile_h=8, blend_impl="packed",
                        payload=payload)
    f = render_tiled(cloud, camera, base, max_pairs=1 << 15, interpret=True)
    h = render_tiled(cloud, camera, base.replace(blend_math="bf16"),
                     max_pairs=1 << 15, interpret=True)
    hf, ff = np.asarray(h.color), np.asarray(f.color)
    # bf16's 8-bit mantissa puts ~0.4-1.6% relative error on alpha (worst
    # at the g≈5.6 cutoff tail); measured max ≈ 2.9e-2, typical ~1e-4
    assert np.abs(hf - ff).max() < 4e-2
    assert np.abs(np.asarray(h.trans) - np.asarray(f.trans)).max() < 4e-2
    assert np.abs(hf - ff).mean() < 2e-3
    a = render_fast(cloud, camera, base)
    assert np.abs(hf - np.asarray(a.color)).max() < 5e-2


def test_compact_payload_serving_depth_carry():
    """carry_depth (serving mode) must survive the compact payload: the
    pair depth rides the low bf16 half of the qcd word."""
    import jax.numpy as jnp
    from gsrt.models.gaussian_rt import fm_from_cloud, _precompute_fm
    from gsrt.ops.gaussian import screen_extents_abc
    from gsrt.ops.tile_binning import build_tile_binning
    cloud, camera = random_cloud(100, seed=2, width=64, height=32)
    cfg = RenderConfig(width=64, height=32, conic_mode="standard",
                       tile_w=16, tile_h=8)
    fm = fm_from_cloud(cloud)
    depth, m2x, m2y, qa, qb, qc, in_front, cr, cg, cb = _precompute_fm(
        fm, camera, cfg)
    rx, ry = screen_extents_abc(qa, qb, qc, cfg.conic_mode, cfg.g_cutoff,
                                opacity=fm.opacity,
                                alpha_threshold=cfg.alpha_threshold)
    alive = in_front & (fm.opacity > cfg.alpha_threshold)
    kw = dict(width=64, height=32, tile_w=16, tile_h=8, chunk=cfg.pair_chunk,
              max_pairs=1 << 13, expand_impl="xla", carry_depth=True)
    args = (depth, m2x, m2y, qa, qb, qc, fm.opacity, cr, cg, cb, rx, ry,
            alive)
    bf = build_tile_binning(*args, **kw)
    bc = build_tile_binning(*args, compact=True, **kw)
    n = int(bf.total_pairs)
    df = np.asarray(bf.pair_depth)[:n]
    dc = np.asarray(bc.pair_depth)[:n]
    assert int(bc.total_pairs) == n
    # bf16 depth: ~3 decimal digits
    np.testing.assert_allclose(dc, df, rtol=8e-3, atol=1e-3)


def test_pack_rgba8_roundtrip():
    """rgba8888 payload word (tile_binning layout): colors decode two-tier
    (err ≤ 1/254 on [0,1], ≤ 3/254 on (1,4]), opacity u8 (err ≤ 1/510
    + rounding), and out-of-range inputs saturate instead of wrapping."""
    import jax.numpy as jnp
    from gsrt.ops.tile_binning import (COLOR8_COARSE, COLOR8_FINE,
                                       PACK_RANGE, pack_rgba8)

    rng = np.random.default_rng(3)
    c = rng.uniform(0.0, PACK_RANGE, size=(4, 4096)).astype(np.float32)
    c[3] = rng.uniform(0.0, 1.0, size=4096)          # opacity ∈ [0, 1]
    w = np.asarray(pack_rgba8(*(jnp.asarray(ch) for ch in c)))

    def dec_color(c8):
        mag = (c8 & 0x7F).astype(np.float32)
        return np.where((c8 & 0x80) != 0, 1.0 + mag * COLOR8_COARSE,
                        mag * COLOR8_FINE)

    for i, shift in enumerate((24, 16, 8)):
        got = dec_color((w >> shift) & 0xFF)
        err = np.abs(got - np.minimum(c[i], PACK_RANGE))
        fine = c[i] <= 1.0
        assert err[fine].max() <= 1 / 254 + 1e-6
        assert err[~fine].max() <= 3 / 254 + 1e-6
    op = (w & 0xFF).astype(np.float32) / 255.0
    assert np.abs(op - c[3]).max() <= 1 / 510 + 1e-6
    # saturation: channels above PACK_RANGE clamp to the tier tops
    w_hot = int(np.asarray(pack_rgba8(jnp.float32(9.0), jnp.float32(-1.0),
                                      jnp.float32(2.0), jnp.float32(1.5))))
    assert (w_hot >> 24) & 0xFF == 0xFF      # 9.0 → PACK_RANGE
    assert (w_hot >> 16) & 0xFF == 0x00      # -1  → 0
    assert w_hot & 0xFF == 0xFF              # 1.5 → opacity 1


def test_exact_hits_map():
    """cfg.exact_hits: the packed kernel's per-pixel accepted-splat count
    must equal an independent brute-force count (every splat whose alpha
    at the pixel clears the threshold) on a scene with no saturation —
    the exact rt_avg_nodes_per_ray analogue on the perf path."""
    import jax.numpy as jnp
    from gsrt.ops.gaussian import project_gaussians

    cloud, camera = random_cloud(120, seed=7, width=64, height=48)
    # scale opacity down so no subtile saturates (term_eps skip never
    # fires and the count is total accepted, comparable to brute force)
    cloud = cloud._replace(opacity=cloud.opacity * 0.2)
    cfg = RenderConfig(width=64, height=48, conic_mode="standard",
                       tile_w=16, tile_h=16, blend_impl="packed",
                       payload="f32", blend_math="f32", exact_hits=True)
    out = render_tiled(cloud, camera, cfg, max_pairs=1 << 14,
                       interpret=True)

    # brute force: alpha at every (pixel, splat); quad already carries the
    # conic (a, b, c) with g = 0.5 (a dx^2 + 2b dx dy + c dy^2)
    depth, mean2, quad, det2, in_front = project_gaussians(
        cloud.means, cloud.cov3d, camera, conic_mode=cfg.conic_mode,
        cov2d_dilation=cfg.cov2d_dilation)
    qa, qb, qc = quad[:, 0], quad[:, 1], quad[:, 2]
    xs, ys = jnp.meshgrid(jnp.arange(64.0), jnp.arange(48.0))
    dx = xs[..., None] - mean2[:, 0]
    dy = ys[..., None] - mean2[:, 1]
    g = 0.5 * (qa * dx * dx + 2 * qb * dx * dy + qc * dy * dy)
    alpha = jnp.where(in_front & (g <= cfg.g_cutoff),
                      jnp.minimum(cloud.opacity * jnp.exp(-g), 0.99), 0.0)
    ref = jnp.sum(alpha > cfg.alpha_threshold, axis=-1)
    np.testing.assert_array_equal(np.asarray(out.hits), np.asarray(ref))
