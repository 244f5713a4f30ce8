"""Binned primary-ray triangle casting vs brute-force Möller–Trumbore.

The binning is conservative (projected-AABB rects, near-plane crossers go
full-screen), so every pixel's true nearest triangle is in its tile's
candidate list and the kernel's min-fold must reproduce the brute-force
closest hit exactly (same MT arithmetic, f32 payload)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsrt.core.types import look_at, make_camera
from gsrt.ops.primitives import ray_triangle
from gsrt.ops.tri_binning import (_ID_SENTINEL, build_tri_binning,
                                  cast_primary)


def _soup(n, seed, spread=2.0, size=0.6):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    a = c + rng.normal(0, size, (n, 3)).astype(np.float32)
    b = c + rng.normal(0, size, (n, 3)).astype(np.float32)
    return jnp.asarray(c), jnp.asarray(a), jnp.asarray(b)


def _center_dirs(camera):
    H, W = camera.height, camera.width
    ys, xs = jnp.mgrid[0:H, 0:W]
    dx = (xs.reshape(-1) + 0.5 - camera.cx) / camera.fx
    dy = (ys.reshape(-1) + 0.5 - camera.cy) / camera.fy
    d = jnp.stack([dx, dy, jnp.ones_like(dx)], -1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    c2w = jnp.linalg.inv(camera.view)
    return (c2w[:3, :3] @ d.T).T


def _brute(v0, v1, v2, orig, dirs, t_min=1e-3, t_max=1e4):
    t, _, _ = ray_triangle(jnp.broadcast_to(orig, dirs.shape), dirs,
                           v0, v1, v2, t_min, t_max)
    ti = jnp.min(t, axis=-1)
    ii = jnp.argmin(t, axis=-1).astype(jnp.int32)
    return ti, jnp.where(jnp.isfinite(ti), ii, _ID_SENTINEL)


@pytest.mark.parametrize("n,seed", [(300, 0), (80, 3)])
def test_cast_matches_brute(n, seed):
    v0, v1, v2 = _soup(n, seed)
    camera = make_camera(look_at((0, 0, -6.0), (0, 0, 0.0)), 50.0, 64, 48)
    dirs = _center_dirs(camera)
    orig = camera.position
    binning = build_tri_binning(v0, v1, v2, camera, tile_w=16, tile_h=8,
                                max_pairs=1 << 14, jitter_pad=0.0)
    assert not bool(binning.overflow)
    t, tid = cast_primary(binning, dirs, orig, width=64, height=48,
                          tile_w=16, tile_h=8, interpret=True)
    t_ref, id_ref = _brute(v0, v1, v2, orig, dirs)
    t_ref = np.asarray(t_ref).reshape(48, 64)
    id_ref = np.asarray(id_ref).reshape(48, 64)
    t, tid = np.asarray(t), np.asarray(tid)
    hit_ref = np.isfinite(t_ref)
    hit = t < 3e38
    np.testing.assert_array_equal(hit, hit_ref)
    np.testing.assert_allclose(t[hit], t_ref[hit_ref], rtol=1e-5, atol=1e-5)
    # ids can only differ where two triangles tie in t exactly
    diff = hit & (tid != id_ref)
    assert diff.sum() == 0 or np.allclose(
        t[diff], t_ref[diff], rtol=1e-5)


def test_near_plane_crosser_covered():
    """A triangle crossing the near plane must still be hittable (it gets
    the conservative full-screen rect)."""
    v0 = jnp.asarray([[0.0, -1.0, -1.0]])   # behind camera start
    v1 = jnp.asarray([[0.0, 1.0, 4.0]])
    v2 = jnp.asarray([[1.5, 0.0, 4.0]])
    camera = make_camera(look_at((0, 0, -2.0), (0.2, 0, 1.0)), 60.0, 32, 32)
    dirs = _center_dirs(camera)
    orig = camera.position
    binning = build_tri_binning(v0, v1, v2, camera, tile_w=16, tile_h=8,
                                max_pairs=1 << 12)
    t, tid = cast_primary(binning, dirs, orig, width=32, height=32,
                          tile_w=16, tile_h=8, interpret=True)
    t_ref, _ = _brute(v0, v1, v2, orig, dirs)
    t_ref = np.asarray(t_ref).reshape(32, 32)
    hit_ref = np.isfinite(t_ref)
    assert hit_ref.any()
    t = np.asarray(t)
    np.testing.assert_array_equal(t < 3e38, hit_ref)
    np.testing.assert_allclose(t[hit_ref], t_ref[hit_ref], rtol=1e-5)


def test_overflow_flag():
    v0, v1, v2 = _soup(500, 1)
    camera = make_camera(look_at((0, 0, -6.0), (0, 0, 0.0)), 50.0, 64, 48)
    binning = build_tri_binning(v0, v1, v2, camera, tile_w=16, tile_h=8,
                                max_pairs=64)
    assert bool(binning.overflow)


def test_path_tracer_binned_primary_parity():
    """Full path trace with primary_impl='binned' must match the default
    traversal path (same jitter, same MT arithmetic; only bounce-0's
    triangle closest-hit machinery differs)."""
    from gsrt.core.config import RenderConfig
    from gsrt.models.path_tracer import render_path_traced
    from gsrt.scene.primitives_catalog import _SceneBuilder

    b = _SceneBuilder()
    b.quad((-3, -2, 2), (3, -2, 2), (3, 2, 2), (-3, 2, 2),
           b.lambertian((0.8, 0.3, 0.3)))
    b.quad((-5, -2.2, 6), (5, -2.2, 6), (5, -2.2, -2), (-5, -2.2, -2),
           b.metallic((0.9, 0.9, 0.9), 0.1))
    scene = b.build()
    camera = make_camera(look_at((0, 0, -4.0), (0, 0, 1.0)), 55.0, 48, 32)
    cfg = RenderConfig(width=48, height=32, samples=2, bounces=3,
                       has_sky=True, gamma_correction=False,
                       tile_w=16, tile_h=8)
    base = np.asarray(render_path_traced(scene, camera, cfg, seed=0))
    binned = np.asarray(render_path_traced(
        scene, camera, cfg, seed=0, primary_impl="binned",
        tri_max_pairs=1 << 12, interpret=True))
    np.testing.assert_allclose(binned, base, rtol=1e-4, atol=1e-4)


def test_count_tri_pairs_numpy_matches_device():
    from gsrt.ops.tri_binning import count_tri_pairs_numpy
    v0, v1, v2 = _soup(250, 4)
    camera = make_camera(look_at((0, 0, -6.0), (0, 0, 0.0)), 50.0, 64, 48)
    b = build_tri_binning(v0, v1, v2, camera, tile_w=16, tile_h=8,
                          max_pairs=1 << 14)
    n_np = count_tri_pairs_numpy(v0, v1, v2, camera, tile_w=16, tile_h=8)
    # f64-vs-f32 rounding can flip the odd floor at a tile boundary
    assert abs(n_np - int(b.total_pairs)) <= max(4, n_np // 100)


@pytest.mark.slow
def test_binned_primary_on_reference_scene():
    """Real reference OBJ data (Blender splash scene subset): the binned
    primary cast must agree with the production traversal path on actual
    mesh geometry — many small triangles, real camera."""
    from gsrt.core.config import RenderConfig
    from gsrt.models.path_tracer import _closest_hit, with_tri_table
    from gsrt.models.path_tracer import generate_camera_rays
    from gsrt.ops.tri_binning import (build_tri_binning, cast_primary,
                                     count_tri_pairs_numpy)
    from gsrt.scene.reference_scenes import (REFERENCE_SCENES,
                                             reference_data_available)
    if not reference_data_available():
        pytest.skip("reference Scenes/ data not present")
    scene, camera, _ = REFERENCE_SCENES["blender_2_77"](64, 48, max_files=2)
    if scene.tri_v0.shape[0] < 8:
        pytest.skip("subset too small")
    import jax
    orig, dirn = generate_camera_rays(jax.random.PRNGKey(0), camera,
                                      RenderConfig(width=64, height=48))
    need = count_tri_pairs_numpy(scene.tri_v0, scene.tri_v1, scene.tri_v2,
                                 camera, tile_w=16, tile_h=8)
    binning = build_tri_binning(scene.tri_v0, scene.tri_v1, scene.tri_v2,
                               camera, tile_w=16, tile_h=8,
                               max_pairs=int(need * 1.2) + 256)
    assert not bool(binning.overflow)
    t_bin, id_bin = cast_primary(binning, dirn, camera.position,
                                 width=64, height=48, tile_w=16, tile_h=8,
                                 interpret=True)
    # production traversal comparison (tri_table path or brute)
    scene_t = with_tri_table(scene)
    t_ref, n, m, hit, uv, _ = _closest_hit(scene_t, orig, dirn, 1e-3, 1e4)
    t_ref = np.asarray(t_ref).reshape(48, 64)
    hit = np.asarray(hit).reshape(48, 64)
    t_bin = np.asarray(t_bin)
    np.testing.assert_array_equal(t_bin < 3e38, hit)
    np.testing.assert_allclose(t_bin[hit], t_ref[hit], rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_binned_primary_with_gaussians():
    """primary_impl='binned' composes with mixed splat+mesh scenes (the
    splat compositing is orthogonal to bounce-0's triangle machinery)."""
    from gsrt.core.config import RenderConfig
    from gsrt.models.path_tracer import render_path_traced
    from gsrt.scene.primitives_catalog import _SceneBuilder
    from gsrt.scene.catalog import random_cloud

    b = _SceneBuilder()
    b.quad((-3, -2, 3), (3, -2, 3), (3, 2, 3), (-3, 2, 3),
           b.lambertian((0.3, 0.5, 0.8)))
    scene = b.build()
    camera = make_camera(look_at((0, 0, -4.0), (0, 0, 1.0)), 55.0, 32, 32)
    cloud, _ = random_cloud(300, seed=11, width=32, height=32)
    cfg = RenderConfig(width=32, height=32, samples=1, bounces=2,
                       has_sky=True, gamma_correction=False, k=8,
                       tile_w=16, tile_h=8)
    a = np.asarray(render_path_traced(scene, camera, cfg, seed=0,
                                      gaussians=cloud))
    c = np.asarray(render_path_traced(scene, camera, cfg, seed=0,
                                      gaussians=cloud,
                                      primary_impl="binned",
                                      tri_max_pairs=1 << 10,
                                      interpret=True))
    np.testing.assert_allclose(c, a, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_exact_spans_subset_and_parity():
    """span_exact: fewer pairs (scanline clip vs AABB rect), identical
    cast result (skipped tiles contain no covered sample)."""
    # large random triangles -> strong diagonal-AABB waste
    v0, v1, v2 = _soup(120, 7, spread=2.0, size=2.5)
    camera = make_camera(look_at((0, 0, -7.0), (0, 0, 0.0)), 55.0, 64, 48)
    dirs = _center_dirs(camera)
    orig = camera.position
    br = build_tri_binning(v0, v1, v2, camera, tile_w=16, tile_h=8,
                           max_pairs=1 << 14, jitter_pad=0.0)
    be = build_tri_binning(v0, v1, v2, camera, tile_w=16, tile_h=8,
                           max_pairs=1 << 14, jitter_pad=0.0,
                           span_exact=True)
    pr, pe = int(br.total_pairs), int(be.total_pairs)
    assert 0 < pe < pr, (pe, pr)
    assert int(np.asarray(be.tile_count).sum()) == pe
    assert (np.asarray(be.tile_count) <= np.asarray(br.tile_count)).all()
    tr_, ir_ = cast_primary(br, dirs, orig, width=64, height=48,
                            tile_w=16, tile_h=8, interpret=True)
    te_, ie_ = cast_primary(be, dirs, orig, width=64, height=48,
                            tile_w=16, tile_h=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(te_), np.asarray(tr_))
    np.testing.assert_array_equal(np.asarray(ie_), np.asarray(ir_))


def test_exact_spans_row_overflow():
    v0, v1, v2 = _soup(200, 8, size=1.5)
    camera = make_camera(look_at((0, 0, -6.0), (0, 0, 0.0)), 50.0, 64, 48)
    b = build_tri_binning(v0, v1, v2, camera, tile_w=16, tile_h=8,
                          max_pairs=1 << 14, span_exact=True, max_rows=32)
    assert bool(b.overflow)


def test_count_exact_matches_device():
    from gsrt.ops.tri_binning import count_tri_pairs_numpy
    v0, v1, v2 = _soup(150, 9, size=1.8)
    camera = make_camera(look_at((0, 0, -6.0), (0, 0, 0.0)), 50.0, 64, 48)
    b = build_tri_binning(v0, v1, v2, camera, tile_w=16, tile_h=8,
                          max_pairs=1 << 14, span_exact=True)
    n_np = count_tri_pairs_numpy(v0, v1, v2, camera, tile_w=16, tile_h=8,
                                 span_exact=True)
    assert abs(n_np - int(b.total_pairs)) <= max(8, n_np // 50)
