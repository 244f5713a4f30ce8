"""Texture mip pyramid tests (gsrt.ops.mip) — the getTexture txl
capability (vulkan_ray_tracing.cc:1992-2334) rebuilt for the atlas."""

import jax.numpy as jnp
import numpy as np
import pytest

from gsrt.ops.mip import (MipAtlas, _level_origin, build_mip_atlas,
                          ray_cone_lod, sample_texture_lod,
                          triangle_texel_density)


def _checker(res=32, period=2):
    y, x = np.mgrid[:res, :res]
    c = ((x // period + y // period) % 2).astype(np.float32)
    return np.stack([c, c, c], -1)[None]            # [1, res, res, 3]


def test_level_origins_disjoint_and_in_bounds():
    th = tw = 32
    mip = build_mip_atlas(np.zeros((1, th, tw, 3), np.float32))
    cells = set()
    for l in range(mip.n_levels):
        x0, y0, w, h = _level_origin(th, tw, l)
        assert w == tw >> l and h == th >> l and w >= 1 and h >= 1
        assert x0 + w <= tw + tw // 2 and y0 + h <= th
        for yy in range(y0, y0 + h):
            for xx in range(x0, x0 + w):
                assert (yy, xx) not in cells, f"level {l} overlaps"
                cells.add((yy, xx))


def test_pyramid_is_average_pooling():
    img = np.random.default_rng(0).random((2, 16, 16, 3)).astype(np.float32)
    mip = build_mip_atlas(img)
    lvl = img
    for l in range(mip.n_levels):
        x0, y0, w, h = _level_origin(16, 16, l)
        got = np.asarray(mip.data[:, y0:y0 + h, x0:x0 + w])
        np.testing.assert_allclose(got, lvl, atol=1e-6)
        if l + 1 < mip.n_levels:
            lvl = lvl.reshape(2, h // 2, 2, w // 2, 2, 3).mean(axis=(2, 4))
    # top level = global mean
    np.testing.assert_allclose(lvl[:, 0, 0], img.mean(axis=(1, 2)),
                               atol=1e-6)


def test_lod0_matches_bilinear_sampler():
    from gsrt.models.path_tracer import sample_texture
    img = np.random.default_rng(1).random((3, 16, 16, 3)).astype(np.float32)
    mip = build_mip_atlas(img)
    rng = np.random.default_rng(2)
    uv = jnp.asarray(rng.random((64, 2)), jnp.float32)
    tid = jnp.asarray(rng.integers(-1, 3, 64), jnp.int32)
    a = sample_texture(jnp.asarray(img), tid, uv)
    b = sample_texture_lod(mip, tid, uv, jnp.zeros((64,)))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_high_lod_converges_to_mean():
    img = _checker()
    mip = build_mip_atlas(img)
    uv = jnp.asarray(np.random.default_rng(3).random((32, 2)), jnp.float32)
    tid = jnp.zeros((32,), jnp.int32)
    out = sample_texture_lod(mip, tid, uv, jnp.full((32,), 99.0))
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)


def test_trilinear_blends_adjacent_levels():
    img = _checker(res=16)
    mip = build_mip_atlas(img)
    uv = jnp.asarray([[0.31, 0.57]], jnp.float32)
    tid = jnp.zeros((1,), jnp.int32)
    a = sample_texture_lod(mip, tid, uv, jnp.asarray([1.0]))
    b = sample_texture_lod(mip, tid, uv, jnp.asarray([2.0]))
    m = sample_texture_lod(mip, tid, uv, jnp.asarray([1.5]))
    np.testing.assert_allclose(np.asarray(m),
                               0.5 * (np.asarray(a) + np.asarray(b)),
                               atol=1e-6)


def test_alpha_atlas_supported():
    a = np.random.default_rng(4).random((2, 8, 8)).astype(np.float32)
    mip = build_mip_atlas(a)
    assert mip.data.ndim == 3
    out = sample_texture_lod(mip, jnp.zeros((4,), jnp.int32),
                             jnp.asarray(np.random.default_rng(5)
                                         .random((4, 2)), jnp.float32),
                             jnp.zeros((4,)))
    assert out.shape == (4,)
    assert np.isfinite(np.asarray(out)).all()


def test_texel_density_and_cone_lod():
    # a 1x1-world-unit quad mapped to the full texture at res 256:
    # density = 256 texels per world unit
    v0 = jnp.asarray([[0.0, 0.0, 0.0]])
    v1 = jnp.asarray([[1.0, 0.0, 0.0]])
    v2 = jnp.asarray([[0.0, 1.0, 0.0]])
    uv0 = jnp.asarray([[0.0, 0.0]])
    uv1 = jnp.asarray([[1.0, 0.0]])
    uv2 = jnp.asarray([[0.0, 1.0]])
    d = triangle_texel_density(v0, v1, v2, uv0, uv1, uv2, 256)
    np.testing.assert_allclose(np.asarray(d), [256.0], rtol=1e-6)
    # cone: at the distance where footprint covers 2 texels, lod = 1
    angle = 1.0 / 500.0
    t_hit = jnp.asarray([2.0 / (angle * 256.0)])
    lod = ray_cone_lod(t_hit, angle, d)
    np.testing.assert_allclose(np.asarray(lod), [1.0], atol=1e-6)
    # closer than one texel per pixel -> lod 0, monotone in t
    assert float(ray_cone_lod(jnp.asarray([1e-3]), angle, d)[0]) == 0.0
    l2 = ray_cone_lod(2 * t_hit, angle, d)
    assert float(l2[0]) > 1.0


@pytest.mark.slow
def test_path_tracer_mips_end_to_end():
    """with_texture_mips + a textured scene through render_path_traced:
    finite image; distant checker converges toward the mean (anti-
    aliased) while the level-0 path keeps full contrast."""
    import jax
    from gsrt.core.config import RenderConfig
    from gsrt.core.types import make_camera, look_at
    from gsrt.models.path_tracer import (PrimitiveScene, render_path_traced,
                                         with_texture_mips)
    from gsrt.core.types import Materials

    # a small textured floor quad (two triangles) with a dense checker
    # mapped across full [0,1] UVs, viewed from far enough that each
    # pixel covers many texels (minification regime)
    ext = 2.0
    v = np.array([[-ext, 0, -ext], [ext, 0, -ext], [ext, 0, ext],
                  [-ext, 0, ext]], np.float32)
    uvq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    tri = ([0, 0], [1, 2], [2, 3])
    z = np.zeros((0,), np.float32)
    z3 = np.zeros((0, 3), np.float32)
    mats = Materials(model=jnp.asarray([0], jnp.int32),
                     diffuse=jnp.asarray([[1.0, 1.0, 1.0]]),
                     fuzziness=jnp.asarray([0.0]),
                     refraction_index=jnp.asarray([1.0]),
                     texture_id=jnp.asarray([0], jnp.int32))
    scene = PrimitiveScene(
        sph_center=jnp.asarray(z3), sph_radius=jnp.asarray(z),
        sph_mat=jnp.asarray(z, jnp.int32),
        box_min=jnp.asarray(z3), box_max=jnp.asarray(z3),
        box_mat=jnp.asarray(z, jnp.int32),
        tri_v0=jnp.asarray(v[tri[0]]), tri_v1=jnp.asarray(v[tri[1]]),
        tri_v2=jnp.asarray(v[tri[2]]),
        tri_mat=jnp.asarray([0, 0], jnp.int32),
        materials=mats,
        textures=jnp.asarray(_checker(res=64, period=1)),
        tri_uv0=jnp.asarray(uvq[tri[0]]),
        tri_uv1=jnp.asarray(uvq[tri[1]]),
        tri_uv2=jnp.asarray(uvq[tri[2]]))
    cam = make_camera(look_at((0.0, 3.0, -12.0), (0.0, 0.0, 0.0)),
                      30.0, 32, 24)
    cfg = RenderConfig(width=32, height=24, samples=1, bounces=2,
                       has_sky=True, gamma_correction=False)
    img0 = np.asarray(render_path_traced(scene, cam, cfg))
    smip = with_texture_mips(scene)
    assert smip.tex_mips is not None and smip.mat_texel is not None
    img1 = np.asarray(render_path_traced(smip, cam, cfg))
    assert np.isfinite(img1).all()
    assert img0.shape == img1.shape
    # the mip image must differ (minified region smoothed)...
    assert np.abs(img1 - img0).max() > 1e-3
    # ...by REDUCING contrast: per-row variance shrinks where minified
    row_var0 = img0.var(axis=(1, 2))
    row_var1 = img1.var(axis=(1, 2))
    assert row_var1.mean() < row_var0.mean()