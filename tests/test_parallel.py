"""Multi-chip sharding tests on the 8-device CPU mesh (conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsrt.core.config import RenderConfig
from gsrt.models.gaussian_rt import render_fast
from gsrt.parallel import (
    calibrate_sharded,
    make_render_mesh,
    render_data_parallel,
    render_splat_sharded,
    tiled_render_fn,
)
from gsrt.parallel.tiles import shard_cloud_by_depth
from gsrt.scene.catalog import random_cloud


def test_device_count():
    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_data_parallel_matches_single():
    cloud, camera = random_cloud(200, seed=5, width=64, height=64)
    cfg = RenderConfig(width=64, height=64, conic_mode="standard")
    ref = render_fast(cloud, camera, cfg)
    mesh = make_render_mesh(n_tiles=8)
    trans, color = render_data_parallel(cloud, camera, cfg, mesh)
    np.testing.assert_allclose(np.asarray(trans), np.asarray(ref.trans),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(color), np.asarray(ref.color),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_splat_sharded_matches_single():
    cloud, camera = random_cloud(333, seed=6, width=64, height=32)
    cfg = RenderConfig(width=64, height=32, conic_mode="standard")
    ref = render_fast(cloud, camera, cfg)
    mesh = make_render_mesh(n_tiles=2, n_splats=4)
    sharded = shard_cloud_by_depth(cloud, camera, 4)
    trans, color = render_splat_sharded(sharded, camera, cfg, mesh)
    np.testing.assert_allclose(np.asarray(trans), np.asarray(ref.trans),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(color), np.asarray(ref.color),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_splat_sharded_white_background():
    """The white-background term must enter once with the TOTAL
    transmittance, not once per depth slab (regression: per-shard bg was
    summed over prefix transmittances, inflating brightness)."""
    cloud, camera = random_cloud(333, seed=6, width=64, height=32)
    cfg = RenderConfig(width=64, height=32, conic_mode="standard",
                       white_background=True)
    ref = render_fast(cloud, camera, cfg)
    mesh = make_render_mesh(n_tiles=2, n_splats=4)
    sharded = shard_cloud_by_depth(cloud, camera, 4)
    trans, color = render_splat_sharded(sharded, camera, cfg, mesh)
    np.testing.assert_allclose(np.asarray(color), np.asarray(ref.color),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_splat_sharded_butterfly_composite():
    """composite='butterfly' (log-depth ppermute exchange) must produce
    the same image as the all_gather composite and the single-chip
    reference."""
    cloud, camera = random_cloud(333, seed=6, width=64, height=32)
    cfg = RenderConfig(width=64, height=32, conic_mode="standard")
    ref = render_fast(cloud, camera, cfg)
    mesh = make_render_mesh(n_tiles=2, n_splats=4)
    sharded = shard_cloud_by_depth(cloud, camera, 4)
    tg, cg = render_splat_sharded(sharded, camera, cfg, mesh,
                                  composite="gather")
    tb, cb = render_splat_sharded(sharded, camera, cfg, mesh,
                                  composite="butterfly")
    # butterfly reorders the multiplication tree — fp-level differences
    # only
    np.testing.assert_allclose(np.asarray(tb), np.asarray(tg),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cb), np.asarray(cg),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tb), np.asarray(ref.trans),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cb), np.asarray(ref.color),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_data_parallel_tiled_production_path():
    """The PRODUCTION tiled renderer (binning + packed Pallas blend) under
    shard_map must match the single-device tiled render exactly: rect
    binning is conservative, so slab-local tile membership differences are
    invisible through the in-kernel alpha test (f32 payload = bit-parity
    tier)."""
    from gsrt.models.gaussian_rt import render_tiled

    cloud, camera = random_cloud(400, seed=8, width=64, height=128)
    cfg = RenderConfig(width=64, height=128, conic_mode="standard",
                       payload="f32", blend_math="f32")
    mp = calibrate_sharded(cloud, camera, cfg, n_tiles=8)
    ref = render_tiled(cloud, camera, cfg, max_pairs=mp, interpret=True)
    mesh = make_render_mesh(n_tiles=8)
    trans, color = render_data_parallel(
        cloud, camera, cfg, mesh,
        render_fn=tiled_render_fn(mp, interpret=True))
    np.testing.assert_allclose(np.asarray(trans), np.asarray(ref.trans),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(color), np.asarray(ref.color),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_splat_sharded_tiled_production_path():
    """Depth-slab splat sharding × row slabs over the production tiled
    renderer: the HBM-exceeding-scene mode runs the same kernel the bench
    does. Butterfly composite included."""
    from gsrt.models.gaussian_rt import render_tiled

    cloud, camera = random_cloud(400, seed=9, width=64, height=64)
    cfg = RenderConfig(width=64, height=64, conic_mode="standard",
                       payload="f32", blend_math="f32")
    mp_full = calibrate_sharded(cloud, camera, cfg, n_tiles=1)
    ref = render_tiled(cloud, camera, cfg, max_pairs=mp_full,
                       interpret=True)
    sharded = shard_cloud_by_depth(cloud, camera, 4)
    mp = calibrate_sharded(sharded, camera, cfg, n_tiles=2, n_splats=4)
    mesh = make_render_mesh(n_tiles=2, n_splats=4)
    for composite in ("gather", "butterfly"):
        trans, color = render_splat_sharded(
            sharded, camera, cfg, mesh, composite=composite,
            render_fn=tiled_render_fn(mp, interpret=True))
        np.testing.assert_allclose(np.asarray(trans), np.asarray(ref.trans),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(color), np.asarray(ref.color),
                                   rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_splat_sharded_full_splat_axis():
    cloud, camera = random_cloud(160, seed=7, width=64, height=8)
    cfg = RenderConfig(width=64, height=8, conic_mode="standard")
    ref = render_fast(cloud, camera, cfg)
    mesh = make_render_mesh(n_tiles=1, n_splats=8)
    sharded = shard_cloud_by_depth(cloud, camera, 8)
    trans, color = render_splat_sharded(sharded, camera, cfg, mesh)
    np.testing.assert_allclose(np.asarray(trans), np.asarray(ref.trans),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(color), np.asarray(ref.color),
                               rtol=1e-3, atol=1e-4)
