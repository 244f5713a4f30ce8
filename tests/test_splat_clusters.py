"""Cluster-filtered arbitrary-ray splat tracing vs the brute-force
k-buffer tracer. With no plan overflow the visited-cluster candidate set
contains every splat the brute-force valid test accepts (AABB radius
sqrt(2 G λmax) is conservative), so results must match to fp noise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsrt.core.config import RenderConfig
from gsrt.models.gaussian_rt import trace_gaussian_rays
from gsrt.ops.splat_clusters import (build_splat_clusters, plan_visits,
                                     trace_gaussian_rays_clustered)
from gsrt.scene.catalog import random_cloud


def _rays(n, seed, origin_scale=2.5):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n, 3)).astype(np.float32) * origin_scale
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_clustered_matches_bruteforce():
    cloud, _ = random_cloud(3000, seed=0, width=64, height=64)
    cfg = RenderConfig(width=64, height=64, conic_mode="standard", k=16)
    colors = jnp.abs(jnp.sin(cloud.means * 5.0))  # deterministic RGB
    orig, dirn = _rays(512, seed=1)
    t_ref, c_ref, h_ref = trace_gaussian_rays(cloud, orig, dirn, cfg,
                                              colors=colors)
    sc = build_splat_clusters(cloud, cfg, colors, k=64, sup=4)
    t, c, h, ovf = trace_gaussian_rays_clustered(
        sc, orig, dirn, cfg, rb=128, s_max=sc.clusters.sup_min.shape[0])
    assert not bool(ovf)
    np.testing.assert_array_equal(np.asarray(h), np.asarray(h_ref))
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref),
                               rtol=1e-4, atol=1e-5)


def test_clustered_culling_is_real():
    """Coherent ray blocks through a spread-out cloud must visit far fewer
    super-clusters than exist (the work-scaling claim)."""
    cloud, _ = random_cloud(20000, seed=2, width=64, height=64)
    cfg = RenderConfig(width=64, height=64, conic_mode="standard")
    colors = jnp.ones((cloud.n, 3)) * 0.5
    sc = build_splat_clusters(cloud, cfg, colors, k=64, sup=8)
    ms = sc.clusters.sup_min.shape[0]
    # a tight coherent bundle: one viewpoint, small direction cone
    rng = np.random.default_rng(3)
    o = jnp.broadcast_to(jnp.asarray([4.0, 0.0, 0.0]), (256, 3))
    d = np.tile([-1.0, 0.0, 0.0], (256, 1)) + 0.05 * rng.normal(size=(256, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                    jnp.float32)
    sup_ids, n_hit, ovf = plan_visits(
        sc, o, d, jnp.zeros(256), jnp.full((256,), 1e9), rb=256, s_max=ms)
    assert int(n_hit.max()) < ms * 0.6, (int(n_hit.max()), ms)


def test_clustered_overflow_flag():
    cloud, _ = random_cloud(3000, seed=0, width=64, height=64)
    cfg = RenderConfig(width=64, height=64, conic_mode="standard", k=8)
    colors = jnp.ones((cloud.n, 3)) * 0.5
    sc = build_splat_clusters(cloud, cfg, colors, k=32, sup=4)
    orig, dirn = _rays(128, seed=4)
    *_, ovf = trace_gaussian_rays_clustered(sc, orig, dirn, cfg,
                                            rb=128, s_max=1)
    assert bool(ovf)


def test_clustered_ragged_ray_count():
    """R not a multiple of rb: padding rays must not contaminate output."""
    cloud, _ = random_cloud(1000, seed=5, width=64, height=64)
    cfg = RenderConfig(width=64, height=64, conic_mode="standard", k=8)
    colors = jnp.ones((cloud.n, 3)) * 0.5
    sc = build_splat_clusters(cloud, cfg, colors, k=64, sup=4)
    orig, dirn = _rays(100, seed=6)
    t, c, h, ovf = trace_gaussian_rays_clustered(
        sc, orig, dirn, cfg, rb=64, s_max=sc.clusters.sup_min.shape[0])
    assert t.shape == (100,) and c.shape == (100, 3)
    t_ref, c_ref, _ = trace_gaussian_rays(cloud, orig, dirn, cfg,
                                          colors=colors)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_clustered_mixed_scene_parity():
    """The path tracer's bounce compositing must be identical whether the
    cloud is traced brute-force or through clusters (no plan overflow)."""
    from gsrt.core.config import RenderConfig
    from gsrt.models.path_tracer import render_path_traced
    from gsrt.ops.sh import eval_sh
    from tests.test_mixed_scene import _mirror_scene, _single_splat

    scene, cam = _mirror_scene()
    cfg = RenderConfig(width=24, height=24, samples=1, bounces=3,
                       has_sky=True, gamma_correction=False, k=8)
    cloud, _ = random_cloud(600, seed=9, width=24, height=24)
    a = np.asarray(render_path_traced(scene, cam, cfg, seed=0,
                                      gaussians=cloud))
    vdirs = cloud.means - cam.position[None, :]
    vdirs = vdirs / jnp.maximum(
        jnp.linalg.norm(vdirs, axis=-1, keepdims=True), 1e-9)
    colors = eval_sh(cloud.sh, vdirs, min(cfg.sh_degree, cloud.sh_degree))
    sc = build_splat_clusters(cloud, cfg, colors, k=64, sup=4)
    b = np.asarray(render_path_traced(
        scene, cam, cfg, seed=0, gauss_clusters=sc,
        gauss_s_max=sc.clusters.sup_min.shape[0], gauss_rb=64))
    # Morton-order vs chunk-order candidate merging breaks top_k ties
    # differently; after 3 bounces of attenuation that is ~1e-3-class
    # fp-order noise (measured max 6.5e-4), not a semantic difference
    np.testing.assert_allclose(b, a, rtol=5e-3, atol=1e-3)
