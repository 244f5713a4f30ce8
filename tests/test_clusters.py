"""Cluster acceleration structure (gsrt.ops.clusters) — correctness vs
brute force, and integration with the path tracer's _closest_hit.

Reference role: the 2-level BVH traversal
(vulkan_ray_tracing.cc:422-1171); here a Morton-clustered 2-level wide
tree scanned per ray bundle."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gsrt.ops.clusters import (build_clusters, build_tri_clusters,
                               closest_hit_tri_clusters)
from gsrt.ops.primitives import ray_triangle


def _random_tris(n, seed=0, spread=10.0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.5, (n, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.5, (n, 3)).astype(np.float32)
    return (jnp.asarray(c), jnp.asarray(c + e1), jnp.asarray(c + e2))


def _random_rays(r, seed=1, spread=10.0):
    rng = np.random.default_rng(seed)
    orig = rng.uniform(-spread * 2, spread * 2, (r, 3)).astype(np.float32)
    d = rng.normal(0, 1, (r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(orig), jnp.asarray(d)


def test_cluster_aabbs_cover_members():
    v0, v1, v2 = _random_tris(500, seed=2)
    bmin = jnp.minimum(jnp.minimum(v0, v1), v2)
    bmax = jnp.maximum(jnp.maximum(v0, v1), v2)
    cl, order = build_clusters(bmin, bmax, k=64, sup=8)
    m, k = cl.m, cl.k
    gmin = bmin[order].reshape(m, k, 3)
    gmax = bmax[order].reshape(m, k, 3)
    valid = np.asarray(cl.valid)
    for c in range(m):
        if valid[c].any():
            assert bool(jnp.all(gmin[c][valid[c]] >= cl.cl_min[c] - 1e-6))
            assert bool(jnp.all(gmax[c][valid[c]] <= cl.cl_max[c] + 1e-6))
    # super-cluster AABBs cover their clusters
    sup = cl.sup
    assert bool(jnp.all(cl.sup_min <= cl.cl_min.reshape(-1, sup, 3).min(1)
                        + 1e-6))
    assert bool(jnp.all(cl.sup_max >= cl.cl_max.reshape(-1, sup, 3).max(1)
                        - 1e-6))
    # every source primitive appears exactly once among valid slots
    ids = np.asarray(order).reshape(m, k)[valid]
    assert sorted(ids.tolist()) == list(range(500))


def test_closest_hit_matches_bruteforce():
    v0, v1, v2 = _random_tris(700, seed=3)
    mat = jnp.arange(700, dtype=jnp.int32) % 5
    tc = build_tri_clusters(v0, v1, v2, mat, k=64, sup=8)
    orig, dirn = _random_rays(256, seed=4)

    t, bc, bk, hit, aabb_n, leaf_n = jax.jit(
        lambda o, d: closest_hit_tri_clusters(tc, o, d, 1e-3, 1e4))(
            orig, dirn)

    tb, _, _ = ray_triangle(orig, dirn, v0, v1, v2, 1e-3, 1e4)
    t_ref = jnp.min(tb, axis=-1)
    hit_ref = jnp.isfinite(t_ref)
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(hit_ref))
    np.testing.assert_allclose(
        np.where(np.asarray(hit), np.asarray(t), 0.0),
        np.where(np.asarray(hit_ref), np.asarray(t_ref), 0.0),
        rtol=1e-5, atol=1e-5)
    # material lookup through (cluster, slot) matches the winning triangle
    got_mat = np.asarray(tc.mat)[np.asarray(bc), np.asarray(bk)]
    i_ref = np.asarray(jnp.argmin(tb, axis=-1))
    mask = np.asarray(hit)
    np.testing.assert_array_equal(got_mat[mask],
                                  np.asarray(mat)[i_ref][mask])


def test_work_skipping_for_coherent_bundle():
    """A tight bundle aimed at one corner of the scene should test far
    fewer clusters than the scene holds (the rt_avg_nodes_per_ray idea)."""
    v0, v1, v2 = _random_tris(2000, seed=5, spread=50.0)
    mat = jnp.zeros(2000, jnp.int32)
    tc = build_tri_clusters(v0, v1, v2, mat, k=64, sup=8)
    orig = jnp.broadcast_to(jnp.asarray([200.0, 0, 0]), (64, 3))
    dirn = jnp.broadcast_to(jnp.asarray([-1.0, 0, 0]), (64, 3))
    _, _, _, _, aabb_n, leaf_n = closest_hit_tri_clusters(
        tc, orig, dirn, 1e-3, 1e4)
    total_leaf_work = 64 * tc.clusters.m
    assert int(leaf_n) < total_leaf_work // 2


@pytest.mark.slow
def test_path_tracer_integration():
    """render_path_traced with clusters attached matches without."""
    from gsrt.core.config import RenderConfig
    from gsrt.models.path_tracer import (render_path_traced,
                                         with_tri_clusters)
    from gsrt.scene.primitives_catalog import cornell_box

    scene, cam, opts = cornell_box(width=32, height=32)
    cfg = RenderConfig(width=32, height=32, samples=2, bounces=3,
                       has_sky=False)
    base = render_path_traced(scene, cam, cfg, seed=0)
    accel = with_tri_clusters(scene, k=4, sup=2)
    assert accel.tri_clusters is not None
    fast = render_path_traced(accel, cam, cfg, seed=0)
    np.testing.assert_allclose(np.asarray(base), np.asarray(fast),
                               atol=2e-3)
