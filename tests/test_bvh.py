"""LBVH build + traversal tests, validated against brute force."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsrt.ops.bvh import LBVH, build_lbvh, bvh_traverse
from gsrt.ops.primitives import ray_sphere


def _random_spheres(n, seed=0, extent=10.0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    radii = rng.uniform(0.1, 0.8, n).astype(np.float32)
    return jnp.asarray(centers), jnp.asarray(radii)


def _sphere_leaf_fn(centers, radii):
    def leaf_fn(prim, o, d, t_min, best_t, payload):
        t = ray_sphere(o[None], d[None], centers[prim:prim][...],
                       radii[prim:prim], t_min, best_t)  # placeholder
        return best_t, payload
    return leaf_fn


def test_build_structure_valid():
    centers, radii = _random_spheres(256, seed=1)
    bvh = build_lbvh(centers - radii[:, None], centers + radii[:, None])
    n = 256
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    lleaf = np.asarray(bvh.left_leaf)
    rleaf = np.asarray(bvh.right_leaf)
    # every leaf and every internal node except root referenced exactly once
    leaf_refs = np.zeros(n, int)
    node_refs = np.zeros(n - 1, int)
    for c, is_leaf in [(left, lleaf), (right, rleaf)]:
        for v, fl in zip(c, is_leaf):
            if fl:
                leaf_refs[v] += 1
            else:
                node_refs[v] += 1
    assert (leaf_refs == 1).all(), "each leaf referenced exactly once"
    assert node_refs[0] == 0, "root unreferenced"
    assert (node_refs[1:] == 1).all(), "each internal node referenced once"


def test_node_aabbs_contain_children():
    centers, radii = _random_spheres(200, seed=2)
    bvh = build_lbvh(centers - radii[:, None], centers + radii[:, None])
    nmin = np.asarray(bvh.node_min)
    nmax = np.asarray(bvh.node_max)
    lmin = np.asarray(bvh.leaf_min)
    lmax = np.asarray(bvh.leaf_max)
    left, right = np.asarray(bvh.left), np.asarray(bvh.right)
    lleaf, rleaf = np.asarray(bvh.left_leaf), np.asarray(bvh.right_leaf)
    eps = 1e-5
    for node in range(len(left)):
        for c, fl in [(left[node], lleaf[node]), (right[node], rleaf[node])]:
            cmin = lmin[c] if fl else nmin[c]
            cmax = lmax[c] if fl else nmax[c]
            assert (nmin[node] <= cmin + eps).all(), (node, c, fl)
            assert (nmax[node] >= cmax - eps).all(), (node, c, fl)


def test_traversal_matches_brute_force():
    centers, radii = _random_spheres(128, seed=3)
    bvh = build_lbvh(centers - radii[:, None], centers + radii[:, None])

    rng = np.random.default_rng(4)
    R = 64
    orig = jnp.asarray(rng.uniform(-15, 15, (R, 3)).astype(np.float32))
    dirn = rng.normal(size=(R, 3)).astype(np.float32)
    dirn /= np.linalg.norm(dirn, axis=-1, keepdims=True)
    dirn = jnp.asarray(dirn)

    def leaf_fn(prim, o, d, t_min, best_t, payload):
        t = ray_sphere(o[None], d[None], centers[prim][None],
                       radii[prim][None], t_min, best_t)[0, 0]
        closer = t < best_t
        return jnp.where(closer, t, best_t), jnp.where(closer, prim, payload)

    best_t, prim_id, visited = bvh_traverse(
        bvh, orig, dirn, 1e-3, 1e4, leaf_fn, jnp.int32(-1))

    # brute force
    t_all = ray_sphere(orig, dirn, centers, radii, 1e-3, 1e4)
    bf_t = np.asarray(jnp.min(t_all, axis=-1))
    got_t = np.asarray(best_t)
    got_t = np.where(got_t >= 1e4, np.inf, got_t)  # miss = t_max
    np.testing.assert_allclose(got_t, bf_t, rtol=1e-5, atol=1e-5)

    # traversal must prune: far fewer nodes than 2N
    assert float(np.asarray(visited).mean()) < 2 * 128


def test_traversal_prunes():
    """A tight ray through a corner of a big scene should visit O(log N)
    nodes, not O(N)."""
    centers, radii = _random_spheres(1024, seed=5, extent=50.0)
    bvh = build_lbvh(centers - radii[:, None], centers + radii[:, None])
    orig = jnp.asarray([[100.0, 100.0, 100.0]])
    dirn = jnp.asarray([[1.0, 0.0, 0.0]])   # pointing away from everything

    def leaf_fn(prim, o, d, t_min, best_t, payload):
        return best_t, payload

    _, _, visited = bvh_traverse(bvh, orig, dirn, 1e-3, 1e4, leaf_fn, 0)
    assert int(visited[0]) <= 3  # root test fails immediately
