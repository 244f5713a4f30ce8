"""Native C++ runtime library tests (builds via make on first use)."""

import numpy as np
import pytest

from gsrt import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _random_aabbs(n, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    r = rng.uniform(0.1, 0.5, (n, 1)).astype(np.float32)
    return c - r, c + r


def test_native_lbvh_structure():
    amin, amax = _random_aabbs(500, seed=1)
    out = native.build_lbvh_native(amin, amax)
    assert out is not None
    n = 500
    leaf_refs = np.zeros(n, int)
    node_refs = np.zeros(n - 1, int)
    for c, fl in [(out["left"], out["left_leaf"]),
                  (out["right"], out["right_leaf"])]:
        for v, is_leaf in zip(c, fl):
            (leaf_refs if is_leaf else node_refs)[v] += 1
    assert (leaf_refs == 1).all()
    assert node_refs[0] == 0 and (node_refs[1:] == 1).all()
    # leaf_prim is a permutation
    assert sorted(out["leaf_prim"].tolist()) == list(range(n))


def test_native_lbvh_aabbs_contain_children():
    amin, amax = _random_aabbs(300, seed=2)
    out = native.build_lbvh_native(amin, amax)
    eps = 1e-5
    for node in range(299):
        for c, fl in [(out["left"][node], out["left_leaf"][node]),
                      (out["right"][node], out["right_leaf"][node])]:
            cmin = out["leaf_min"][c] if fl else out["node_min"][c]
            cmax = out["leaf_max"][c] if fl else out["node_max"][c]
            assert (out["node_min"][node] <= cmin + eps).all()
            assert (out["node_max"][node] >= cmax - eps).all()
    # root covers the scene
    np.testing.assert_allclose(out["node_min"][0], amin.min(0), atol=1e-5)
    np.testing.assert_allclose(out["node_max"][0], amax.max(0), atol=1e-5)


def test_native_lbvh_traversal_equivalence():
    """Traversing the native-built tree finds the same nearest hits as the
    JAX-built tree."""
    import jax.numpy as jnp
    from gsrt.ops.bvh import LBVH, build_lbvh, bvh_traverse
    from gsrt.ops.primitives import ray_sphere

    rng = np.random.default_rng(3)
    n = 200
    centers = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    radii = rng.uniform(0.1, 0.6, n).astype(np.float32)
    amin = centers - radii[:, None]
    amax = centers + radii[:, None]

    out = native.build_lbvh_native(amin, amax)
    bvh_nat = LBVH(
        left=jnp.asarray(out["left"]), right=jnp.asarray(out["right"]),
        left_leaf=jnp.asarray(out["left_leaf"]),
        right_leaf=jnp.asarray(out["right_leaf"]),
        node_min=jnp.asarray(out["node_min"]),
        node_max=jnp.asarray(out["node_max"]),
        leaf_prim=jnp.asarray(out["leaf_prim"]),
        leaf_min=jnp.asarray(out["leaf_min"]),
        leaf_max=jnp.asarray(out["leaf_max"]))

    R = 32
    orig = jnp.asarray(rng.uniform(-15, 15, (R, 3)).astype(np.float32))
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dirn = jnp.asarray(d)
    cj = jnp.asarray(centers)
    rj = jnp.asarray(radii)

    def leaf_fn(prim, o, dd, t_min, best_t, payload):
        t = ray_sphere(o[None], dd[None], cj[prim][None], rj[prim][None],
                       t_min, best_t)[0, 0]
        return jnp.minimum(t, best_t), payload

    t_nat, _, _ = bvh_traverse(bvh_nat, orig, dirn, 1e-3, 1e4, leaf_fn, 0)
    t_all = ray_sphere(orig, dirn, cj, rj, 1e-3, 1e4)
    bf = np.minimum(np.asarray(jnp.min(t_all, -1)), 1e4)
    np.testing.assert_allclose(np.minimum(np.asarray(t_nat), 1e4), bf,
                               rtol=1e-5, atol=1e-5)


def test_native_ply_parse_matches_python():
    """Native PLY row decode == the NumPy loader."""
    import tempfile, os
    from gsrt.scene.ply import save_gaussian_ply, load_gaussian_ply
    rng = np.random.default_rng(4)
    n = 64
    means = rng.normal(size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = rng.uniform(0.01, 1, (n, 3)).astype(np.float32)
    op = rng.uniform(0.1, 0.9, n).astype(np.float32)
    sh = rng.normal(size=(n, 16, 3)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.ply")
        save_gaussian_ply(path, means, quats, scales, op, sh)
        cloud = load_gaussian_ply(path)          # python path
        cloud_n = load_gaussian_ply(path)        # loader auto-uses native
    np.testing.assert_allclose(np.asarray(cloud.means),
                               np.asarray(cloud_n.means))
