"""Packed triangle traversal kernel (gsrt.ops.tri_kernel) — the TPU
production closest-hit path (S1 equivalent; interpret mode on CPU).

Covers: exact parity with the brute-force Möller-Trumbore sweep, per-ray
t bounds, conservative visit planning (no false negatives by
construction; effectiveness checked on a spread scene), and end-to-end
path-tracer integration via with_tri_table."""

import numpy as np
import pytest
import jax.numpy as jnp

from gsrt.ops.primitives import ray_triangle
from gsrt.ops.tri_kernel import build_tri_table, closest_hit_packed


def _soup(n, spread, tri_size, seed):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    v0 = jnp.asarray(base)
    v1 = jnp.asarray(base + rng.uniform(-tri_size, tri_size,
                                        (n, 3)).astype(np.float32))
    v2 = jnp.asarray(base + rng.uniform(-tri_size, tri_size,
                                        (n, 3)).astype(np.float32))
    return v0, v1, v2


@pytest.mark.slow
def test_tri_kernel_matches_bruteforce():
    v0, v1, v2 = _soup(700, 1.0, 0.1, 0)
    tt = build_tri_table(v0, v1, v2, jnp.zeros((700,), jnp.int32))
    rng = np.random.default_rng(1)
    R = 300
    orig = jnp.asarray(np.float32([[0, 0, -3]]) +
                       rng.uniform(-0.2, 0.2, (R, 3)).astype(np.float32))
    d = (np.float32([[0, 0, 1]]) +
         rng.uniform(-0.4, 0.4, (R, 3)).astype(np.float32))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirn = jnp.asarray(d)
    t_k, slot, hit, plan = closest_hit_packed(
        tt, orig, dirn, 1e-3, 1e4, rb=128, interpret=True)
    t_all, _, _ = ray_triangle(orig, dirn, v0, v1, v2, 1e-3, 1e4)
    t_ref = np.asarray(jnp.min(t_all, axis=-1))
    hit_ref = np.isfinite(t_ref)
    assert (np.asarray(hit) == hit_ref).all()
    np.testing.assert_allclose(np.asarray(t_k)[hit_ref], t_ref[hit_ref],
                               rtol=1e-5, atol=1e-6)
    # winning triangle (ties may differ but Morton order is deterministic)
    tri_id = np.asarray(tt.order)[np.asarray(slot)]
    i_ref = np.asarray(jnp.argmin(t_all, axis=-1))
    assert (tri_id[hit_ref] == i_ref[hit_ref]).mean() > 0.95


def test_tri_kernel_per_ray_t_bounds():
    v0, v1, v2 = _soup(300, 2.0, 0.2, 2)
    tt = build_tri_table(v0, v1, v2, jnp.zeros((300,), jnp.int32))
    rng = np.random.default_rng(3)
    R = 128
    orig = jnp.asarray(np.tile(np.float32([[0, 0, -6]]), (R, 1)))
    d = (np.float32([[0, 0, 1]]) +
         rng.uniform(-0.3, 0.3, (R, 3)).astype(np.float32))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirn = jnp.asarray(d)
    tmax = jnp.asarray(rng.uniform(3.0, 9.0, R).astype(np.float32))
    t_k, _, hit, _ = closest_hit_packed(
        tt, orig, dirn, 1e-3, tmax, rb=128, interpret=True)
    t_all, _, _ = ray_triangle(orig, dirn, v0, v1, v2, 1e-3, tmax[:, None])
    t_ref = np.asarray(jnp.min(t_all, axis=-1))
    hit_ref = np.isfinite(t_ref)
    assert (np.asarray(hit) == hit_ref).all()
    np.testing.assert_allclose(np.asarray(t_k)[hit_ref], t_ref[hit_ref],
                               rtol=1e-5, atol=1e-6)


def test_tri_kernel_visit_culling():
    """Coherent narrow bundles through a spread scene must visit far fewer
    super-clusters than dense (the rt_avg_nodes_per_ray analogue)."""
    n = 96 * 1024                                  # 96 super-clusters
    v0, v1, v2 = _soup(n, 25.0, 0.2, 4)
    tt = build_tri_table(v0, v1, v2, jnp.zeros((n,), jnp.int32))
    ms = tt.sup_min.shape[0]
    assert ms >= 16
    R = 128
    orig = jnp.asarray(np.tile(np.float32([[0, 0, -60]]), (R, 1)))
    ang = np.linspace(-0.01, 0.01, R).astype(np.float32)
    dirn = jnp.asarray(
        np.stack([ang, np.zeros(R, np.float32), np.ones(R, np.float32)], -1))
    _, _, _, plan = closest_hit_packed(
        tt, orig, dirn, 1e-3, 1e4, rb=128, interpret=True)
    # 1 block x ms possible; a pencil beam through a 50-unit-wide scene
    # must cull well over half the super-clusters
    assert int(plan.total) < ms // 2


def _layered_quads(layers, per_side, z0=0.0, dz=1.0, size=4.0):
    """`layers` parallel z-planes, each tiled with per_side² quads
    (2 tris each) — a scene where front-to-back early exit must trigger
    for rays marching down +z."""
    tris = []
    step = size / per_side
    for li in range(layers):
        z = z0 + li * dz
        for iy in range(per_side):
            for ix in range(per_side):
                x0, y0 = -size / 2 + ix * step, -size / 2 + iy * step
                x1, y1 = x0 + step, y0 + step
                tris.append(([x0, y0, z], [x1, y0, z], [x0, y1, z]))
                tris.append(([x1, y1, z], [x0, y1, z], [x1, y0, z]))
    a = np.float32(tris)
    return jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]), jnp.asarray(a[:, 2])


def test_tri_kernel_front_to_back_early_exit():
    """Closest hit through 24 stacked occluding layers: results must match
    brute force, and the ordered walk must stop after the first layers —
    visiting far fewer prim tests than the flat sweep would."""
    v0, v1, v2 = _layered_quads(layers=24, per_side=16)
    n = v0.shape[0]
    tt = build_tri_table(v0, v1, v2, jnp.zeros((n,), jnp.int32))
    rng = np.random.default_rng(7)
    R = 128
    o = np.float32([[0, 0, -5]]) + rng.uniform(-0.5, 0.5, (R, 3))
    d = np.float32([[0, 0, 1]]) + rng.uniform(-0.05, 0.05, (R, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    orig, dirn = jnp.asarray(np.float32(o)), jnp.asarray(np.float32(d))
    t_k, _, hit, plan = closest_hit_packed(
        tt, orig, dirn, 1e-3, 1e4, rb=128, interpret=True)
    t_all, _, _ = ray_triangle(orig, dirn, v0, v1, v2, 1e-3, 1e4)
    t_ref = np.asarray(jnp.min(t_all, axis=-1))
    assert np.isfinite(t_ref).all() and np.asarray(hit).all()
    np.testing.assert_allclose(np.asarray(t_k), t_ref, rtol=1e-5, atol=1e-6)


def test_tri_kernel_any_hit_mode():
    """any_hit=True: hit mask matches brute force exactly; the returned t
    is a genuine hit in-bounds but not necessarily the nearest."""
    v0, v1, v2 = _layered_quads(layers=8, per_side=8)
    n = v0.shape[0]
    tt = build_tri_table(v0, v1, v2, jnp.zeros((n,), jnp.int32))
    rng = np.random.default_rng(9)
    R = 256
    o = np.float32([[0, 0, -3]]) + rng.uniform(-3, 3, (R, 3))
    d = rng.normal(size=(R, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    orig, dirn = jnp.asarray(np.float32(o)), jnp.asarray(np.float32(d))
    t_k, slot, hit, _ = closest_hit_packed(
        tt, orig, dirn, 1e-3, 50.0, rb=128, any_hit=True, interpret=True)
    t_all, _, _ = ray_triangle(orig, dirn, v0, v1, v2, 1e-3, 50.0)
    hit_ref = np.isfinite(np.asarray(jnp.min(t_all, axis=-1)))
    assert (np.asarray(hit) == hit_ref).all()
    tk = np.asarray(t_k)[hit_ref]
    assert ((tk > 1e-3) & (tk < 50.0)).all()
    # each returned (t, slot) is a real intersection of that triangle
    tri = np.asarray(tt.order)[np.asarray(slot)][hit_ref]
    tt_ref = np.asarray(t_all)[hit_ref]
    t_of_tri = tt_ref[np.arange(tri.shape[0]), tri]
    np.testing.assert_allclose(tk, t_of_tri, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_path_tracer_integration_tri_table():
    """render_path_traced with the packed table matches the un-accelerated
    render bit-for-bit up to traversal tie-breaks."""
    from gsrt.core.config import RenderConfig
    from gsrt.models.path_tracer import render_path_traced, with_tri_table
    from gsrt.scene.primitives_catalog import cornell_box

    scene, cam, opts = cornell_box(width=32, height=32)
    cfg = RenderConfig(width=32, height=32, samples=2, bounces=3,
                       has_sky=False)
    base = render_path_traced(scene, cam, cfg, seed=0)
    accel = with_tri_table(scene, min_tris=1)
    assert accel.tri_table is not None
    fast = render_path_traced(accel, cam, cfg, seed=0)
    np.testing.assert_allclose(np.asarray(base), np.asarray(fast),
                               atol=2e-3)
