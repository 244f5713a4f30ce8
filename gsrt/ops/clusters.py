"""Cluster BVH: TPU-native acceleration structure for secondary rays and
large meshes.

The reference routes every ray through a 2-level BVH walked by a per-thread
stack machine (vulkan_ray_tracing.cc:422-1171). A per-ray stack is the
wrong shape for the VPU: vmapped `lax.cond` executes both branches and the
stack updates become scatters (see gsrt.ops.bvh, kept for parity tests).

This module uses the TPU-native dual: primitives are Morton-ordered and
packed into M fixed-size clusters of K members; clusters get AABBs, and
SUP consecutive clusters share a super-cluster AABB (a fixed-depth 2-level
wide tree — the analogue of the reference's 6-wide GEN_RT nodes,
vulkan_acceleration_structure_util.h:101-105). Traversal is per RAY BUNDLE,
not per ray: a `lax.scan` over super-clusters with a SCALAR `lax.cond` that
skips the whole group when no ray in the bundle enters its AABB. Inside,
each cluster runs one dense [R, K] intersection — exactly the shape the VPU
wants. Work-skipping is real (the cond predicate is scalar, so XLA emits an
actual branch) and all shapes stay static.

This is also the ray-coherency-engine idea (SURVEY.md S8) turned inside
out: instead of hashing rays into coherence packets, the caller passes rays
already bundled (camera tiles, bounce wavefronts), and coherent bundles
skip most of the scene.

`aabb_tests` / `prim_tests` counters are returned per call — the framework
metric mirroring the simulator's `rt_avg_nodes_per_ray`
(gpu-sim.cc:1504-1532).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gsrt.ops.morton import morton3d


class Clusters(NamedTuple):
    """Morton-ordered primitive clusters. `members` is a dict of SoA arrays
    reshaped to [M, K, ...]; AABBs cover real members only."""
    cl_min: jnp.ndarray      # [M, 3]
    cl_max: jnp.ndarray      # [M, 3]
    sup_min: jnp.ndarray     # [MS, 3]
    sup_max: jnp.ndarray     # [MS, 3]
    valid: jnp.ndarray       # [M, K] bool — padding lanes are False
    sup: int                 # clusters per super-cluster

    @property
    def m(self) -> int:
        return self.cl_min.shape[0]

    @property
    def k(self) -> int:
        return self.valid.shape[1]


def build_clusters(aabb_min, aabb_max, k: int = 64, sup: int = 8):
    """Cluster [N,3] primitive AABBs by Morton order of their centers.

    Returns (Clusters, order [M*K] int32 gather indices into the original
    arrays, clamped for padding — use `clusters.valid` to mask). Callers
    gather their per-primitive SoA through `order` and reshape to [M, K].
    """
    n = aabb_min.shape[0]
    centers = 0.5 * (aabb_min + aabb_max)
    order = jnp.argsort(morton3d(centers)).astype(jnp.int32)
    m = -(-n // k)
    m = -(-m // sup) * sup                      # pad cluster count to sup
    pad = m * k - n
    slot_valid = (jnp.arange(m * k, dtype=jnp.int32) < n).reshape(m, k)
    order_p = jnp.concatenate(
        [order, jnp.broadcast_to(order[-1:], (pad,))])   # clamp padding

    bmin = aabb_min[order_p].reshape(m, k, 3)
    bmax = aabb_max[order_p].reshape(m, k, 3)
    inf = jnp.float32(jnp.inf)
    cl_min = jnp.min(jnp.where(slot_valid[..., None], bmin, inf), axis=1)
    cl_max = jnp.max(jnp.where(slot_valid[..., None], bmax, -inf), axis=1)
    sup_min = cl_min.reshape(m // sup, sup, 3).min(axis=1)
    sup_max = cl_max.reshape(m // sup, sup, 3).max(axis=1)
    return (Clusters(cl_min=cl_min, cl_max=cl_max,
                     sup_min=sup_min, sup_max=sup_max,
                     valid=slot_valid, sup=sup),
            order_p)


def ray_aabb_hit(orig, inv_d, bmin, bmax, t_lo, t_hi):
    """Vectorized slab test: orig/inv_d [R,3], bmin/bmax [...,3] broadcast.
    t_lo/t_hi per-ray [R]. (The reference's ray_box_test,
    vulkan_ray_tracing.cc:217-246.)"""
    lo = (bmin - orig) * inv_d
    hi = (bmax - orig) * inv_d
    t_near = jnp.max(jnp.minimum(lo, hi), axis=-1)
    t_far = jnp.min(jnp.maximum(lo, hi), axis=-1)
    return (t_near <= t_far) & (t_far >= t_lo) & (t_near <= t_hi)


def safe_inv_dir(dirn):
    return 1.0 / jnp.where(jnp.abs(dirn) > 1e-12, dirn,
                           jnp.where(dirn >= 0, 1e-12, -1e-12))


def traverse_clusters(clusters: Clusters, orig, dirn, t_min, carry0,
                      cluster_fn, t_hi_fn):
    """Scan all super-clusters/clusters with bundle-level skipping.

    cluster_fn(c, carry) -> carry: dense intersection of cluster c's [K]
      members against all R rays (runs only when some ray enters the
      cluster AABB).
    t_hi_fn(carry) -> [R] per-ray upper bound (e.g. current best t) used to
      cull AABBs.

    Returns (carry, aabb_tests [], clusters_tested []) — counters are whole
    bundle totals (the rt_avg_nodes_per_ray analogue).
    """
    inv_d = safe_inv_dir(dirn)
    sup = clusters.sup
    ms = clusters.sup_min.shape[0]
    # fully-padded clusters have (min=+inf, max=-inf) AABBs, which the
    # slab test always PASSES (t_near=-inf <= t_far=+inf) — mask them or
    # every bundle "visits" the padding and the work counters lie
    cl_nonempty = clusters.valid.any(axis=1)                 # [M]
    sup_nonempty = cl_nonempty.reshape(ms, sup).any(axis=1)  # [MS]

    def sup_body(carry_stats, s):
        carry, aabb_n, leaf_n = carry_stats
        t_hi = t_hi_fn(carry)
        hit_s = ray_aabb_hit(orig, inv_d, clusters.sup_min[s],
                             clusters.sup_max[s], t_min, t_hi)
        hit_s = hit_s & sup_nonempty[s]
        aabb_n = aabb_n + orig.shape[0]

        def do_group(args):
            carry, aabb_n, leaf_n = args

            def cl_body(j, args):
                carry, aabb_n, leaf_n = args
                c = s * sup + j
                t_hi = t_hi_fn(carry)
                hit_c = ray_aabb_hit(orig, inv_d, clusters.cl_min[c],
                                     clusters.cl_max[c], t_min, t_hi)
                hit_c = hit_c & cl_nonempty[c]
                aabb_n = aabb_n + orig.shape[0]

                def do_cluster(args):
                    carry, leaf_n = args
                    return cluster_fn(c, carry), leaf_n + orig.shape[0]

                carry, leaf_n = jax.lax.cond(
                    jnp.any(hit_c), do_cluster, lambda a: a,
                    (carry, leaf_n))
                return carry, aabb_n, leaf_n

            return jax.lax.fori_loop(0, sup, cl_body,
                                     (carry, aabb_n, leaf_n))

        carry, aabb_n, leaf_n = jax.lax.cond(
            jnp.any(hit_s), do_group, lambda a: a, (carry, aabb_n, leaf_n))
        return (carry, aabb_n, leaf_n), None

    (carry, aabb_n, leaf_n), _ = jax.lax.scan(
        sup_body, (carry0, jnp.int32(0), jnp.int32(0)),
        jnp.arange(ms, dtype=jnp.int32))
    return carry, aabb_n, leaf_n


class TriClusters(NamedTuple):
    """Triangle geometry packed into Morton clusters ([M, K, ...])."""
    clusters: Clusters
    v0: jnp.ndarray          # [M, K, 3]
    v1: jnp.ndarray
    v2: jnp.ndarray
    mat: jnp.ndarray         # [M, K] int32
    uv0: jnp.ndarray = None  # [M, K, 2] optional texcoords per corner
    uv1: jnp.ndarray = None
    uv2: jnp.ndarray = None


def build_tri_clusters(v0, v1, v2, mat, uv0=None, uv1=None, uv2=None,
                       k: int = 64, sup: int = 8) -> TriClusters:
    bmin = jnp.minimum(jnp.minimum(v0, v1), v2)
    bmax = jnp.maximum(jnp.maximum(v0, v1), v2)
    clusters, order = build_clusters(bmin, bmax, k=k, sup=sup)
    m = clusters.m

    def g3(a):
        return a[order].reshape(m, k, 3)

    def g2(a):
        return None if a is None else a[order].reshape(m, k, 2)

    return TriClusters(clusters=clusters, v0=g3(v0), v1=g3(v1), v2=g3(v2),
                       mat=mat[order].reshape(m, k),
                       uv0=g2(uv0), uv1=g2(uv1), uv2=g2(uv2))


def closest_hit_tri_clusters(tc: TriClusters, orig, dirn, t_min, t_max):
    """Bundle-coherent nearest triangle hit.

    Returns (t [R], tri_cluster [R], tri_k [R], hit [R], aabb_tests,
    prim_tests). Normals/materials/UVs are looked up by the caller from
    (tri_cluster, tri_k)."""
    from gsrt.ops.primitives import ray_triangle

    R = orig.shape[0]
    cl = tc.clusters
    k = cl.k
    # normalize per-ray bounds: [R] for slab tests, [R,1] against [R,K]
    t_min = jnp.asarray(t_min, jnp.float32)
    t_max = jnp.asarray(t_max, jnp.float32)
    tmin_row = jnp.broadcast_to(t_min.reshape(-1) if t_min.ndim else t_min,
                                (R,))
    tmax_row = jnp.broadcast_to(t_max.reshape(-1) if t_max.ndim else t_max,
                                (R,))
    t_min, t_max = tmin_row[:, None], tmax_row[:, None]

    def cluster_fn(c, carry):
        best_t, best_c, best_k = carry
        t, _, _ = ray_triangle(orig, dirn, tc.v0[c], tc.v1[c], tc.v2[c],
                               t_min, t_max)                    # [R, K]
        t = jnp.where(cl.valid[c][None, :], t, jnp.inf)
        ki = jnp.argmin(t, axis=-1)
        ti = jnp.take_along_axis(t, ki[:, None], -1)[:, 0]
        upd = ti < best_t
        return (jnp.where(upd, ti, best_t),
                jnp.where(upd, c, best_c),
                jnp.where(upd, ki.astype(jnp.int32), best_k))

    carry0 = (jnp.full((R,), jnp.inf),
              jnp.zeros((R,), jnp.int32), jnp.zeros((R,), jnp.int32))
    (best_t, best_c, best_k), aabb_n, leaf_n = traverse_clusters(
        cl, orig, dirn, tmin_row, carry0, cluster_fn,
        # bound AABB culling by the caller's t_max too: range-limited
        # bundles (AO radius, shadow distance) must not traverse the
        # whole scene while still hitless
        lambda c: jnp.minimum(c[0], tmax_row))
    hit = jnp.isfinite(best_t) & (best_t < tmax_row)
    return best_t, best_c, best_k, hit, aabb_n, leaf_n
