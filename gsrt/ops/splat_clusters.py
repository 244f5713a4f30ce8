"""Cluster-filtered tracing of arbitrary rays through Gaussian clouds.

`trace_gaussian_rays` (gaussian_rt.py) evaluates every splat against every
ray per k-buffer pass — O(R·N), fine for shadow bundles against small
clouds but not for bounces inside a 1M-splat scene. The reference has the
structural capability via its BVH (any ray can hit the splat BLAS, hit
group 4 — Application.cpp:253-398) but never exercises it at scale.

Branch-based traversal does not pay on TPU (scalar `lax.cond` skipping in
`ops.clusters.traverse_clusters` lowers to both-branches execution for
vector carries — ROADMAP #3), so this module uses the same playbook that
made tile binning fast: PLAN with dense vector math, COMPACT to a static
bound, then do dense gathered work only where the plan says:

  1. splats are Morton-packed into K-member clusters with conservative
     world-space AABBs (mean ± sqrt(2·G_eff·λ_max(Σ)), λ_max bounded by
     Gershgorin rows — beyond that radius alpha < threshold everywhere);
     SUP consecutive clusters share a super-cluster AABB (ops.clusters).
  2. PLAN: each ray slab-tests every super-cluster AABB over its live
     [t_lo, t_hi] window ([R, MS] dense VPU math, ~MS=977 at 1M splats),
     rays are grouped in blocks of RB consecutive rays, and a block visits
     a super-cluster when ANY of its rays enters it. `top_k` over the
     block mask compacts each block's visit set to a static s_max list
     (overflow reported, calibrate-and-recompile like max_pairs).
  3. TRACE: a scan over the s_max·SUP cluster slots; at each step every
     block gathers ITS cluster's [K] splats (one dynamic row-block gather
     per block) and runs the dense [RB, K] ray-space response + k-nearest
     merge — exactly the brute-force inner body, but over visited
     clusters only. Work scales with Σ per-block visited clusters instead
     of R·N.

The k-buffer multi-pass loop re-PLANs each pass: the depth window
[front, t_max] shrinks as fronts advance, so later passes visit fewer
clusters — the analogue of the reference's shrinking [t_min, t_max]
re-traversal (GaussTracing.rgen:47-72).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gsrt.core.config import RenderConfig
from gsrt.core.types import GaussianCloud
from gsrt.ops.clusters import (Clusters, build_clusters,
                               ray_aabb_hit, safe_inv_dir)
from gsrt.ops.gaussian import invert_cov3d, ray_gaussian_response


class SplatClusters(NamedTuple):
    """Morton-clustered splat SoA ([M, K, ...]); padding has opacity 0."""
    clusters: Clusters
    means: jnp.ndarray     # [M, K, 3]
    cov_inv: jnp.ndarray   # [M, K, 6] packed symmetric inverse covariance
    opacity: jnp.ndarray   # [M, K] (0 on padding / sub-threshold)
    colors: jnp.ndarray    # [M, K, 3]

    @property
    def m(self) -> int:
        return self.means.shape[0]

    @property
    def k(self) -> int:
        return self.means.shape[1]


def splat_world_radius(cloud: GaussianCloud, cfg: RenderConfig):
    """Conservative world-space influence radius per splat: beyond
    r = sqrt(2·G_eff·λ_max), alpha = op·e⁻ᵍ is below the threshold in every
    direction. λ_max(Σ) is bounded by the Gershgorin row-sum (exact for
    diagonal Σ, ≤ 2x loose for extreme anisotropy — conservative)."""
    c = cloud.cov3d
    row0 = jnp.abs(c[:, 0]) + jnp.abs(c[:, 1]) + jnp.abs(c[:, 2])
    row1 = jnp.abs(c[:, 1]) + jnp.abs(c[:, 3]) + jnp.abs(c[:, 4])
    row2 = jnp.abs(c[:, 2]) + jnp.abs(c[:, 4]) + jnp.abs(c[:, 5])
    lam = jnp.maximum(row0, jnp.maximum(row1, row2))
    g_eff = jnp.minimum(
        jnp.float32(cfg.g_cutoff),
        jnp.maximum(jnp.log(jnp.maximum(
            cloud.opacity / cfg.alpha_threshold, 1e-6)), 0.0))
    return jnp.sqrt(2.0 * g_eff * lam)


def build_splat_clusters(cloud: GaussianCloud, cfg: RenderConfig,
                         colors, k: int = 128,
                         sup: int = 8) -> SplatClusters:
    """Cluster a cloud for arbitrary-ray tracing. Build once per scene
    outside jit (the BLAS build analogue). `colors` is per-splat RGB
    (e.g. SH evaluated at a representative view)."""
    r = splat_world_radius(cloud, cfg)[:, None]
    clusters, order = build_clusters(cloud.means - r, cloud.means + r,
                                     k=k, sup=sup)
    m = clusters.m
    cov_inv = invert_cov3d(cloud.cov3d)
    op = jnp.where(cloud.opacity > cfg.alpha_threshold, cloud.opacity, 0.0)
    return SplatClusters(
        clusters=clusters,
        means=cloud.means[order].reshape(m, k, 3),
        cov_inv=cov_inv[order].reshape(m, k, 6),
        opacity=jnp.where(clusters.valid, op[order].reshape(m, k), 0.0),
        colors=colors[order].reshape(m, k, 3))


def plan_visits(sc: SplatClusters, orig, dirn, t_lo, t_hi,
                rb: int, s_max: int):
    """Per-block visited super-cluster lists.

    orig/dirn [R, 3] with R % rb == 0; t_lo/t_hi [R] live depth windows.
    Returns (sup_ids [B, s_max] int32 — sentinel MS when unused,
    n_hit [B], overflow [] bool). Dense [R, MS] slab math; no branches.
    """
    cl = sc.clusters
    ms = cl.sup_min.shape[0]
    R = orig.shape[0]
    B = R // rb
    inv_d = safe_inv_dir(dirn)
    # [R, MS] slab test against every super-cluster
    hit = ray_aabb_hit(orig[:, None, :], inv_d[:, None, :],
                       cl.sup_min[None], cl.sup_max[None],
                       t_lo[:, None], t_hi[:, None])
    block_hit = jnp.any(hit.reshape(B, rb, ms), axis=1)        # [B, MS]
    n_hit = jnp.sum(block_hit, axis=1).astype(jnp.int32)       # [B]
    overflow = jnp.any(n_hit > s_max)
    # compact: top_k over (hit ? MS - s : -1) puts hit sups first, in
    # ascending Morton order (nearby clusters stay adjacent in the scan)
    sid = jnp.arange(ms, dtype=jnp.int32)
    score = jnp.where(block_hit, ms - sid, -1)
    val, idx = jax.lax.top_k(score, min(s_max, ms))            # [B, s_max]
    sup_ids = jnp.where(val > 0, idx.astype(jnp.int32), ms)
    if s_max > ms:
        sup_ids = jnp.concatenate(
            [sup_ids, jnp.full((B, s_max - ms), ms, jnp.int32)], axis=1)
    return sup_ids, n_hit, overflow


def trace_gaussian_rays_clustered(
        sc: SplatClusters, origins, dirs, cfg: RenderConfig,
        t_max=None, rb: int = 256, s_max: int = 32):
    """Cluster-filtered `trace_gaussian_rays` (same semantics/returns,
    plus a plan-overflow flag).

    origins/dirs [R, 3]; R is padded to a block multiple internally.
    Returns (trans [R], color [R, 3], hits [R], overflow []). overflow
    True means some block had more than s_max candidate super-clusters
    in some pass — re-trace with a larger s_max (static recompile; the
    max_pairs calibrate-and-retry pattern).
    """
    R0 = origins.shape[0]
    pad = (-R0) % rb
    if pad:
        origins = jnp.concatenate(
            [origins, jnp.ones((pad, 3), origins.dtype)], axis=0)
        dirs = jnp.concatenate(
            [dirs, jnp.ones((pad, 3), dirs.dtype)], axis=0)
    R = origins.shape[0]
    B = R // rb
    k = cfg.k
    K = sc.k
    sup = sc.clusters.sup
    ms = sc.clusters.sup_min.shape[0]
    init_d = jnp.float32(cfg.init_depth)
    tmax_r = jnp.broadcast_to(
        jnp.asarray(cfg.t_max if t_max is None else t_max, jnp.float32),
        (R0,))
    # the k-buffer uses init_depth as the empty-slot sentinel and counts
    # hits as kd < init_depth — depths past it would be silently dropped,
    # so clamp the window to it (same contract as trace_gaussian_rays)
    tmax_r = jnp.minimum(tmax_r, jnp.float32(cfg.init_depth))
    tmax_r = jnp.concatenate(
        [tmax_r, jnp.full((pad,), -jnp.inf)], axis=0) if pad else tmax_r

    ob = origins.reshape(B, rb, 3)
    db = dirs.reshape(B, rb, 3)
    resp = jax.vmap(ray_gaussian_response)     # [B,rb,3]x[B,K,...]->[B,rb,K]

    def one_pass(front):
        t_lo = jnp.maximum(front, cfg.t_min)
        sup_ids, _, ovf = plan_visits(sc, origins, dirs, t_lo, tmax_r,
                                      rb, s_max)

        def step(carry, j):
            kd, ka, kc = carry               # [B,rb,k] / [B,rb,k] / [B,rb,k,3]
            s = sup_ids[:, j // sup]                       # [B]
            c = jnp.minimum(s, ms - 1) * sup + (j % sup)   # [B] cluster id
            live = (s < ms)[:, None, None]                 # [B,1,1]
            mu = sc.means[c]                               # [B,K,3] gather
            ci = sc.cov_inv[c]
            op = sc.opacity[c]
            col = sc.colors[c]
            t_star, g = resp(ob, db, mu, ci)               # [B,rb,K]
            alpha = jnp.minimum(op[:, None, :] * jnp.exp(-g), 0.99)
            valid = (live & (g <= cfg.g_cutoff)
                     & (alpha > cfg.alpha_threshold)
                     & (t_star > t_lo.reshape(B, rb)[:, :, None])
                     & (t_star < tmax_r.reshape(B, rb)[:, :, None]))
            cd = jnp.where(valid, t_star, init_d)
            md = jnp.concatenate([kd, cd], -1)             # [B,rb,k+K]
            ma = jnp.concatenate([ka, jnp.where(valid, alpha, 0.0)], -1)
            mc = jnp.concatenate(
                [kc, jnp.broadcast_to(col[:, None], (B, rb, K, 3))], -2)
            neg, idx = jax.lax.top_k(-md, k)
            return ((-neg, jnp.take_along_axis(ma, idx, -1),
                     jnp.take_along_axis(mc, idx[..., None], -2)), None)

        kd0 = jnp.full((B, rb, k), init_d)
        ka0 = jnp.zeros((B, rb, k))
        kc0 = jnp.zeros((B, rb, k, 3))
        (kd, ka, kc), _ = jax.lax.scan(
            step, (kd0, ka0, kc0),
            jnp.arange(s_max * sup, dtype=jnp.int32))
        flat = lambda a: a.reshape((R,) + a.shape[2:])
        kd, ka, kc = flat(kd), flat(ka), flat(kc)
        count = jnp.sum(kd < init_d, -1).astype(jnp.int32)
        return kd, ka, kc, count, ovf

    from gsrt.ops.kbuffer import advance_depth_front, composite_color

    def cond(state):
        return jnp.logical_not(jnp.all(state[4]))

    def step(state):
        front, trans, color, hits, done, ovf = state
        kd, ka, kc, count, ovf_p = one_pass(front)
        new_trans, new_color = composite_color(trans, color, ka, kc, count)
        new_front = advance_depth_front(front, kd, count)
        live = ~done
        trans = jnp.where(live, new_trans, trans)
        color = jnp.where(live[:, None], new_color, color)
        front = jnp.where(live, new_front, front)
        hits = hits + jnp.where(live, count, 0)
        done = done | (count == 0) | (hits >= cfg.max_passes * k)
        return front, trans, color, hits, done, ovf | ovf_p

    state = (jnp.zeros(R), jnp.ones(R), jnp.zeros((R, 3)),
             jnp.zeros(R, jnp.int32), jnp.zeros(R, bool),
             jnp.zeros((), bool))
    front, trans, color, hits, done, ovf = jax.lax.while_loop(
        cond, step, state)
    return trans[:R0], color[:R0], hits[:R0], ovf
