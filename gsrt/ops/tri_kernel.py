"""Pallas TPU kernel: cluster-BVH closest-hit for triangle meshes.

The reference walks a per-ray BVH stack in the functional simulator
(vulkan_ray_tracing.cc:422-1171) and replays it on the rt_unit timing
model. gsrt.ops.clusters re-shaped that as bundle-level scans with scalar
`lax.cond` skipping — but XLA lowers those conds to both-branches
execution for vector carries, so on TPU the "skipping" runs the full
O(R·N) math and reference scenes path-trace in seconds (ROADMAP #3).

This module applies the splat-binning playbook to triangles instead:

  1. PLAN (XLA, per bounce): rays are processed in fixed blocks of RB
     consecutive rays. A conservative interval-arithmetic slab test of
     each block's {origin box, direction interval, t bounds} against every
     super-cluster AABB yields a (blocks, super-clusters) candidate mask —
     dense VPU math, no stacks. The mask is compacted into a visit list
     sorted by block (the same cumsum + one-operand-sort machinery as
     tile_binning), with per-block offsets.
  2. TRAVERSE (Pallas): one grid step per ray block; the kernel streams
     the visited super-clusters' triangle tiles HBM→VMEM double-buffered
     (the rt_unit's L0-cache MLP, SURVEY.md S7, recast as prefetch DMA)
     and runs dense Möller–Trumbore over (128 triangles × RB rays) per
     cluster, folding a per-ray (t, index) minimum.

Work scales with Σ per-block visited clusters instead of rays × N. The
visit counts are the `rt_avg_nodes_per_ray` analogue (gpu-sim.cc:1504).

Layout: triangles live in a packed table [MS*128, 128] where super-
cluster s occupies the (128, 128) tile at rows s*128: sublane r = triangle
r of cluster j, lanes j*16 + f = feature f of cluster j (8 clusters × 16
features: v0 xyz, e1 xyz, e2 xyz, mat, cluster-AABB min xyz / max xyz).
Triangles therefore sit on SUBLANES and rays on LANES — min-reduction
over triangles is a cheap sublane reduce and the per-ray results write
out lane-major.

Traversal depth (round 3): the flat super-cluster sweep this replaced
cost bounce bundles a near-linear scan (574 prim tests/ray on
blender_2_77, PT 11.7 s/frame — docs/lumibench_r2.json). Three
mechanisms make the walk effectively log-depth, matching the role of the
reference's per-ray 2-level BVH stack (vulkan_ray_tracing.cc:422-1171)
without a stack machine:

  * FRONT-TO-BACK visits: plan_visits orders each block's visit list by
    the block's conservative entry distance into the super-cluster, and
    the kernel stops as soon as the next entry distance exceeds every
    ray's current best hit (the wavefront analogue of BVH ordered
    traversal + node skipping).
  * PER-CLUSTER cull: the 6 spare feature lanes carry each 128-triangle
    cluster's AABB; a vectorized slab test over the ray block skips the
    whole Möller–Trumbore tile when no ray can improve inside it — the
    second hierarchy level, evaluated in-kernel at ~0.5% of a tile's
    cost.
  * ANY-HIT mode (shadow/AO): rays retire at their first accepted hit;
    the block exits when all rays have one (TraceShadow/TraceAO use
    gl_RayFlagsTerminateOnFirstHitEXT for the same reason).

Padding triangles duplicate the cluster's last real triangle (harmless
for closest-hit: duplicate minima tie). The returned index is a slot in
Morton order; callers map back through `TriTable.order`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 128            # triangles per cluster (one sublane tile)
SUP = 8            # clusters per super-cluster (one 128-lane DMA tile)
FEAT = 16          # feature lanes per cluster (10 used)
RAY_ROWS = 8       # ox oy oz dx dy dz tmin tmax


class TriTable(NamedTuple):
    """Packed triangle clusters + super-cluster AABBs."""
    table: jnp.ndarray    # [MS*128, 128] f32 (see module docstring)
    sup_min: jnp.ndarray  # [MS, 3]
    sup_max: jnp.ndarray  # [MS, 3]
    order: jnp.ndarray    # [MS*SUP*K] int32 — slot -> original triangle id
    n_tris: int


def build_tri_table(v0, v1, v2, mat) -> TriTable:
    """Morton-cluster [N,3] triangle soup into the packed kernel layout.
    Build once per scene, outside jit."""
    from gsrt.ops.clusters import build_clusters

    bmin = jnp.minimum(jnp.minimum(v0, v1), v2)
    bmax = jnp.maximum(jnp.maximum(v0, v1), v2)
    clusters, order = build_clusters(bmin, bmax, k=K, sup=SUP)
    m = clusters.m
    ms = m // SUP

    g = lambda a: a[order]                          # [M*K, ...] slot-major
    tv0, tv1, tv2 = g(v0), g(v1), g(v2)
    # lanes 10-15: the cluster's AABB, replicated down the K sublanes —
    # the kernel's per-cluster slab cull reads it from sublane 0
    feats = jnp.concatenate([
        tv0, tv1 - tv0, tv2 - tv0,
        jax.lax.bitcast_convert_type(mat[order].astype(jnp.int32),
                                     jnp.float32)[:, None],
        jnp.repeat(clusters.cl_min, K, axis=0),
        jnp.repeat(clusters.cl_max, K, axis=0),
    ], axis=1)                                      # [M*K, FEAT]
    # [MS, SUP, K, FEAT] -> sublane=triangle, lane=(cluster, feature)
    table = feats.reshape(ms, SUP, K, FEAT).transpose(0, 2, 1, 3)
    table = table.reshape(ms * K, SUP * FEAT)
    return TriTable(table=table,
                    sup_min=clusters.sup_min, sup_max=clusters.sup_max,
                    order=order, n_tris=v0.shape[0])


class VisitPlan(NamedTuple):
    block_start: jnp.ndarray  # [B+1] int32 visit offsets per ray block
    visit: jnp.ndarray        # [MV] int32 super-cluster ids, block-major,
                              #      front-to-back within each block
    visit_near: jnp.ndarray   # [MV] int32 — each visit's conservative
                              #      entry distance, as the bitcast of a
                              #      non-negative f32 (order-preserving)
    total: jnp.ndarray        # [] int32 visits before capping
    overflow: jnp.ndarray     # [] bool
    actual: jnp.ndarray | None = None
                              # [B] int32 — super-cluster visits each block
                              #      actually EXECUTED before the front-to-
                              #      back early exit (closest_hit_packed
                              #      fills this; plan_visits leaves None).
                              #      The dynamic rt_avg_nodes_per_ray
                              #      analogue; `total` is the static plan.


def plan_visits(orig, dirn, t_min, t_max, sup_min, sup_max,
                rb: int, max_visits: int) -> VisitPlan:
    """Conservative (block × super-cluster) candidate list.

    orig/dirn: [R, 3] with R % rb == 0 (pad rays with dirn=0 — a zero
    direction makes every axis interval straddle, but padded rays ride
    along with their block, so pad with REPEATED last rays instead for
    tight culling; any padding is correctness-safe).
    t_min/t_max: scalars or [R].
    """
    R = orig.shape[0]
    assert R % rb == 0
    B = R // rb
    ms = sup_min.shape[0]

    ob = orig.reshape(B, rb, 3)
    db = dirn.reshape(B, rb, 3)
    olo = ob.min(1)[:, None, :]                    # (B, 1, 3)
    ohi = ob.max(1)[:, None, :]
    dlo = db.min(1)[:, None, :]
    dhi = db.max(1)[:, None, :]
    ok_axis = (dlo > 0) | (dhi < 0)                # else: axis can't cull
    safe_lo = jnp.where(ok_axis, dlo, 1.0)
    safe_hi = jnp.where(ok_axis, dhi, 1.0)
    ilo = 1.0 / safe_hi                            # inv-dir interval
    ihi = 1.0 / safe_lo

    nlo = sup_min[None, :, :] - ohi                # (B, MS, 3)
    nhi = sup_max[None, :, :] - olo
    p1, p2 = nlo * ilo, nlo * ihi
    p3, p4 = nhi * ilo, nhi * ihi
    plo = jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4))
    phi = jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4))
    plo = jnp.where(ok_axis, plo, -jnp.inf)
    phi = jnp.where(ok_axis, phi, jnp.inf)
    near_lb = plo.max(-1)                          # (B, MS)
    far_ub = phi.min(-1)

    tmin_a = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    tmax_a = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    tmin_blk = tmin_a.reshape(B, rb).min(1)[:, None]
    tmax_blk = tmax_a.reshape(B, rb).max(1)[:, None]
    mask = (near_lb <= far_ub) & (far_ub >= tmin_blk) & (near_lb <= tmax_blk)

    # Second cull: bounding cone vs cluster bounding sphere. The interval
    # test cannot cull on an axis whose direction interval straddles zero —
    # which is every transverse axis of a narrow camera-tile beam, the most
    # common bundle. The cone test handles exactly that case; wide-angle
    # bundles (AO hemispheres) degrade to sin=1 and fall back to the
    # interval test. (The reference's ray-coherency packets, SURVEY.md S8,
    # exploit the same bundle structure.)
    # normalize for the cone math only (the interval test and the kernel
    # are magnitude-correct in t units; the cone compares Euclidean axis
    # distances, so it needs unit rays and a |d|-scaled distance bound)
    dmag = jnp.linalg.norm(db, axis=-1, keepdims=True)           # (B,rb,1)
    dn = db / jnp.maximum(dmag, 1e-12)
    dist_blk = tmax_blk * dmag[:, :, 0].max(1)[:, None]          # (B, 1)
    axis = dn.mean(1)                                  # (B, 3)
    axis = axis / jnp.maximum(
        jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-9)
    cos_raw = jnp.min(jnp.sum(dn * axis[:, None, :], -1), axis=1)  # (B,)
    cos_t = jnp.clip(cos_raw, 0.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    o_c = 0.5 * (olo + ohi)[:, 0, :]                   # (B, 3)
    o_r = 0.5 * jnp.linalg.norm((ohi - olo)[:, 0, :], axis=-1)
    c_c = 0.5 * (sup_min + sup_max)                    # (MS, 3)
    c_r = 0.5 * jnp.linalg.norm(sup_max - sup_min, axis=-1)
    # conservative inflation: origin spread + angular spread x the farthest
    # in-cluster distance along the axis
    v = c_c[None, :, :] - o_c[:, None, :]              # (B, MS, 3)
    dz = jnp.sum(v * axis[:, None, :], -1)             # (B, MS)
    reach = jnp.minimum(jnp.maximum(dz + c_r[None, :], 0.0), dist_blk)
    # tan, not sin: ray parameter t can exceed the axis projection by
    # 1/cos, and wide bundles (cos -> 0) must inflate to "no culling"
    tan_t = sin_t / jnp.maximum(cos_t, 1e-3)
    w = (o_r[:, None] + tan_t[:, None] * reach)[..., None]   # (B, MS, 1)
    # slab test of the fat axis ray against the inflated AABB
    amin = sup_min[None, :, :] - w - o_c[:, None, :]   # (B, MS, 3)
    amax = sup_max[None, :, :] + w - o_c[:, None, :]
    usable = jnp.abs(axis) > 1e-6                      # (B, 3)
    inv_ax = 1.0 / jnp.where(usable, axis, 1.0)
    lo = amin * inv_ax[:, None, :]
    hi = amax * inv_ax[:, None, :]
    t_lo = jnp.minimum(lo, hi)
    t_hi = jnp.maximum(lo, hi)
    u3 = usable[:, None, :]
    near = jnp.max(jnp.where(u3, t_lo, -jnp.inf), -1)  # (B, MS)
    far = jnp.min(jnp.where(u3, t_hi, jnp.inf), -1)
    # axes where the mean direction vanishes cull by position containment
    contained = jnp.all(u3 | ((amin <= 0.0) & (amax >= 0.0)), -1)
    cone_ok = ((near <= far) & (far >= -o_r[:, None])
               & (near <= dist_blk) & contained)
    # a block whose direction spread exceeds 90° has no bounding cone:
    # reach clamps at 0 behind the center and would falsely cull clusters
    # that a backward-pointing ray genuinely hits — skip the test there
    cone_ok = cone_ok | (cos_raw <= 0.0)[:, None]
    mask &= cone_ok

    counts = jnp.sum(mask, axis=1, dtype=jnp.int32)          # (B,)
    total = jnp.sum(counts)
    overflow = total > max_visits
    block_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)])
    block_start = jnp.minimum(block_start, max_visits)

    # Compact into a block-major list, FRONT-TO-BACK within each block:
    # lexicographic (block, entry-distance) sort. Entry distances are
    # non-negative f32 bitcast to int32 — a monotone key the kernel can
    # compare against its running best-t without float SMEM reads.
    flat = mask.reshape(B * ms)
    inf_i = jnp.int32(0x7F800000)
    near_f = jnp.clip(jnp.maximum(near_lb, tmin_blk), 0.0, 3.0e38)
    near_i = jax.lax.bitcast_convert_type(
        near_f.astype(jnp.float32), jnp.int32).reshape(B * ms)
    blk = (jnp.arange(B * ms, dtype=jnp.int32) // ms)
    blk_key = jnp.where(flat, blk, jnp.int32(B))
    near_key = jnp.where(flat, near_i, inf_i)
    sup = (jnp.arange(B * ms, dtype=jnp.int32) % ms)
    _, near_s, sup_s = jax.lax.sort(
        (blk_key, near_key, sup), num_keys=2, is_stable=False)
    if B * ms >= max_visits:
        near_s = near_s[:max_visits]
        sup_s = sup_s[:max_visits]
    else:
        near_s = jnp.pad(near_s, (0, max_visits - B * ms),
                         constant_values=inf_i)
        sup_s = jnp.pad(sup_s, (0, max_visits - B * ms))
    return VisitPlan(block_start=block_start, visit=sup_s,
                     visit_near=near_s, total=total, overflow=overflow)


def _tri_kernel(
    # scalar prefetch
    block_start_ref,       # [B+1] int32
    visit_ref,             # [MV] int32
    near_ref,              # [MV] int32 (bitcast non-negative f32)
    # inputs
    table_hbm,             # [MS*K, 128] f32 in HBM
    rays_ref,              # [RAY_ROWS, RB] VMEM block
    # outputs
    out_ref,               # [8, RB] VMEM: row 0 t, row 1 idx (bitcast)
    # scratch
    buf,                   # [2, K, 128] VMEM
    bt_ref,                # [1, RB] VMEM running best t
    bi_ref,                # [1, RB] VMEM running best slot
    vc_ref,                # [1, RB] VMEM executed-visit counter (f32,
                           #         lane-replicated; row 2 of the output)
    sem,                   # DMA semaphores (2,)
    *,
    rb: int,
    any_hit: bool,
    cluster_cull: bool,
):
    b = pl.program_id(0)
    v0i = block_start_ref[b]
    v1i = block_start_ref[b + 1]
    nv = v1i - v0i
    mv = near_ref.shape[0]
    inf_i = jnp.int32(0x7F800000)

    # scratch persists across grid steps — re-init per block
    bt_ref[...] = jnp.full((1, rb), jnp.inf)
    bi_ref[...] = jnp.zeros((1, rb), jnp.int32)
    vc_ref[...] = jnp.zeros((1, rb), jnp.float32)

    def dma(slot, j):
        c = visit_ref[v0i + j]
        row = pl.multiple_of(c * K, K)
        return pltpu.make_async_copy(
            table_hbm.at[pl.ds(row, K), :], buf.at[slot], sem.at[slot])

    @pl.when(nv > 0)
    def _():
        dma(0, 0).start()

    ox = rays_ref[0:1, :]                          # (1, RB)
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]
    tmin = rays_ref[6:7, :]
    tmax = rays_ref[7:8, :]
    # slab-test inverse directions; |d| below eps can't cull reliably, so
    # substituting eps keeps the test conservative on parallel axes
    eps = jnp.float32(1e-20)
    sdx = jnp.where(jnp.abs(dx) < eps, eps, dx)
    sdy = jnp.where(jnp.abs(dy) < eps, eps, dy)
    sdz = jnp.where(jnp.abs(dz) < eps, eps, dz)
    ivx, ivy, ivz = 1.0 / sdx, 1.0 / sdy, 1.0 / sdz

    def _best_max_i():
        """Running worst-case best-t across the block, in the bitcast-int
        order near_ref uses. In any-hit mode a retired ray stops mattering
        entirely, so its contribution is -inf (ignore it)."""
        bt = bt_ref[...]
        if any_hit:
            bt = jnp.where(jnp.isfinite(bt), -jnp.inf, bt)
        m = jnp.max(bt, axis=1, keepdims=True)              # (1, 1)
        m = jnp.maximum(m, 0.0)         # keep the int compare monotone
        return pltpu.bitcast(m, jnp.int32)[0, 0]

    def _cont(j):
        """Continue to visit j? Front-to-back ordering makes the entry
        distance non-decreasing: once it clears every ray's best hit, no
        later visit can improve (any-hit: once every ray hit, stop)."""
        nxt = near_ref[jnp.minimum(v0i + j, mv - 1)]
        return (j < nv) & (nxt < _best_max_i())

    def body(state):
        j, _ = state
        slot = jax.lax.rem(j, 2)
        # decide continuation (and prefetch) from the PRE-update best —
        # conservative by one visit, but keeps the DMA prefetch ahead of
        # the compute and guarantees no in-flight copy at loop exit
        cont = _cont(j + 1)

        @pl.when(cont)
        def _():
            dma(1 - slot, j + 1).start()

        dma(slot, j).wait()
        tile = buf[slot]                           # (K, 128)
        c = visit_ref[v0i + j]
        vc_ref[...] = vc_ref[...] + 1.0            # executed-visit count

        for cj in range(SUP):
            base_l = cj * FEAT
            f = lambda i: tile[:, base_l + i:base_l + i + 1]    # (K, 1)

            def mt_tile():
                v0x, v0y, v0z = f(0), f(1), f(2)
                e1x, e1y, e1z = f(3), f(4), f(5)
                e2x, e2y, e2z = f(6), f(7), f(8)

                # Möller–Trumbore, (K tris, RB rays); mirrors
                # mt_ray_triangle_test (vulkan_ray_tracing.cc:1184-1206)
                pvx = dy * e2z - dz * e2y
                pvy = dz * e2x - dx * e2z
                pvz = dx * e2y - dy * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                tvx = ox - v0x
                tvy = oy - v0y
                tvz = oz - v0z
                u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
                t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                ok = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
                      & (u + v <= 1.0) & (t > tmin) & (t < tmax))
                t = jnp.where(ok, t, jnp.inf)

                tc = jnp.min(t, axis=0, keepdims=True)          # (1, RB)
                sub = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
                ic = jnp.min(jnp.where(t <= tc, sub, jnp.int32(K)),
                             axis=0, keepdims=True)             # (1, RB)
                slot_idx = (c * SUP + cj) * K + ic
                upd = tc < bt_ref[...]
                bt_ref[...] = jnp.where(upd, tc, bt_ref[...])
                bi_ref[...] = jnp.where(upd, slot_idx, bi_ref[...])

            if cluster_cull:
                # second hierarchy level: the cluster's own AABB (lanes
                # 10-15, sublane 0). Slab-test the whole ray block; a ray
                # bounds the useful window by its best hit (any-hit:
                # retired rays bound it to nothing).
                bt = bt_ref[...]
                lim = jnp.where(jnp.isfinite(bt), -jnp.inf, tmax) \
                    if any_hit else jnp.minimum(tmax, bt)
                l0 = (tile[0, base_l + 10] - ox) * ivx
                h0 = (tile[0, base_l + 13] - ox) * ivx
                l1 = (tile[0, base_l + 11] - oy) * ivy
                h1 = (tile[0, base_l + 14] - oy) * ivy
                l2 = (tile[0, base_l + 12] - oz) * ivz
                h2 = (tile[0, base_l + 15] - oz) * ivz
                t_in = jnp.maximum(
                    jnp.maximum(jnp.minimum(l0, h0), jnp.minimum(l1, h1)),
                    jnp.maximum(jnp.minimum(l2, h2), tmin))
                t_out = jnp.minimum(
                    jnp.minimum(jnp.maximum(l0, h0), jnp.maximum(l1, h1)),
                    jnp.minimum(jnp.maximum(l2, h2), lim))
                pl.when(jnp.any(t_in <= t_out))(mt_tile)
            else:
                mt_tile()

        # return the SAME pre-update decision the prefetch used: if cont
        # is False no DMA was started and the loop exits with none in
        # flight; recomputing post-update here could strand one
        return j + 1, cont

    def cond(state):
        return state[1]

    jax.lax.while_loop(cond, body, (jnp.int32(0), nv > 0))

    row = jax.lax.broadcasted_iota(jnp.int32, (8, rb), 0)
    out_ref[...] = jnp.where(
        row == 0, jnp.broadcast_to(bt_ref[...], (8, rb)),
        jnp.where(row == 1,
                  jnp.broadcast_to(pltpu.bitcast(bi_ref[...], jnp.float32),
                                   (8, rb)),
                  jnp.where(row == 2,
                            jnp.broadcast_to(vc_ref[...], (8, rb)),
                            0.0)))


def closest_hit_packed(tt: TriTable, orig, dirn, t_min, t_max,
                       *, rb: int = 512, max_visits: int | None = None,
                       any_hit: bool = False, cluster_cull: bool = True,
                       interpret: bool | None = None):
    """Bundle closest-hit through the packed cluster table.

    orig/dirn [R, 3]; t_min/t_max scalars, [R] or [R,1]. Returns
    (t [R], slot [R] — index into tt.order, hit [R], plan: VisitPlan).
    R is padded internally to a multiple of rb (repeating the last ray).
    interpret=None resolves to True off-TPU (CPU tests run the kernel in
    interpret mode automatically).

    any_hit=True relaxes closest-hit to occlusion semantics (shadow/AO
    rays, gl_RayFlagsTerminateOnFirstHitEXT): the returned t is still A
    valid hit in (t_min, t_max) but not necessarily the nearest, and the
    block retires rays (and exits) as soon as every ray has one.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R = orig.shape[0]
    pad = (-R) % rb
    if pad:
        orig = jnp.concatenate([orig, jnp.broadcast_to(orig[-1:], (pad, 3))])
        dirn = jnp.concatenate([dirn, jnp.broadcast_to(dirn[-1:], (pad, 3))])
    Rp = R + pad

    def _row(x):
        x = jnp.asarray(x, jnp.float32)
        return jnp.broadcast_to(x.reshape(-1) if x.ndim else x, (R,))

    tmin_a = _row(t_min)
    tmax_a = _row(t_max)
    if pad:
        tmin_a = jnp.pad(tmin_a, (0, pad), constant_values=1e30)
        tmax_a = jnp.pad(tmax_a, (0, pad))   # tmax 0: padded rays never hit

    ms = tt.sup_min.shape[0]
    B = Rp // rb
    if max_visits is None:
        # the visit list is scalar-prefetched into SMEM — keep it small.
        # 64K entries covers e.g. 32K rays x 100 superclusters dense; very
        # large launches should chunk rays (or raise rb) — plan.overflow
        # reports truncation.
        # the visit list is B*ms int32 at worst — allocate it fully up to
        # 16 MB (a 64K cap silently truncated wide bounce waves over big
        # scenes: blocks past the cap traversed nothing and reported miss)
        max_visits = min(B * ms, 1 << 22)
    plan = plan_visits(orig, dirn, tmin_a, tmax_a, tt.sup_min, tt.sup_max,
                       rb, max_visits)

    rays = jnp.stack([orig[:, 0], orig[:, 1], orig[:, 2],
                      dirn[:, 0], dirn[:, 1], dirn[:, 2],
                      tmin_a, tmax_a], axis=0)    # [RAY_ROWS, Rp]

    rays, block_start, visit, visit_near = jax.lax.optimization_barrier(
        (rays, plan.block_start, plan.visit, plan.visit_near))

    kernel = functools.partial(_tri_kernel, rb=rb, any_hit=any_hit,
                               cluster_cull=cluster_cull)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((RAY_ROWS, rb),
                         index_map=lambda b, bs, vs, ns: (0, b)),
        ],
        out_specs=pl.BlockSpec((8, rb),
                               index_map=lambda b, bs, vs, ns: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, K, 128), jnp.float32),
            pltpu.VMEM((1, rb), jnp.float32),
            pltpu.VMEM((1, rb), jnp.int32),
            pltpu.VMEM((1, rb), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * 8, rb), jnp.float32),
        interpret=interpret,
    )(block_start, visit, visit_near, tt.table, rays)

    out = out.reshape(B, 8, rb)
    t = out[:, 0, :].reshape(Rp)[:R]
    slot = jax.lax.bitcast_convert_type(out[:, 1, :], jnp.int32)
    slot = slot.reshape(Rp)[:R]
    hit = jnp.isfinite(t)
    plan = plan._replace(actual=out[:, 2, 0].astype(jnp.int32))
    return t, slot, hit, plan
