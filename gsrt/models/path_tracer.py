"""Wavefront path tracer — the reference's triangle/procedural workloads.

Re-implements the RTIOW-style iterative path tracer of
assets/shaders/RayTracing.rgen:36-99 + Scatter.glsl:15-81 +
RayTracing.rmiss as a TPU wavefront: all rays advance one bounce per step
(dense [R] SoA, masked lanes for terminated rays) instead of per-thread GLSL
loops. Materials are evaluated for every lane and selected by mask — the
TPU version of the reference's warp-level shader coalescing
(Function_Call_Coalescing, intersection_table.h:44-47).

Shader-type variants (README.md:8-16, --shader-type):
  * path  — full path tracing (RayTracing.rgen)
  * shadow — primary hit + hard shadow rays toward the light
    (TraceShadow.rgen semantics)
  * ao — primary hit + cosine-hemisphere occlusion rays (TraceAO.rgen)

Scenes are SoA sphere/box/triangle sets (gsrt.scene.catalog builds the
RTIOW and Cornell-box scenes; OBJ meshes via gsrt.scene.obj).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gsrt.core.config import RenderConfig
from gsrt.core.types import Camera, Materials
from gsrt.ops.primitives import (
    box_normal,
    ray_box,
    ray_sphere,
    ray_triangle,
    sphere_normal,
    triangle_normal,
)


class PrimitiveScene(NamedTuple):
    """Mixed-primitive scene SoA (the reference's per-model BLAS set,
    flattened — sphere/cube procedurals + triangle geometry).

    `textures` is an optional [NT, TH, TW, 3] atlas sampled bilinearly by
    Materials.texture_id (the reference's TextureSamplers array,
    Scatter.glsl:18). `alpha_textures` [NT, TH, TW] carries cutout masks for
    any-hit alpha masking (the TraceTree.rahit workload: hits with sampled
    alpha < 0.5 are ignored and the ray continues)."""

    sph_center: jnp.ndarray   # [S, 3]
    sph_radius: jnp.ndarray   # [S]
    sph_mat: jnp.ndarray      # [S] int32
    box_min: jnp.ndarray      # [B, 3]
    box_max: jnp.ndarray      # [B, 3]
    box_mat: jnp.ndarray      # [B]
    tri_v0: jnp.ndarray       # [T, 3]
    tri_v1: jnp.ndarray
    tri_v2: jnp.ndarray
    tri_mat: jnp.ndarray      # [T]
    materials: Materials
    textures: Optional[jnp.ndarray] = None        # [NT, TH, TW, 3]
    alpha_textures: Optional[jnp.ndarray] = None  # [NT, TH, TW]
    # per-corner texcoords (tinyobjloader attrib.texcoords analogue,
    # reference Model.cpp LoadModel; sampled in Scatter.glsl:18)
    tri_uv0: Optional[jnp.ndarray] = None         # [T, 2]
    tri_uv1: Optional[jnp.ndarray] = None
    tri_uv2: Optional[jnp.ndarray] = None
    # Morton-cluster acceleration structure over the triangles
    # (gsrt.ops.clusters — the reference's BLAS role); built on demand with
    # `with_tri_clusters`, used by _closest_hit when present
    tri_clusters: Optional["TriClusters"] = None
    # packed-cluster table for the Pallas traversal kernel
    # (gsrt.ops.tri_kernel); built with `with_tri_table` and preferred over
    # tri_clusters by _closest_hit — this is the TPU production path
    tri_table: Optional["TriTable"] = None
    # capped y-axis cylinders (the reference's ProceduralCylinder hit
    # group; its rint tests the side surface of a cylinder with
    # half-height = radius, RayTracing.ProceduralCylinder.rint:27-52).
    # None when the scene has none.
    cyl_center: Optional[jnp.ndarray] = None      # [C, 3]
    cyl_radius: Optional[jnp.ndarray] = None      # [C]
    cyl_half_h: Optional[jnp.ndarray] = None      # [C]
    cyl_mat: Optional[jnp.ndarray] = None         # [C] int32
    # Mandelbulb DE-marched fractals (ProceduralMandelbulb.rint)
    mnd_center: Optional[jnp.ndarray] = None      # [M, 3]
    mnd_radius: Optional[jnp.ndarray] = None      # [M]
    mnd_mat: Optional[jnp.ndarray] = None         # [M] int32
    # texture mip pyramid (gsrt.ops.mip packed side-strip layout,
    # [NT, TH, TW + TW//2, 3]) + per-material texel density (texels per
    # world unit) for ray-cone LOD. Attached by `with_texture_mips`;
    # None -> level-0 bilinear sampling (the reference workloads' path).
    # Reference capability: getTexture's txl mip selection
    # (vulkan_ray_tracing.cc:1992-2334).
    tex_mips: Optional[jnp.ndarray] = None
    mat_texel: Optional[jnp.ndarray] = None       # [n_mats] f32

    @property
    def counts(self):
        return (self.sph_center.shape[0], self.box_min.shape[0],
                self.tri_v0.shape[0])


def sample_texture(textures, tex_id, uv):
    """Bilinear atlas sample: textures [NT,TH,TW,3], tex_id [R] (−1 → white),
    uv [R,2] in [0,1). Mirrors the simulator's bilinear getTexture
    (vulkan_ray_tracing.cc:1992+). The uv clamp IS the reference address
    mode: SamplerConfig defaults to CLAMP_TO_EDGE on all axes
    (RayTracingInVulkan/src/Vulkan/Sampler.hpp:13-15)."""
    NT, TH, TW, _ = textures.shape
    t = jnp.clip(tex_id, 0, NT - 1)
    u = jnp.clip(uv[:, 0], 0.0, 1.0) * (TW - 1)
    v = jnp.clip(uv[:, 1], 0.0, 1.0) * (TH - 1)
    x0 = jnp.floor(u).astype(jnp.int32)
    y0 = jnp.floor(v).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, TW - 1)
    y1 = jnp.minimum(y0 + 1, TH - 1)
    fx = (u - x0)[:, None]
    fy = (v - y0)[:, None]
    c00 = textures[t, y0, x0]
    c01 = textures[t, y0, x1]
    c10 = textures[t, y1, x0]
    c11 = textures[t, y1, x1]
    col = ((1 - fy) * ((1 - fx) * c00 + fx * c01)
           + fy * ((1 - fx) * c10 + fx * c11))
    return jnp.where((tex_id >= 0)[:, None], col, 1.0)


def sphere_uv(normal):
    """Equirectangular UV from the unit surface normal (the reference's
    procedural-sphere texcoord, RayTracing.Procedural.rchit)."""
    u = 0.5 + jnp.arctan2(normal[:, 2], normal[:, 0]) / (2 * jnp.pi)
    v = 0.5 - jnp.arcsin(jnp.clip(normal[:, 1], -1, 1)) / jnp.pi
    return jnp.stack([u, v], -1)


def with_tri_clusters(scene: PrimitiveScene, k: int = 64,
                      sup: int = 8) -> PrimitiveScene:
    """Attach the Morton-cluster acceleration structure over the scene's
    triangles (gsrt.ops.clusters). Do this ONCE per scene, outside jit —
    the reference's BLAS build step (lvp_acceleration_structure.c:1301)."""
    from gsrt.ops.clusters import build_tri_clusters
    if scene.tri_v0.shape[0] < 2 * k:
        return scene          # brute force beats traversal for tiny meshes
    tc = build_tri_clusters(scene.tri_v0, scene.tri_v1, scene.tri_v2,
                            scene.tri_mat, scene.tri_uv0, scene.tri_uv1,
                            scene.tri_uv2, k=k, sup=sup)
    return scene._replace(tri_clusters=tc)


def with_texture_mips(scene: PrimitiveScene) -> PrimitiveScene:
    """Attach a texture mip pyramid + per-material texel densities for
    ray-cone LOD sampling (gsrt.ops.mip). Once per scene, outside jit —
    the driver-side mip-chain upload of the reference's texture model
    (vulkan_ray_tracing.cc getTexture txl path). No-op without textures
    or UVs. The per-MATERIAL density is the mean over its triangles (a
    hit carries its material, not its triangle id — textures map 1:1 to
    materials in the OBJ loader, so the approximation is tight)."""
    if scene.textures is None or scene.tri_uv0 is None or \
            scene.materials.texture_id is None:
        return scene
    from gsrt.ops.mip import build_mip_atlas, triangle_texel_density
    mip = build_mip_atlas(scene.textures)
    dens = triangle_texel_density(
        scene.tri_v0, scene.tri_v1, scene.tri_v2,
        scene.tri_uv0, scene.tri_uv1, scene.tri_uv2, mip.base_w)
    n_mats = scene.materials.diffuse.shape[0]
    cnt = jnp.zeros((n_mats,)).at[scene.tri_mat].add(1.0)
    tot = jnp.zeros((n_mats,)).at[scene.tri_mat].add(dens)
    return scene._replace(tex_mips=mip.data,
                          mat_texel=tot / jnp.maximum(cnt, 1.0))


def _mip_from_packed(data) -> "MipAtlas":
    """Rebuild the static MipAtlas view from the packed array's shape
    (base TW = 2/3 of the packed width; all offsets follow)."""
    from gsrt.ops.mip import MipAtlas
    th = data.shape[1]
    tw = (data.shape[2] * 2) // 3
    n_levels = 1 + max(min(th, tw).bit_length() - 1, 0)
    return MipAtlas(data=data, n_levels=n_levels, base_h=th, base_w=tw)


def with_tri_table(scene: PrimitiveScene,
                   min_tris: int = 256) -> PrimitiveScene:
    """Attach the packed-cluster table driving the Pallas traversal kernel
    (gsrt.ops.tri_kernel) — the TPU production acceleration structure.
    Build ONCE per scene, outside jit (the reference's BLAS build,
    lvp_acceleration_structure.c:1301)."""
    from gsrt.ops.tri_kernel import build_tri_table
    if scene.tri_v0.shape[0] < min_tris:
        return scene          # brute force beats traversal for tiny meshes
    tt = build_tri_table(scene.tri_v0, scene.tri_v1, scene.tri_v2,
                         scene.tri_mat)
    return scene._replace(tri_table=tt)


def _tri_uv(scene, i, u, v):
    """Interpolate per-corner texcoords at barycentric (u, v); sphere-UV
    stand-in when the mesh carries none."""
    if scene.tri_uv0 is None:
        return None
    w = 1.0 - u - v
    return (w[:, None] * scene.tri_uv0[i] + u[:, None] * scene.tri_uv1[i]
            + v[:, None] * scene.tri_uv2[i])


def _barycentric(orig, dirn, v0, v1, v2):
    """Per-ray (u, v) of each ray's winning triangle — elementwise [R]
    Möller–Trumbore (one triangle per ray)."""
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = jnp.cross(dirn, e2)
    det = jnp.sum(e1 * pvec, -1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = orig - v0
    u = jnp.sum(tvec * pvec, -1) * inv_det
    v = jnp.sum(dirn * jnp.cross(tvec, e1), -1) * inv_det
    return u, v


def _closest_hit(scene: PrimitiveScene, orig, dirn, t_min, t_max,
                 tri_override=None, any_hit=False):
    """Nearest hit across all primitive types.

    any_hit=True relaxes the packed-table triangle traversal to occlusion
    semantics (first accepted hit, early block exit) — only valid for
    queries that consume `hit` alone.

    Returns (t [R], normal [R,3], mat_id [R], hit [R], uv [R,2] or None,
    ovf [] bool). uv is the texture coordinate at the hit (triangle
    texcoords when the mesh has them, equirectangular sphere UV
    otherwise). ovf reports traversal visit-list truncation (the packed
    table's plan past its static cap — the analogue of the reference's
    deliberately sized 1000-entry warp tables, intersection_table.h:42):
    True means some candidate super-clusters were dropped and the result
    may silently miss geometry — re-run with chunked rays or a larger
    cap. Always False for the analytic primitive sweeps (no static
    bound).

    tri_override: optional precomputed (t [R], tri_id [R]) for the
    triangle part — the binned primary cast (ops.tri_binning) hands its
    result in here so bounce 0 skips traversal entirely; misses are
    (+inf-class t, _ID_SENTINEL)."""
    R = orig.shape[0]
    best_t = jnp.full((R,), jnp.inf)
    best_n = jnp.zeros((R, 3))
    best_m = jnp.zeros((R,), jnp.int32)
    best_uv = jnp.zeros((R, 2)) if scene.tri_uv0 is not None else None
    ovf = jnp.zeros((), bool)

    if scene.sph_center.shape[0]:
        t = ray_sphere(orig, dirn, scene.sph_center, scene.sph_radius,
                       t_min, t_max)                     # [R,S]
        i = jnp.argmin(t, axis=-1)
        ti = jnp.take_along_axis(t, i[:, None], -1)[:, 0]
        hit_p = orig + ti[:, None] * dirn
        n = sphere_normal(hit_p, scene.sph_center[i])
        upd = ti < best_t
        best_t = jnp.where(upd, ti, best_t)
        best_n = jnp.where(upd[:, None], n, best_n)
        best_m = jnp.where(upd, scene.sph_mat[i], best_m)
        if best_uv is not None:
            best_uv = jnp.where(upd[:, None], sphere_uv(n), best_uv)

    if scene.box_min.shape[0]:
        t = ray_box(orig, dirn, scene.box_min, scene.box_max, t_min, t_max)
        i = jnp.argmin(t, axis=-1)
        ti = jnp.take_along_axis(t, i[:, None], -1)[:, 0]
        hit_p = orig + ti[:, None] * dirn
        n = box_normal(hit_p, scene.box_min[i], scene.box_max[i])
        upd = ti < best_t
        best_t = jnp.where(upd, ti, best_t)
        best_n = jnp.where(upd[:, None], n, best_n)
        best_m = jnp.where(upd, scene.box_mat[i], best_m)
        if best_uv is not None:
            best_uv = jnp.where(upd[:, None], sphere_uv(n), best_uv)

    if scene.cyl_center is not None and scene.cyl_center.shape[0]:
        from gsrt.ops.primitives import cylinder_normal, ray_cylinder
        t = ray_cylinder(orig, dirn, scene.cyl_center, scene.cyl_radius,
                         scene.cyl_half_h, t_min, t_max)      # [R,C]
        i = jnp.argmin(t, axis=-1)
        ti = jnp.take_along_axis(t, i[:, None], -1)[:, 0]
        hit_p = orig + ti[:, None] * dirn
        n = cylinder_normal(hit_p, scene.cyl_center[i],
                            scene.cyl_radius[i], scene.cyl_half_h[i])
        upd = ti < best_t
        best_t = jnp.where(upd, ti, best_t)
        best_n = jnp.where(upd[:, None], n, best_n)
        best_m = jnp.where(upd, scene.cyl_mat[i], best_m)
        if best_uv is not None:
            best_uv = jnp.where(upd[:, None], sphere_uv(n), best_uv)

    if scene.mnd_center is not None and scene.mnd_center.shape[0]:
        from gsrt.ops.primitives import mandelbulb_normal, ray_mandelbulb
        t = ray_mandelbulb(orig, dirn, scene.mnd_center, scene.mnd_radius,
                           t_min, t_max)                       # [R,M]
        i = jnp.argmin(t, axis=-1)
        ti = jnp.take_along_axis(t, i[:, None], -1)[:, 0]
        hit_p = orig + ti[:, None] * dirn
        # DE gradient at the center-relative point (the DE is evaluated
        # unscaled, exactly like the march and the reference's
        # dist(r - sc) — the radius only bounds the march)
        n = mandelbulb_normal(hit_p - scene.mnd_center[i])
        upd = ti < best_t
        best_t = jnp.where(upd, ti, best_t)
        best_n = jnp.where(upd[:, None], n, best_n)
        best_m = jnp.where(upd, scene.mnd_mat[i], best_m)
        if best_uv is not None:
            best_uv = jnp.where(upd[:, None], sphere_uv(n), best_uv)

    if tri_override is not None:
        from gsrt.ops.tri_binning import _ID_SENTINEL
        ti_raw, i = tri_override
        miss = i == _ID_SENTINEL
        i = jnp.minimum(i, scene.tri_v0.shape[0] - 1)
        ti = jnp.where(miss, jnp.inf, ti_raw)
        v0 = scene.tri_v0[i]
        v1 = scene.tri_v1[i]
        v2 = scene.tri_v2[i]
        n = triangle_normal(v0, v1, v2)
        n = jnp.where(jnp.sum(n * dirn, -1, keepdims=True) > 0, -n, n)
        upd = ti < best_t
        best_t = jnp.where(upd, ti, best_t)
        best_n = jnp.where(upd[:, None], n, best_n)
        best_m = jnp.where(upd, scene.tri_mat[i], best_m)
        if best_uv is not None:
            u, v = _barycentric(orig, dirn, v0, v1, v2)
            best_uv = jnp.where(upd[:, None], _tri_uv(scene, i, u, v),
                                best_uv)
    elif scene.tri_table is not None:
        from gsrt.ops.tri_kernel import closest_hit_packed
        tt = scene.tri_table
        ti, slot, _, plan = closest_hit_packed(tt, orig, dirn, t_min,
                                               t_max, any_hit=any_hit)
        ovf = ovf | plan.overflow
        i = tt.order[slot]
        v0 = scene.tri_v0[i]
        v1 = scene.tri_v1[i]
        v2 = scene.tri_v2[i]
        n = triangle_normal(v0, v1, v2)
        n = jnp.where(jnp.sum(n * dirn, -1, keepdims=True) > 0, -n, n)
        upd = ti < best_t
        best_t = jnp.where(upd, ti, best_t)
        best_n = jnp.where(upd[:, None], n, best_n)
        best_m = jnp.where(upd, scene.tri_mat[i], best_m)
        if best_uv is not None:
            u, v = _barycentric(orig, dirn, v0, v1, v2)
            best_uv = jnp.where(upd[:, None], _tri_uv(scene, i, u, v),
                                best_uv)
    elif scene.tri_clusters is not None:
        from gsrt.ops.clusters import closest_hit_tri_clusters
        tc = scene.tri_clusters
        ti, bc, bk, _, _, _ = closest_hit_tri_clusters(
            tc, orig, dirn, t_min, t_max)
        v0 = tc.v0[bc, bk]
        v1 = tc.v1[bc, bk]
        v2 = tc.v2[bc, bk]
        n = triangle_normal(v0, v1, v2)
        n = jnp.where(jnp.sum(n * dirn, -1, keepdims=True) > 0, -n, n)
        upd = ti < best_t
        best_t = jnp.where(upd, ti, best_t)
        best_n = jnp.where(upd[:, None], n, best_n)
        best_m = jnp.where(upd, tc.mat[bc, bk], best_m)
        if best_uv is not None:
            u, v = _barycentric(orig, dirn, v0, v1, v2)
            w = 1.0 - u - v
            uvh = (w[:, None] * tc.uv0[bc, bk] + u[:, None] * tc.uv1[bc, bk]
                   + v[:, None] * tc.uv2[bc, bk])
            best_uv = jnp.where(upd[:, None], uvh, best_uv)
    elif scene.tri_v0.shape[0]:
        t, u, v = ray_triangle(orig, dirn, scene.tri_v0, scene.tri_v1,
                               scene.tri_v2, t_min, t_max)
        i = jnp.argmin(t, axis=-1)
        ti = jnp.take_along_axis(t, i[:, None], -1)[:, 0]
        n = triangle_normal(scene.tri_v0[i], scene.tri_v1[i], scene.tri_v2[i])
        # face-forward
        n = jnp.where(jnp.sum(n * dirn, -1, keepdims=True) > 0, -n, n)
        upd = ti < best_t
        best_t = jnp.where(upd, ti, best_t)
        best_n = jnp.where(upd[:, None], n, best_n)
        best_m = jnp.where(upd, scene.tri_mat[i], best_m)
        if best_uv is not None:
            ui = jnp.take_along_axis(u, i[:, None], -1)[:, 0]
            vi = jnp.take_along_axis(v, i[:, None], -1)[:, 0]
            best_uv = jnp.where(upd[:, None], _tri_uv(scene, i, ui, vi),
                                best_uv)

    return best_t, best_n, best_m, jnp.isfinite(best_t), best_uv, ovf


def _sample_alpha(scene: PrimitiveScene, mat_id, normal, uv=None):
    """Cutout alpha at the hit (1.0 = opaque) — sampled from the alpha
    atlas via the material's texture id. Uses the hit's triangle texcoords
    when available (TraceTree.rahit samples the real foliage UVs), the
    sphere UV of the normal otherwise."""
    if scene.alpha_textures is None or scene.materials.texture_id is None:
        return jnp.ones(mat_id.shape[0])
    if uv is None:
        uv = sphere_uv(normal)
    NT, TH, TW = scene.alpha_textures.shape
    tex_id = scene.materials.texture_id[mat_id]
    t = jnp.clip(tex_id, 0, NT - 1)
    x = jnp.clip(uv[:, 0] * (TW - 1), 0, TW - 1).astype(jnp.int32)
    y = jnp.clip(uv[:, 1] * (TH - 1), 0, TH - 1).astype(jnp.int32)
    a = scene.alpha_textures[t, y, x]
    return jnp.where(tex_id >= 0, a, 1.0)


def _closest_hit_cutout(scene: PrimitiveScene, orig, dirn, t_min, t_max,
                        max_skips: int = 3):
    """Closest hit honoring alpha cutouts: hits with sampled alpha < 0.5
    are skipped by re-tracing past them (the wavefront form of the
    reference's any-hit ignore, TraceTree.rahit)."""
    if scene.alpha_textures is None:
        return _closest_hit(scene, orig, dirn, t_min, t_max)
    R = orig.shape[0]
    has_uv = scene.tri_uv0 is not None
    tmin_cur = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))[:, None]
    state0 = (tmin_cur, jnp.full((R,), jnp.inf), jnp.zeros((R, 3)),
              jnp.zeros((R,), jnp.int32), jnp.zeros((R,), bool),
              jnp.zeros((R, 2)), jnp.zeros((R,), bool),
              jnp.zeros((), bool))

    def body(state):
        i, tmin_cur, bt, bn, bm, bhit, buv, done, ovf = state
        t, n, m, hit, uv, ovf_i = _closest_hit(scene, orig, dirn, tmin_cur,
                                               t_max)
        alpha = _sample_alpha(scene, m, n, uv)
        cut = hit & (alpha < 0.5) & ~done
        settle = ~done & ~cut
        bt = jnp.where(settle, t, bt)
        bn = jnp.where(settle[:, None], n, bn)
        bm = jnp.where(settle, m, bm)
        bhit = jnp.where(settle, hit, bhit)
        if has_uv:
            buv = jnp.where(settle[:, None], uv, buv)
        done = done | settle
        tmin_cur = jnp.where(cut[:, None], t[:, None] + 1e-3, tmin_cur)
        return i + 1, tmin_cur, bt, bn, bm, bhit, buv, done, ovf | ovf_i

    # while, not fori: nearly every ray settles on iteration 1, and each
    # extra iteration re-pays a FULL scene traversal
    def cond(state):
        return (state[0] <= max_skips) & ~jnp.all(state[-2])

    _, _, bt, bn, bm, bhit, buv, done, ovf = jax.lax.while_loop(
        cond, body, (jnp.int32(0),) + state0)
    return bt, bn, bm, bhit & done, (buv if has_uv else None), ovf


def _scene_sort_bounds(scene, gauss_clusters=None):
    """(lo, hi, park_o, park_d) for coherence sorting, or (None,)*4 when no
    accelerated geometry is present (sorting only pays where traversal
    cost depends on bundle coherence). park_o/park_d are the origin and
    direction retired rays are parked at: a point outside every structure
    with all rays identical, so fully-dead blocks plan zero visits."""
    los, his = [], []
    if scene.tri_table is not None:
        los.append(scene.tri_table.sup_min.min(0))
        his.append(scene.tri_table.sup_max.max(0))
    if gauss_clusters is not None:
        los.append(gauss_clusters.clusters.sup_min.min(0))
        his.append(gauss_clusters.clusters.sup_max.max(0))
    if not los:
        return None, None, None, None
    lo = jnp.min(jnp.stack(los), axis=0)
    hi = jnp.max(jnp.stack(his), axis=0)
    park_o = hi + (hi - lo) + 1.0
    park_d = jnp.full((3,), 1.0 / jnp.sqrt(3.0), jnp.float32)
    return lo, hi, park_o, park_d


def _coherence_perm(orig, dirn, live, lo, hi):
    """Wavefront coherence sort: rays grouped by origin Morton cell
    (18 bits — a 64³ grid over the scene) then direction Morton code
    (9 bits), retired rays last. The TPU analogue of the simulator's ray
    coherency engine (ray_coherency_engine.cc) — consecutive-rb blocks of
    the sorted order get tight origin boxes and direction cones, which is
    exactly what plan_visits' interval + cone culling needs to go
    log-depth on bounce waves. Returns (perm, inv)."""
    from gsrt.ops.morton import morton3d
    R = orig.shape[0]
    om = morton3d(orig, lo, hi) >> jnp.uint32(12)          # 18 bits
    dm = morton3d(dirn, -jnp.ones(3), jnp.ones(3)) >> jnp.uint32(21)
    key = ((om << jnp.uint32(9)) | dm).astype(jnp.int32)
    key = jnp.where(live, key, jnp.int32(0x7FFFFFFF))
    perm = jnp.argsort(key)
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(R, dtype=perm.dtype))
    return perm, inv


def _any_hit(scene: PrimitiveScene, orig, dirn, t_min, t_max, live=None,
             sort: bool = True):
    """Occlusion query (shadow/AO rays) — any-hit traversal semantics.

    live (optional [R] bool): rays whose answer is unused (their pixel
    missed, or the query is pre-decided). They are parked outside the
    scene so traversal plans nothing for their blocks.

    sort: coherence-sort the wavefront first. Pays for AO bundles (random
    per-pixel hemisphere directions — the regime where unsorted
    consecutive-rb blocks degrade to a near-linear super-cluster sweep)
    but NOT for shadow bundles: their origins are the primary hit points
    in screen order (already origin-coherent) and their directions all
    point at one light, so the sort is overhead with nothing to fix
    (round-3 lumibench: SH on the small scenes regressed 36->60 ms with
    sorting while AO still gained)."""
    if scene.tri_table is not None:
        lo, hi, park_o, park_d = _scene_sort_bounds(scene)
        if live is None:
            live = jnp.ones((orig.shape[0],), bool)
        if sort:
            perm, inv = _coherence_perm(orig, dirn, live, lo, hi)
            live_s = live[perm]
            o_s = jnp.where(live_s[:, None], orig[perm], park_o)
            d_s = jnp.where(live_s[:, None], dirn[perm], park_d)
            tb = t_max[perm] if getattr(t_max, "ndim", 0) >= 1 else t_max
            t, _, _, hit, _, ovf = _closest_hit(scene, o_s, d_s, t_min, tb,
                                                any_hit=True)
            return hit[inv], ovf
        o_s = jnp.where(live[:, None], orig, park_o)
        d_s = jnp.where(live[:, None], dirn, park_d)
        t, _, _, hit, _, ovf = _closest_hit(scene, o_s, d_s, t_min, t_max,
                                            any_hit=True)
        return hit, ovf
    t, _, _, hit, _, ovf = _closest_hit(scene, orig, dirn, t_min, t_max)
    return hit, ovf


def _random_unit(key, shape):
    v = jax.random.normal(key, shape)
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)


def _random_in_unit_disk(key, n):
    k1, k2 = jax.random.split(key)
    r = jnp.sqrt(jax.random.uniform(k1, (n,)))
    th = jax.random.uniform(k2, (n,)) * 2 * jnp.pi
    return jnp.stack([r * jnp.cos(th), r * jnp.sin(th)], -1)


def _reflect(d, n):
    return d - 2.0 * jnp.sum(d * n, -1, keepdims=True) * n


def _refract(d, n, eta):
    """glsl refract(); returns 0 on total internal reflection."""
    cos_i = -jnp.sum(d * n, -1, keepdims=True)
    k = 1.0 - eta ** 2 * (1.0 - cos_i ** 2)
    refr = eta * d + (eta * cos_i - jnp.sqrt(jnp.maximum(k, 0.0))) * n
    return jnp.where(k >= 0, refr, 0.0)


def _schlick(cosine, ref_idx):
    r0 = ((1 - ref_idx) / (1 + ref_idx)) ** 2
    return r0 + (1 - r0) * (1 - cosine) ** 5


def _sky(dirn, has_sky):
    """RayTracing.rmiss:13-24."""
    t = 0.5 * (dirn[:, 1] / jnp.maximum(
        jnp.linalg.norm(dirn, axis=-1), 1e-9) + 1.0)
    sky = (1 - t[:, None]) * jnp.ones(3) + t[:, None] * jnp.array([0.5, 0.7, 1.0])
    return jnp.where(has_sky, sky, jnp.zeros_like(sky))


def _scatter(key, mats: Materials, mat_id, dirn, normal, hit_p,
             tex_color=None):
    """All four scatter models evaluated dense + masked select
    (Scatter.glsl:15-81). tex_color [R,3] multiplies the diffuse albedo
    (Scatter.glsl texColor). Returns (attenuation [R,3], new_dir [R,3],
    scattered [R] bool, emitted [R] bool)."""
    R = dirn.shape[0]
    model = mats.model[mat_id]
    diffuse = mats.diffuse[mat_id]
    if tex_color is not None:
        diffuse = diffuse * tex_color
    fuzz = mats.fuzziness[mat_id]
    ref_idx = mats.refraction_index[mat_id]
    d = dirn / jnp.maximum(jnp.linalg.norm(dirn, -1, keepdims=True), 1e-9)

    k1, k2, k3 = jax.random.split(key, 3)
    rand_unit = _random_unit(k1, (R, 3))

    # lambertian (Scatter.glsl:15-23)
    lam_dir = normal + rand_unit
    lam_scattered = jnp.sum(d * normal, -1) < 0

    # metallic (:26-36)
    refl = _reflect(d, normal)
    met_dir = refl + fuzz[:, None] * rand_unit
    met_scattered = jnp.sum(refl * normal, -1) > 0

    # dielectric (:39-54)
    dn = jnp.sum(d * normal, -1, keepdims=True)
    outward = jnp.where(dn > 0, -normal, normal)
    eta = jnp.where(dn[:, 0] > 0, ref_idx, 1.0 / ref_idx)
    cosine = jnp.where(dn[:, 0] > 0, ref_idx * dn[:, 0], -dn[:, 0])
    refr = _refract(d, outward, eta[:, None])
    tir = jnp.sum(refr * refr, -1) == 0
    reflect_prob = jnp.where(tir, 1.0, _schlick(cosine, ref_idx))
    die_reflects = jax.random.uniform(k2, (R,)) < reflect_prob
    die_dir = jnp.where(die_reflects[:, None], _reflect(d, normal), refr)

    # select by material model
    is_lam = model == Materials.LAMBERTIAN
    is_met = model == Materials.METALLIC
    is_die = model == Materials.DIELECTRIC
    is_iso = model == Materials.ISOTROPIC
    is_light = model == Materials.DIFFUSE_LIGHT

    new_dir = jnp.where(is_lam[:, None], lam_dir,
               jnp.where(is_met[:, None], met_dir,
                jnp.where(is_die[:, None], die_dir, rand_unit)))
    die_color = (jnp.ones(3) if tex_color is None else tex_color)
    atten = jnp.where(is_die[:, None], die_color, diffuse)
    scattered = jnp.where(is_lam, lam_scattered,
                 jnp.where(is_met, met_scattered,
                  jnp.where(is_die | is_iso, True, False)))
    return atten, new_dir, scattered & ~is_light, is_light


def generate_camera_rays(key, camera: Camera, cfg: RenderConfig,
                         aperture: float = 0.0, focus: float = 1.0):
    """Jittered primary rays with thin-lens defocus
    (RayTracing.rgen:39-45, +z-forward convention)."""
    H, W = camera.height, camera.width
    R = H * W
    ys, xs = jnp.mgrid[0:H, 0:W]
    pix = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(jnp.float32)
    k1, k2 = jax.random.split(key)
    jitter = jax.random.uniform(k1, (R, 2))
    p = pix + jitter
    # camera-space direction through the pixel
    dx = (p[:, 0] - camera.cx) / camera.fx
    dy = (p[:, 1] - camera.cy) / camera.fy
    target = jnp.stack([dx * focus, dy * focus, jnp.full((R,), focus)], -1)
    lens = (aperture * 0.5) * _random_in_unit_disk(k2, R)
    offset = jnp.stack([lens[:, 0], lens[:, 1], jnp.zeros(R)], -1)
    d_cam = target - offset
    d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
    c2w = jnp.linalg.inv(camera.view)
    orig = (c2w[:3, :3] @ offset.T).T + c2w[:3, 3]
    dirn = (c2w[:3, :3] @ d_cam.T).T
    return orig, dirn


def render_path_traced(scene: PrimitiveScene, camera: Camera,
                       cfg: RenderConfig, seed: int = 0,
                       aperture: float = 0.0, focus: float = 1.0,
                       gaussians=None, gauss_clusters=None,
                       gauss_s_max: int = 48, gauss_rb: int = 256,
                       primary_impl: str = "auto",
                       tri_max_pairs: int = 1 << 20,
                       tri_span_exact: bool = False,
                       sort_bounces: bool = True,
                       return_flags: bool = False,
                       interpret: bool | None = None):
    """Full path trace: [H,W,3] linear color (sqrt-gamma'd if configured,
    RayTracing.rgen:87-93).

    return_flags=True returns (img, flags) where flags carries the static
    -buffer truncation booleans every production path computes:
    "tri_visits_overflow" (packed-table visit list past its cap),
    "gauss_visits_overflow" (clustered-splat s_max), and
    "binned_pairs_overflow" (tri_max_pairs, when the binned primary
    ran). A True flag means the image may silently miss geometry — grow
    the bound and re-render (render_path_traced_calibrated does this
    automatically).

    sort_bounces: coherence-sort each bounce wavefront (origin Morton cell
    + direction code) and park retired rays outside the scene before
    traversal — output-identical (results are unsorted back), but bounce
    waves trace in tight bundles and dead blocks cost nothing. Applies
    when accelerated structures are present (tri_table/gauss_clusters).

    gaussians: optional GaussianCloud coexisting with the primitive scene —
    the reference's mixed TLAS where splat BLASes (hit group 4) share the
    scene with triangles and procedurals (Application.cpp:253-398). Every
    bounce segment composites through the cloud: splat in-scatter is added
    and the segment's transmittance attenuates the throughput, so splats
    are seen by primary, reflected and refracted rays alike.

    gauss_clusters: optional prebuilt SplatClusters
    (ops.splat_clusters.build_splat_clusters, the splat-BLAS analogue;
    build once per scene outside jit) — bounce segments then trace through
    visited clusters only instead of O(R·N) over the whole cloud.
    gauss_s_max bounds candidate super-clusters per gauss_rb-ray block;
    blocks past it silently drop the Morton-latest clusters (size it from
    plan_visits on a probe bundle, the max_pairs calibration pattern).

    primary_impl="binned": bounce-0 triangle hits come from the
    screen-tile binned cast (ops.tri_binning — the rasterizer-shaped
    primary path) instead of traversal; requires aperture == 0, no alpha
    cutouts, and a triangle scene. tri_max_pairs sizes its static pair
    buffer (truncates past it — size with slack)."""
    from gsrt.models.gaussian_rt import trace_gaussian_rays
    from gsrt.ops.sh import eval_sh
    from gsrt.ops.splat_clusters import trace_gaussian_rays_clustered

    H, W = camera.height, camera.width
    R = H * W
    key = jax.random.PRNGKey(seed)

    gauss_colors = None
    if gaussians is not None and gauss_clusters is None:
        vdirs = gaussians.means - camera.position[None, :]
        vdirs = vdirs / jnp.maximum(
            jnp.linalg.norm(vdirs, axis=-1, keepdims=True), 1e-9)
        gauss_colors = eval_sh(gaussians.sh, vdirs,
                               min(cfg.sh_degree, gaussians.sh_degree))
    has_gauss = gaussians is not None or gauss_clusters is not None

    tri_binning = None
    primary_impl = _resolve_primary(primary_impl, scene, aperture)
    if primary_impl == "binned":
        from gsrt.ops.tri_binning import build_tri_binning, cast_primary
        assert aperture == 0.0, "binned primary needs a shared ray origin"
        assert scene.alpha_textures is None, \
            "binned primary does not run any-hit cutouts"
        assert scene.tri_v0.shape[0] > 0, "binned primary needs triangles"
        tri_binning = build_tri_binning(
            scene.tri_v0, scene.tri_v1, scene.tri_v2, camera,
            tile_w=cfg.tile_w, tile_h=cfg.tile_h, max_pairs=tri_max_pairs,
            span_exact=tri_span_exact)

    sort_lo, sort_hi, park_o, park_d = (
        _scene_sort_bounds(scene, gauss_clusters)
        if sort_bounces else (None,) * 4)

    def one_sample(key):
        kr, kb = jax.random.split(key)
        orig, dirn = generate_camera_rays(kr, camera, cfg, aperture, focus)
        ray_color = jnp.ones((R, 3))
        out_color = jnp.zeros((R, 3))
        active = jnp.ones((R,), bool)

        def gauss_segment(o, d, seg_tmax):
            if gauss_clusters is not None:
                g_trans, g_color, _, g_ovf = trace_gaussian_rays_clustered(
                    gauss_clusters, o, d, cfg, t_max=seg_tmax,
                    rb=gauss_rb, s_max=gauss_s_max)
            else:
                g_trans, g_color, _ = trace_gaussian_rays(
                    gaussians, o, d, cfg, colors=gauss_colors,
                    t_max=seg_tmax)
                g_ovf = jnp.zeros((), bool)
            return g_trans, g_color, g_ovf

        def bounce(b, state, tri_override=None):
            (key, orig, dirn, ray_color, out_color, active,
             ovf_tri, ovf_gauss) = state
            key, ks = jax.random.split(key)
            g_trans = g_color = None
            g_ovf = jnp.zeros((), bool)
            if tri_override is not None:
                t, n, mat, hit, uv, ovf = _closest_hit(
                    scene, orig, dirn, cfg.t_min, cfg.t_max,
                    tri_override=tri_override)
                if has_gauss:
                    g_trans, g_color, g_ovf = gauss_segment(
                        orig, dirn, jnp.where(hit, t, cfg.t_max))
            elif sort_lo is not None:
                # coherence-sort the wavefront: bounce directions are
                # scattered, so consecutive-rb blocks of screen order have
                # no bounding cone and traversal degrades to a near-linear
                # super-cluster sweep (round-2 lumibench: 287 visited
                # supers/block on blender_2_77). Sorting by origin cell +
                # direction code restores the tight bundles plan_visits
                # culls on, and parking retired rays makes dead blocks
                # free — traversal cost tracks the LIVE wavefront.
                perm, inv = _coherence_perm(orig, dirn, active,
                                            sort_lo, sort_hi)
                act_s = active[perm]
                o_s = jnp.where(act_s[:, None], orig[perm], park_o)
                d_s = jnp.where(act_s[:, None], dirn[perm], park_d)
                t, n, mat, hit, uv, ovf = _closest_hit_cutout(
                    scene, o_s, d_s, cfg.t_min, cfg.t_max)
                if has_gauss:
                    g_trans, g_color, g_ovf = gauss_segment(
                        o_s, d_s, jnp.where(hit, t, cfg.t_max))
                    g_trans, g_color = g_trans[inv], g_color[inv]
                t, n, mat, hit = t[inv], n[inv], mat[inv], hit[inv]
                if uv is not None:
                    uv = uv[inv]
            else:
                t, n, mat, hit, uv, ovf = _closest_hit_cutout(
                    scene, orig, dirn, cfg.t_min, cfg.t_max)
                if has_gauss:
                    g_trans, g_color, g_ovf = gauss_segment(
                        orig, dirn, jnp.where(hit, t, cfg.t_max))

            if has_gauss:
                # composite the bounce segment through the splat medium:
                # radiance toward the segment origin = splat in-scatter +
                # T_gauss * (surface/sky term); throughput picks up T_gauss
                out_color = out_color + jnp.where(
                    active[:, None], ray_color * g_color, 0.0)
                ray_color = jnp.where(active[:, None],
                                      ray_color * g_trans[:, None],
                                      ray_color)

            # miss → sky, terminate (rmiss)
            sky = _sky(dirn, cfg.has_sky)
            miss_now = active & ~hit
            out_color = out_color + jnp.where(
                miss_now[:, None], ray_color * sky, 0.0)

            tex_color = None
            if scene.textures is not None and \
                    scene.materials.texture_id is not None:
                if uv is None:
                    uv = sphere_uv(n)
                tid = scene.materials.texture_id[mat]
                if scene.tex_mips is not None and \
                        scene.mat_texel is not None:
                    # ray-cone LOD from THIS segment's hit distance (the
                    # pre-bounce spread is ignored — the usual secondary-
                    # ray simplification); cone angle = one pixel = 1/fy
                    from gsrt.ops.mip import (ray_cone_lod,
                                              sample_texture_lod)
                    mip = _mip_from_packed(scene.tex_mips)
                    lod = ray_cone_lod(t, 1.0 / camera.fy,
                                       scene.mat_texel[mat])
                    tex_color = sample_texture_lod(mip, tid, uv, lod)
                else:
                    tex_color = sample_texture(scene.textures, tid, uv)

            atten, new_dir, scattered, is_light = _scatter(
                ks, scene.materials, mat, dirn, n,
                orig + t[:, None] * dirn, tex_color)
            # light hit → emit, terminate (Scatter.glsl:57-63 + rgen:69-77)
            light_now = active & hit & is_light
            out_color = out_color + jnp.where(
                light_now[:, None],
                ray_color * scene.materials.diffuse[mat], 0.0)

            ray_color = jnp.where((active & hit)[:, None],
                                  ray_color * atten, ray_color)
            hit_p = orig + t[:, None] * dirn
            orig = jnp.where(hit[:, None], hit_p, orig)
            dirn = jnp.where(hit[:, None], new_dir, dirn)
            active = active & hit & scattered
            return (key, orig, dirn, ray_color, out_color, active,
                    ovf_tri | ovf, ovf_gauss | g_ovf)

        state = (kb, orig, dirn, ray_color, out_color, active,
                 jnp.zeros((), bool), jnp.zeros((), bool))
        if tri_binning is not None:
            from gsrt.ops.tri_binning import cast_primary
            t_bin, id_bin = cast_primary(
                tri_binning, dirn, camera.position,
                width=W, height=H, tile_w=cfg.tile_w, tile_h=cfg.tile_h,
                t_min=cfg.t_min, t_max=cfg.t_max, interpret=interpret)
            state = bounce(0, state,
                           tri_override=(t_bin.reshape(-1),
                                         id_bin.reshape(-1)))
            state = jax.lax.fori_loop(1, cfg.bounces, bounce, state)
        else:
            state = jax.lax.fori_loop(0, cfg.bounces, bounce, state)
        # rays exceeding the bounce limit gather no light (rgen:56-60)
        return state[4], state[6], state[7]

    keys = jax.random.split(key, cfg.samples)
    color, ovf_tri_s, ovf_gauss_s = jax.lax.map(one_sample, keys)
    color = jnp.mean(color, axis=0)
    if cfg.gamma_correction:
        color = jnp.sqrt(jnp.clip(color, 0.0, 1.0))
    img = color.reshape(H, W, 3)
    if return_flags:
        flags = {"tri_visits_overflow": jnp.any(ovf_tri_s),
                 "gauss_visits_overflow": jnp.any(ovf_gauss_s),
                 "binned_pairs_overflow":
                     tri_binning.overflow if tri_binning is not None
                     else jnp.zeros((), bool)}
        return img, flags
    return img


def render_path_traced_calibrated(scene: PrimitiveScene, camera: Camera,
                                  cfg: RenderConfig, *,
                                  gauss_s_max: int = 48,
                                  tri_max_pairs: int = 1 << 20,
                                  max_retries: int = 2,
                                  growth: float = 2.0,
                                  **kw):
    """Calibrate-and-re-render around render_path_traced's static buffer
    bounds — the PT-path mirror of GaussianRayTracer.__call__'s
    overflow-driven re-render (gaussian_rt.py). The reference sizes its
    warp tables deliberately and permanently (intersection_table.h:42);
    on TPU the bounds are compile-time, so a truncated render costs one
    recompile at a grown bound instead of a silently wrong image.

    Grows tri_max_pairs on binned-pair overflow and gauss_s_max on
    clustered-splat visit overflow. tri-visit overflow (only reachable
    past the packed kernel's ~4M visit cap) cannot be grown here — it is
    reported in the returned info for the caller to chunk rays.

    Returns (img, info): info carries the final sizes, retry count and
    the last flags (all concrete Python values — this wrapper
    synchronizes with the device and must run OUTSIDE jit)."""
    retries = 0
    while True:
        img, flags = render_path_traced(
            scene, camera, cfg, gauss_s_max=gauss_s_max,
            tri_max_pairs=tri_max_pairs, return_flags=True, **kw)
        concrete = {k: bool(v) for k, v in flags.items()}
        grow_pairs = concrete.get("binned_pairs_overflow", False)
        grow_smax = concrete.get("gauss_visits_overflow", False)
        if not (grow_pairs or grow_smax) or retries >= max_retries:
            return img, {"retries": retries, "gauss_s_max": gauss_s_max,
                         "tri_max_pairs": tri_max_pairs, "flags": concrete}
        if grow_pairs:
            tri_max_pairs = int(tri_max_pairs * growth)
        if grow_smax:
            gauss_s_max = max(int(gauss_s_max * growth), gauss_s_max + 8)
        retries += 1


def render_foveated(scene: PrimitiveScene, camera: Camera,
                    cfg: RenderConfig, seed: int = 0,
                    rings=(15, 40), ring_samples=(16, 8, 1),
                    aperture: float = 0.0, focus: float = 1.0,
                    **pt_kwargs):
    """TraceFoveated.rgen semantics (:29-51): per-pixel sample count by
    radius from the image center — 16 spp inside `rings[0]` px, 8 spp inside
    `rings[1]` px, 1 spp outside. Computed as a full max-spp wavefront with
    per-pixel sample masks (output-equivalent; TPU lanes are dense either
    way)."""
    H, W = camera.height, camera.width
    ys, xs = jnp.mgrid[0:H, 0:W]
    r = jnp.sqrt((xs - W / 2.0) ** 2 + (ys - H / 2.0) ** 2).astype(jnp.int32)
    spp = jnp.where(r > rings[1], ring_samples[2],
                    jnp.where(r > rings[0], ring_samples[1],
                              ring_samples[0])).reshape(-1)

    max_spp = max(ring_samples)
    acc = jnp.zeros((H * W, 3))
    cfg1 = cfg.replace(samples=1, gamma_correction=False)
    for s in range(max_spp):
        img = render_path_traced(scene, camera, cfg1,
                                 seed=seed * max_spp + s,
                                 aperture=aperture, focus=focus,
                                 **pt_kwargs)
        use = (s < spp)[:, None]
        acc = acc + jnp.where(use, img.reshape(-1, 3), 0.0)
    out = (acc / spp[:, None]).reshape(H, W, 3)
    if cfg.gamma_correction:  # gamma applies after accumulation (rgen:90-93)
        out = jnp.sqrt(jnp.clip(out, 0.0, 1.0))
    return out


def _resolve_primary(primary_impl: str, scene, aperture: float = 0.0) -> str:
    """primary_impl="auto" → "binned" whenever the screen-tile cast
    applies (shared ray origin, no any-hit cutouts, a triangle scene),
    else "block". Binned measured 1.5-2.8x faster than block traversal on
    the reference OBJ scenes (tools/tri_bench.py, v5e 2026-08-18:
    trees_and_grass 5.5 vs 8.3 ms, blender_2_77 29.8 vs 83.0 ms)."""
    if primary_impl != "auto":
        return primary_impl
    ok = (aperture == 0.0 and scene.alpha_textures is None
          and int(scene.tri_v0.shape[0]) > 0)
    return "binned" if ok else "block"


def _binned_primary(scene, camera, cfg, dirn, tri_max_pairs, interpret,
                    span_exact: bool = False):
    """Build + run the screen-tile primary cast for one camera bundle;
    returns ((t, tri_id) override for _closest_hit, pair-buffer overflow
    flag — True means tri_max_pairs truncated the binned pair list and
    the primary hits may silently miss geometry)."""
    from gsrt.ops.tri_binning import build_tri_binning, cast_primary
    assert scene.tri_v0.shape[0] > 0, "binned primary needs triangles"
    binning = build_tri_binning(
        scene.tri_v0, scene.tri_v1, scene.tri_v2, camera,
        tile_w=cfg.tile_w, tile_h=cfg.tile_h, max_pairs=tri_max_pairs,
        span_exact=span_exact)
    t_bin, id_bin = cast_primary(
        binning, dirn, camera.position, width=camera.width,
        height=camera.height, tile_w=cfg.tile_w, tile_h=cfg.tile_h,
        t_min=cfg.t_min, t_max=cfg.t_max, interpret=interpret)
    return (t_bin.reshape(-1), id_bin.reshape(-1)), binning.overflow


def render_shadow_rays(scene: PrimitiveScene, camera: Camera,
                       cfg: RenderConfig, light_pos, light_radius=0.5,
                       seed: int = 0, primary_impl: str = "auto",
                       tri_max_pairs: int = 1 << 20,
                       tri_span_exact: bool = False,
                       return_flags: bool = False,
                       interpret: bool | None = None):
    """TraceShadow.rgen semantics: primary hit, then `shadow_rays` rays
    toward points on the light sphere; shade = diffuse·visibility.
    primary_impl="binned" routes the primary segment through the
    screen-tile cast (ops.tri_binning). return_flags=True returns
    (img, flags) with the truncation booleans (see render_path_traced)."""
    H, W = camera.height, camera.width
    key = jax.random.PRNGKey(seed)
    orig, dirn = generate_camera_rays(key, camera, cfg)
    primary_impl = _resolve_primary(primary_impl, scene)
    tri_ov, pairs_ovf = None, jnp.zeros((), bool)
    if primary_impl == "binned":
        tri_ov, pairs_ovf = _binned_primary(
            scene, camera, cfg, dirn, tri_max_pairs, interpret,
            span_exact=tri_span_exact)
    t, n, mat, hit, _, ovf = _closest_hit(
        scene, orig, dirn, cfg.t_min, cfg.t_max, tri_override=tri_ov)
    hit_p = orig + t[:, None] * dirn + 1e-3 * n
    vis = jnp.zeros((orig.shape[0],))
    for s in range(cfg.shadow_rays):
        ks = jax.random.fold_in(key, s + 1)
        # reference quirk kept intentionally: the target samples the FULL
        # light sphere and nothing excludes the emitter's own geometry, so
        # targets behind the light surface read occluded
        # (TraceShadow.rgen:77-90 traces to tMax = |light - point| with no
        # light-material filter)
        target = jnp.asarray(light_pos) + light_radius * _random_unit(
            ks, (orig.shape[0], 3))
        ld = target - hit_p
        dist = jnp.linalg.norm(ld, axis=-1, keepdims=True)
        ld = ld / jnp.maximum(dist, 1e-9)
        # per-ray t_max broadcasts [R,1] against [R,P] primitive tests;
        # rays INTO the surface count occluded without tracing
        # (TraceShadow.rgen:85 "Only accept shadow rays away from surface")
        below = jnp.sum(ld * n, axis=-1) <= 0
        # rays from missed pixels or into the surface are pre-decided —
        # park them (live=False) so traversal plans nothing for them
        occ_s, ovf_s = _any_hit(scene, hit_p, ld, cfg.t_min,
                                dist - 1e-2, live=hit & ~below,
                                sort=False)
        occluded = below | occ_s
        ovf = ovf | ovf_s
        vis = vis + jnp.where(occluded, 0.0, 1.0)
    vis = vis / max(cfg.shadow_rays, 1)
    ndl = jnp.maximum(jnp.sum(n * (jnp.asarray(light_pos) - hit_p), -1), 0.0)
    ndl = ndl / jnp.maximum(jnp.linalg.norm(
        jnp.asarray(light_pos) - hit_p, axis=-1), 1e-9)
    albedo = scene.materials.diffuse[mat]
    color = jnp.where(hit[:, None], albedo * (0.1 + 0.9 * vis * ndl)[:, None],
                      _sky(dirn, cfg.has_sky))
    img = color.reshape(H, W, 3)
    if return_flags:
        return img, {"tri_visits_overflow": ovf,
                     "binned_pairs_overflow": pairs_ovf}
    return img


def render_ambient_occlusion(scene: PrimitiveScene, camera: Camera,
                             cfg: RenderConfig, seed: int = 0,
                             ao_radius: float = 2.0,
                             primary_impl: str = "auto",
                             tri_max_pairs: int = 1 << 20,
                             tri_span_exact: bool = False,
                             return_flags: bool = False,
                             interpret: bool | None = None):
    """TraceAO.rgen semantics: primary hit + `ao_rays` occlusion rays,
    UNIFORM over the normal's hemisphere with limited tMax (the reference
    flips a uniform unit-sphere sample into the hemisphere,
    TraceAO.rgen:66-70 — deliberately not cosine-weighted).
    primary_impl="binned" routes the primary segment through the
    screen-tile cast (ops.tri_binning). return_flags=True returns
    (img, flags) with the truncation booleans (see render_path_traced)."""
    H, W = camera.height, camera.width
    key = jax.random.PRNGKey(seed)
    orig, dirn = generate_camera_rays(key, camera, cfg)
    primary_impl = _resolve_primary(primary_impl, scene)
    tri_ov, pairs_ovf = None, jnp.zeros((), bool)
    if primary_impl == "binned":
        tri_ov, pairs_ovf = _binned_primary(
            scene, camera, cfg, dirn, tri_max_pairs, interpret,
            span_exact=tri_span_exact)
    t, n, mat, hit, _, ovf = _closest_hit(
        scene, orig, dirn, cfg.t_min, cfg.t_max, tri_override=tri_ov)
    hit_p = orig + t[:, None] * dirn + 1e-3 * n
    occ = jnp.zeros((orig.shape[0],))
    for s in range(cfg.ao_rays):
        ks = jax.random.fold_in(key, s + 1)
        d = _random_unit(ks, (orig.shape[0], 3))
        d = jnp.where(jnp.sum(d * n, -1, keepdims=True) < 0, -d, d)
        blocked, ovf_s = _any_hit(scene, hit_p, d, cfg.t_min, ao_radius,
                                  live=hit)
        occ = occ + jnp.where(blocked, 1.0, 0.0)
        ovf = ovf | ovf_s
    ao = 1.0 - occ / max(cfg.ao_rays, 1)
    color = jnp.where(hit[:, None], ao[:, None] * jnp.ones(3),
                      _sky(dirn, cfg.has_sky))
    img = color.reshape(H, W, 3)
    if return_flags:
        return img, {"tri_visits_overflow": ovf,
                     "binned_pairs_overflow": pairs_ovf}
    return img
