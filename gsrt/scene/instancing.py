"""Instancing: replicate shared geometry under per-instance transforms.

The reference's TLAS holds one instance per BLAS with a 3x4 transform
(RayTracing/Application.cpp:325-357; the simulator transforms rays
world→object per instance leaf, vulkan_ray_tracing.cc:705-760). On TPU the
scenes are static SoA, so instancing is resolved at scene build: geometry is
replicated with transforms applied (bakes the TLAS flat — one level, no
per-ray transforms on the hot path, which is the right trade for dense
batched traversal). Memory-lean lazy instancing stays a roadmap item.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from gsrt.core.types import GaussianCloud
from gsrt.models.path_tracer import PrimitiveScene


def make_transform(translate=(0, 0, 0), rotate_y_deg: float = 0.0,
                   scale: float = 1.0) -> np.ndarray:
    """[3,4] affine: scale → rotate about y → translate (the composition
    the reference scenes use, e.g. SceneList.cpp:296-300)."""
    a = np.radians(rotate_y_deg)
    c, s = np.cos(a), np.sin(a)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32) * scale
    T = np.zeros((3, 4), np.float32)
    T[:, :3] = R
    T[:, 3] = translate
    return T


def _apply(T: np.ndarray, pts: np.ndarray) -> np.ndarray:
    return pts @ T[:, :3].T + T[:, 3]


def _is_axis_aligned(R: np.ndarray, tol: float = 1e-6) -> bool:
    """True if the linear part maps axes onto (possibly scaled/permuted/
    flipped) axes — i.e. exactly one nonzero entry per row/column."""
    nz = np.abs(R) > tol * max(np.abs(R).max(), 1e-12)
    return bool((nz.sum(0) == 1).all() and (nz.sum(1) == 1).all())


# 12 triangles of a box from its 8 corners (corner index bit m: 1=x hi,
# 2=y hi, 4=z hi), outward winding.
_BOX_TRI_IDX = np.array([
    [0, 2, 1], [1, 2, 3],   # z lo
    [4, 5, 6], [5, 7, 6],   # z hi
    [0, 1, 4], [1, 5, 4],   # y lo
    [2, 6, 3], [3, 6, 7],   # y hi
    [0, 4, 2], [2, 4, 6],   # x lo
    [1, 3, 5], [3, 7, 5],   # x hi
], np.int32)


def _box_to_triangles(corners: np.ndarray, mats: np.ndarray):
    """corners [B,8,3] → triangle soup (v0,v1,v2 [B*12,3], mat [B*12])."""
    v0 = corners[:, _BOX_TRI_IDX[:, 0], :].reshape(-1, 3)
    v1 = corners[:, _BOX_TRI_IDX[:, 1], :].reshape(-1, 3)
    v2 = corners[:, _BOX_TRI_IDX[:, 2], :].reshape(-1, 3)
    vm = np.repeat(mats, 12)
    return v0, v1, v2, vm


def instantiate_scene(scene: PrimitiveScene,
                      transforms: Sequence[np.ndarray]) -> PrimitiveScene:
    """Replicate every primitive of `scene` once per transform."""
    has_uv = scene.tri_uv0 is not None
    has_cyl = scene.cyl_center is not None and scene.cyl_center.shape[0]
    has_mnd = scene.mnd_center is not None and scene.mnd_center.shape[0]
    sph_c, sph_r, sph_m = [], [], []
    box_lo, box_hi, box_m = [], [], []
    cyl_c, cyl_r, cyl_h, cyl_m = [], [], [], []
    mnd_c, mnd_r, mnd_m = [], [], []
    t0s, t1s, t2s, tms = [], [], [], []
    uv0s, uv1s, uv2s = [], [], []
    for T in transforms:
        T = np.asarray(T, np.float32)
        # |det|: reflections (det < 0) preserve sizes; non-uniform scale is
        # approximated by the geometric mean (spheres stay spheres)
        uniform_scale = float(np.cbrt(abs(np.linalg.det(T[:, :3]))))
        if scene.sph_center.shape[0]:
            sph_c.append(_apply(T, np.asarray(scene.sph_center)))
            sph_r.append(np.asarray(scene.sph_radius) * uniform_scale)
            sph_m.append(np.asarray(scene.sph_mat))
        if scene.box_min.shape[0]:
            lo = np.asarray(scene.box_min)
            hi = np.asarray(scene.box_max)
            corners = np.stack([
                np.stack([np.where(m & 1, hi[:, 0], lo[:, 0]),
                          np.where(m & 2, hi[:, 1], lo[:, 1]),
                          np.where(m & 4, hi[:, 2], lo[:, 2])], -1)
                for m in range(8)], 1)                 # [B, 8, 3]
            tc = _apply(T, corners.reshape(-1, 3)).reshape(-1, 8, 3)
            if _is_axis_aligned(T[:, :3]):
                # axis-aligned transform: the box stays a box
                box_lo.append(tc.min(1))
                box_hi.append(tc.max(1))
                box_m.append(np.asarray(scene.box_mat))
            else:
                # rotated boxes can't be represented by an AABB (ray_box
                # renders the AABB as real geometry) — emit 12 triangles
                # per box instead, matching the reference where rotated
                # boxes are triangle models (SceneList.cpp CornellBox
                # boxes are meshes, not procedural AABBs)
                v0, v1, v2, vm = _box_to_triangles(
                    tc, np.asarray(scene.box_mat))
                t0s.append(v0)
                t1s.append(v1)
                t2s.append(v2)
                tms.append(vm)
                if has_uv:   # keep uv arrays aligned with the tri soup
                    z = np.zeros((v0.shape[0], 2), np.float32)
                    uv0s.append(z)
                    uv1s.append(z)
                    uv2s.append(z)
        if has_cyl:
            # cylinders are y-axis-aligned geometry: the linear part must
            # preserve the y axis (up to sign/scale) or the instanced
            # cylinder would render with the wrong axis
            col_y = T[:, :3] @ np.array([0.0, 1.0, 0.0], np.float32)
            assert abs(col_y[0]) < 1e-5 and abs(col_y[2]) < 1e-5, \
                "cylinder instancing requires a y-axis-preserving transform"
            cyl_c.append(_apply(T, np.asarray(scene.cyl_center)))
            cyl_r.append(np.asarray(scene.cyl_radius) * uniform_scale)
            cyl_h.append(np.asarray(scene.cyl_half_h) * abs(float(col_y[1])))
            cyl_m.append(np.asarray(scene.cyl_mat))
        if has_mnd:
            # the DE shape's orientation is baked (45°-about-z pre-rotation
            # in mandelbulb_de); transforms move/scale only its bound
            mnd_c.append(_apply(T, np.asarray(scene.mnd_center)))
            mnd_r.append(np.asarray(scene.mnd_radius) * uniform_scale)
            mnd_m.append(np.asarray(scene.mnd_mat))
        if scene.tri_v0.shape[0]:
            t0s.append(_apply(T, np.asarray(scene.tri_v0)))
            t1s.append(_apply(T, np.asarray(scene.tri_v1)))
            t2s.append(_apply(T, np.asarray(scene.tri_v2)))
            tms.append(np.asarray(scene.tri_mat))
            if has_uv:
                uv0s.append(np.asarray(scene.tri_uv0))
                uv1s.append(np.asarray(scene.tri_uv1))
                uv2s.append(np.asarray(scene.tri_uv2))

    def cat(parts, empty_shape, dtype=jnp.float32):
        if not parts:
            return jnp.zeros(empty_shape, dtype)
        return jnp.asarray(np.concatenate(parts, 0))

    return PrimitiveScene(
        sph_center=cat(sph_c, (0, 3)), sph_radius=cat(sph_r, (0,)),
        sph_mat=cat(sph_m, (0,), jnp.int32).astype(jnp.int32),
        box_min=cat(box_lo, (0, 3)), box_max=cat(box_hi, (0, 3)),
        box_mat=cat(box_m, (0,), jnp.int32).astype(jnp.int32),
        tri_v0=cat(t0s, (0, 3)), tri_v1=cat(t1s, (0, 3)),
        tri_v2=cat(t2s, (0, 3)),
        tri_mat=cat(tms, (0,), jnp.int32).astype(jnp.int32),
        materials=scene.materials, textures=scene.textures,
        alpha_textures=scene.alpha_textures,
        tri_uv0=cat(uv0s, (0, 2)) if has_uv else None,
        tri_uv1=cat(uv1s, (0, 2)) if has_uv else None,
        tri_uv2=cat(uv2s, (0, 2)) if has_uv else None,
        cyl_center=cat(cyl_c, (0, 3)) if has_cyl else None,
        cyl_radius=cat(cyl_r, (0,)) if has_cyl else None,
        cyl_half_h=cat(cyl_h, (0,)) if has_cyl else None,
        cyl_mat=(cat(cyl_m, (0,), jnp.int32).astype(jnp.int32)
                 if has_cyl else None),
        mnd_center=cat(mnd_c, (0, 3)) if has_mnd else None,
        mnd_radius=cat(mnd_r, (0,)) if has_mnd else None,
        mnd_mat=(cat(mnd_m, (0,), jnp.int32).astype(jnp.int32)
                 if has_mnd else None))


def instantiate_cloud(cloud: GaussianCloud,
                      transforms: Sequence[np.ndarray]) -> GaussianCloud:
    """Replicate a Gaussian cloud under affine transforms: means are
    transformed; Σ ← A Σ Aᵀ (exact for ANY linear part A — rotation,
    uniform or non-uniform scale, reflection)."""
    c = np.asarray(cloud.cov3d)
    sig0 = np.zeros((c.shape[0], 3, 3), np.float32)
    sig0[:, 0, 0], sig0[:, 0, 1], sig0[:, 0, 2] = c[:, 0], c[:, 1], c[:, 2]
    sig0[:, 1, 0], sig0[:, 1, 1], sig0[:, 1, 2] = c[:, 1], c[:, 3], c[:, 4]
    sig0[:, 2, 0], sig0[:, 2, 1], sig0[:, 2, 2] = c[:, 2], c[:, 4], c[:, 5]
    means, covs, ops, shs = [], [], [], []
    for T in transforms:
        T = np.asarray(T, np.float32)
        A = T[:, :3]
        sig = np.einsum("ij,njk,lk->nil", A, sig0, A)
        covs.append(np.stack([sig[:, 0, 0], sig[:, 0, 1], sig[:, 0, 2],
                              sig[:, 1, 1], sig[:, 1, 2], sig[:, 2, 2]], -1))
        means.append(_apply(T, np.asarray(cloud.means)))
        ops.append(np.asarray(cloud.opacity))
        shs.append(np.asarray(cloud.sh))
    return GaussianCloud(
        means=jnp.asarray(np.concatenate(means)),
        cov3d=jnp.asarray(np.concatenate(covs)),
        opacity=jnp.asarray(np.concatenate(ops)),
        sh=jnp.asarray(np.concatenate(shs)))
