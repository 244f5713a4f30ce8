"""Texture mip pyramid + trilinear LOD sampling.

The reference simulator's texture model selects mip levels in getTexture
(vulkan-sim/src/cuda-sim/vulkan_ray_tracing.cc:1992-2334, `txl` lod
operand) even though the shipped RT workloads sample level 0; gsrt adds
the same capability TPU-natively. A ray tracer has no screen-space
derivatives, so the LOD comes from RAY CONES: a primary ray subtends
~one pixel (angle = 2 tan(fov/2)/H), its footprint at hit distance t is
t * angle world units, and a triangle's texel density (texels per world
unit, precomputed per triangle from its UV/world edge ratio) converts
that to texels-per-pixel; lod = log2 of that.

Layout: one [NT, TH, TW + TW/2, 3] array per atlas — level 0 occupies
the left TW columns; levels 1..L stack vertically in the right TW/2
columns (the classic side-strip packing). One array keeps per-ray level
selection a pure index computation (dynamic shapes would defeat jit;
a list of per-level arrays would need lax.switch per ray).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class MipAtlas(NamedTuple):
    """data: [NT, TH, TW + TW//2, C] packed pyramid; level offsets are a
    pure function of (TH, TW, level) — see _level_origin."""
    data: jnp.ndarray
    n_levels: int       # includes level 0
    base_h: int
    base_w: int


def _level_origin(th: int, tw: int, level: int):
    """(x0, y0, w, h) of `level` inside the packed array (static ints)."""
    if level == 0:
        return 0, 0, tw, th
    x0 = tw
    y0 = 0
    h = th // 2
    for _ in range(1, level):
        y0 += h
        h //= 2
    return x0, y0, tw >> level, th >> level


def build_mip_atlas(textures) -> MipAtlas:
    """Average-pool 2x2 pyramid (host NumPy, once per scene — the analogue
    of the reference's driver-side mip upload). textures: [NT, TH, TW, 3]
    or [NT, TH, TW] (alpha); TH/TW must be powers of two."""
    tex = np.asarray(textures, np.float32)
    squeeze = tex.ndim == 3
    if squeeze:
        tex = tex[..., None]
    nt, th, tw, c = tex.shape
    assert th & (th - 1) == 0 and tw & (tw - 1) == 0, \
        "mip atlas needs power-of-two textures"
    n_levels = 1 + max(min(th, tw).bit_length() - 1, 0)
    out = np.zeros((nt, th, tw + tw // 2, c), np.float32)
    level = tex
    for l in range(n_levels):
        x0, y0, w, h = _level_origin(th, tw, l)
        out[:, y0:y0 + h, x0:x0 + w] = level
        if l + 1 < n_levels:
            level = level.reshape(nt, h // 2, 2, w // 2, 2, c) \
                         .mean(axis=(2, 4))
    data = jnp.asarray(out[..., 0] if squeeze else out)
    return MipAtlas(data=data, n_levels=n_levels, base_h=th, base_w=tw)


def _bilinear_at_level(mip: MipAtlas, t, uv, level_idx):
    """Bilinear sample at an integer per-ray level ([R] int32). Level
    origin/extent are gathered from tiny static tables — the dynamic part
    stays pure arithmetic."""
    data = mip.data
    th, tw = mip.base_h, mip.base_w
    orgs = np.array([_level_origin(th, tw, l)
                     for l in range(mip.n_levels)], np.int32)  # [L, 4]
    x0 = jnp.asarray(orgs[:, 0])[level_idx]
    y0 = jnp.asarray(orgs[:, 1])[level_idx]
    w = jnp.asarray(orgs[:, 2])[level_idx]
    h = jnp.asarray(orgs[:, 3])[level_idx]
    u = jnp.clip(uv[:, 0], 0.0, 1.0) * (w - 1).astype(jnp.float32)
    v = jnp.clip(uv[:, 1], 0.0, 1.0) * (h - 1).astype(jnp.float32)
    xf = jnp.floor(u).astype(jnp.int32)
    yf = jnp.floor(v).astype(jnp.int32)
    x1 = jnp.minimum(xf + 1, w - 1)
    y1 = jnp.minimum(yf + 1, h - 1)
    fx = u - xf
    fy = v - yf
    if data.ndim == 4:
        fx, fy = fx[:, None], fy[:, None]
    c00 = data[t, y0 + yf, x0 + xf]
    c01 = data[t, y0 + yf, x0 + x1]
    c10 = data[t, y0 + y1, x0 + xf]
    c11 = data[t, y0 + y1, x0 + x1]
    return ((1 - fy) * ((1 - fx) * c00 + fx * c01)
            + fy * ((1 - fx) * c10 + fx * c11))


def sample_texture_lod(mip: MipAtlas, tex_id, uv, lod):
    """Trilinear sample: lerp of bilinear taps at floor(lod)/ceil(lod).
    tex_id [R] int32 (-1 -> white), uv [R,2] in [0,1), lod [R] f32
    (clamped to the pyramid). The reference's txl semantics
    (vulkan_ray_tracing.cc getTexture lod path)."""
    nt = mip.data.shape[0]
    t = jnp.clip(tex_id, 0, nt - 1)
    lod = jnp.clip(lod, 0.0, float(mip.n_levels - 1))
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, mip.n_levels - 1)
    f = lod - l0.astype(jnp.float32)
    a = _bilinear_at_level(mip, t, uv, l0)
    b = _bilinear_at_level(mip, t, uv, l1)
    if mip.data.ndim == 4:
        f = f[:, None]
    col = (1 - f) * a + f * b
    white = 1.0
    sel = (tex_id >= 0)
    if mip.data.ndim == 4:
        sel = sel[:, None]
    return jnp.where(sel, col, white)


def triangle_texel_density(v0, v1, v2, uv0, uv1, uv2, tex_res: int):
    """Per-triangle texels-per-world-unit: tex_res * sqrt(uv_area /
    world_area). Degenerate UVs (no texcoords, zero area) -> 0, which
    drives lod to 0 (level-0 sample, today's behavior)."""
    e1, e2 = v1 - v0, v2 - v0
    wa = 0.5 * jnp.linalg.norm(jnp.cross(e1, e2), axis=-1)
    u1, u2 = uv1 - uv0, uv2 - uv0
    ua = 0.5 * jnp.abs(u1[..., 0] * u2[..., 1] - u1[..., 1] * u2[..., 0])
    return tex_res * jnp.sqrt(ua / jnp.maximum(wa, 1e-12))


def ray_cone_lod(t_hit, cone_angle, texel_density):
    """LOD from an isotropic ray cone: footprint = t * angle world units;
    lod = log2(footprint * texel_density), clamped >= 0."""
    texels = t_hit * cone_angle * texel_density
    return jnp.maximum(jnp.log2(jnp.maximum(texels, 1.0)), 0.0)
