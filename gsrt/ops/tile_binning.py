"""Screen-tile binning of projected splats.

TPU-native replacement for per-ray BVH traversal on the *camera-ray* path:
instead of walking a tree per ray (the reference's
VulkanRayTracing::traceRay stack machine, vulkan_ray_tracing.cc:422-1171),
we exploit that every camera ray's splat set is exactly the splats whose
projected footprint covers its pixel — so we bin footprints to image tiles
with one global sort, then blend each tile's depth-sorted pair list.
This is the dual of the reference's ray-coherency engine (SURVEY.md S8):
rays sharing a tile share their candidate set by construction.

Performance notes (measured on TPU v5e):
  * scatters serialize (18 s for 2M pairs) — everything here is gather;
  * 1D gathers cost ~10 ns/element regardless of width, so per-pair data is
    packed into row TABLES and fetched with single row-gathers;
  * `jnp.searchsorted` must use method="sort" (the default binary-search
    "scan" does log2(N) serialized 1D gathers — 300 ms for 2M queries);
  * splats are pre-sorted by depth once (N log N), so pairs only need ONE
    stable single-key sort by tile id to be (tile, depth)-ordered.

Output: a feature-major pair payload [16, max_pairs] in depth order grouped
by tile, plus tile_start offsets. The Pallas kernel (splat_pallas.py) DMAs
arbitrary column windows of it — no alignment padding needed, since manual
DMA (unlike BlockSpec blocks) can start at any offset.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


PAYLOAD_WIDTH = 16  # f32 features per pair, padded for lane alignment
# payload feature rows:
#   0: mean2d.x   1: mean2d.y   2: quad.a   3: quad.b   4: quad.c
#   5: opacity    6: color.r    7: color.g  8: color.b  9: depth
#   10-15: zero padding


class TileBinning(NamedTuple):
    payload: jnp.ndarray      # [PAYLOAD_WIDTH, max_pairs + chunk] f32,
                              # feature-major, (tile, depth)-ordered, zero tail
    tile_start: jnp.ndarray   # [T + 1] int32 pair offsets per tile
    tile_count: jnp.ndarray   # [T] int32 pairs per tile
    total_pairs: jnp.ndarray  # [] int32 pairs before capping
    overflow: jnp.ndarray     # [] bool — total_pairs exceeded max_pairs


def tile_extent(width: int, height: int, tile_w: int, tile_h: int):
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    return ntx, nty


def compute_tile_spans(mean2d, radius, alive, width, height, tile_w, tile_h):
    """Inclusive tile-coordinate spans of each splat's footprint disc.

    Returns (x0, x1, y0, y1, touched) with touched = 0 for culled splats.
    """
    ntx, nty = tile_extent(width, height, tile_w, tile_h)
    x0 = jnp.clip(jnp.floor((mean2d[:, 0] - radius) / tile_w), 0, ntx - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((mean2d[:, 0] + radius) / tile_w), 0, ntx - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((mean2d[:, 1] - radius) / tile_h), 0, nty - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((mean2d[:, 1] + radius) / tile_h), 0, nty - 1).astype(jnp.int32)
    on_screen = ((mean2d[:, 0] + radius >= 0) & (mean2d[:, 0] - radius < width) &
                 (mean2d[:, 1] + radius >= 0) & (mean2d[:, 1] - radius < height))
    alive = alive & on_screen & (radius > 0)
    touched = jnp.where(alive, (x1 - x0 + 1) * (y1 - y0 + 1), 0)
    return x0, x1, y0, y1, touched


def build_tile_binning(
    depth, mean2d, quad, opacity, color, radius, alive,
    *, width: int, height: int, tile_w: int = 128, tile_h: int = 8,
    chunk: int = 128, max_pairs: int = 1 << 20,
) -> TileBinning:
    """Bin splats into per-tile, depth-sorted pair lists.

    Inputs need NOT be depth-sorted; splats are sorted here (by camera depth,
    the reference's visit order — ProceduralGauss.rint:67-68).
    """
    N = depth.shape[0]
    ntx, nty = tile_extent(width, height, tile_w, tile_h)
    T = ntx * nty

    # --- sort splats by depth once; all later orderings derive from it ---
    order = jnp.argsort(jnp.where(alive, depth, jnp.inf))
    depth = depth[order]
    mean2d = mean2d[order]
    quad = quad[order]
    opacity = opacity[order]
    color = color[order]
    radius = radius[order]
    alive = alive[order]

    x0, x1, y0, y1, touched = compute_tile_spans(
        mean2d, radius, alive, width, height, tile_w, tile_h)

    offsets = jnp.cumsum(touched)                    # inclusive
    total = offsets[-1]
    overflow = total > max_pairs

    # per-splat tables, fetched below with single row-gathers
    geom_tab = jnp.stack(                            # [N, 4] int32
        [x0, y0, x1 - x0 + 1, offsets - touched], axis=-1)
    feat_tab = jnp.stack(                            # [N, 16] f32
        [mean2d[:, 0], mean2d[:, 1],
         quad[:, 0], quad[:, 1], quad[:, 2],
         jnp.where(alive, opacity, 0.0),
         color[:, 0], color[:, 1], color[:, 2],
         depth] + [jnp.zeros_like(depth)] * 6, axis=-1)

    # --- expand (splat → pairs): slot s belongs to splat searchsorted(offsets, s) ---
    slots = jnp.arange(max_pairs, dtype=jnp.int32)
    splat = jnp.minimum(
        jnp.searchsorted(offsets, slots, side="right", method="sort"
                         ).astype(jnp.int32), N - 1)
    valid = slots < jnp.minimum(total, max_pairs)
    g = geom_tab[splat]                              # [MP, 4] row gather
    rank = slots - g[:, 3]
    w_span = jnp.maximum(g[:, 2], 1)
    tx = g[:, 0] + rank % w_span
    ty = g[:, 1] + rank // w_span
    tile = jnp.where(valid, ty * ntx + tx, T).astype(jnp.int32)  # sentinel T

    # --- stable sort by tile: splats are depth-ordered, so within-tile order
    # stays front-to-back ---
    tile_s, pair_s = jax.lax.sort((tile, splat), num_keys=1, is_stable=True)

    tile_start = jnp.searchsorted(tile_s, jnp.arange(T + 1, dtype=jnp.int32),
                                  method="sort").astype(jnp.int32)
    counts = (tile_start[1:] - tile_start[:-1]).astype(jnp.int32)   # [T]

    # --- payload in sorted-pair order (sentinel tail has opacity 0) ---
    gathered = feat_tab[pair_s]                      # [MP, 16] row gather
    gathered = jnp.where((tile_s < T)[:, None], gathered, 0.0)
    payload = jnp.concatenate(
        [gathered, jnp.zeros((chunk + 128, PAYLOAD_WIDTH), jnp.float32)],
        axis=0).T   # [16, MP + chunk + 128] — tail covers aligned over-fetch

    return TileBinning(
        payload=payload,
        tile_start=tile_start,
        tile_count=counts,
        total_pairs=total.astype(jnp.int32),
        overflow=overflow,
    )
