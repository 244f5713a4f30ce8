"""Screen-tile binning of projected splats.

TPU-native replacement for per-ray BVH traversal on the *camera-ray* path:
instead of walking a tree per ray (the reference's
VulkanRayTracing::traceRay stack machine, vulkan_ray_tracing.cc:422-1171),
we exploit that every camera ray's splat set is exactly the splats whose
projected footprint covers its pixel — so we bin footprints to image tiles
with one global sort, then blend each tile's depth-sorted pair list.
This is the dual of the reference's ray-coherency engine (SURVEY.md S8):
rays sharing a tile share their candidate set by construction.

Performance notes (measured on TPU v5e; random row access ≈ 26 ns/row at
multi-M scale, sorts ≈ 5 ms per operand per 6M rows):
  * scatters serialize (18 s for 2M pairs) — everything here is gather;
  * `jnp.searchsorted` must use method="sort" where used (the default
    binary-search "scan" does log2(N) serialized 1D gathers);
  * pair expansion is ONE 2D `jnp.repeat` of the per-splat table (~2.5x
    cheaper than splat-id expansion + row gather, ~5x cheaper than a
    searchsorted merge);
  * per-pair features ride THROUGH the tile sort as extra sort operands —
    cheaper than a post-sort random gather, and the sorted feature arrays
    stack directly into the feature-major payload (no transpose);
  * splats are pre-sorted by depth once (N log N), so pairs only need ONE
    stable single-key sort by tile id to be (tile, depth)-ordered;
  * footprints use tight per-axis ellipse extents (screen_extents), not a
    circular radius.

Output: a feature-major pair payload [16, max_pairs + pad] in depth order
grouped by tile, plus tile_start offsets. The Pallas kernel
(splat_pallas.py) DMAs arbitrary column windows of it — no alignment
padding needed, since manual DMA (unlike BlockSpec blocks) can start at any
offset.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


PAYLOAD_WIDTH = 8  # f32 rows per pair
# payload feature rows:
#   0: mean2d.x   1: mean2d.y   2: quad.a   3: quad.b   4: quad.c
#   5: pack15(color.r, color.g)   6: pack15(color.b, opacity)   7: zero pad
# colors/opacity are 15-bit fixed point on [0, PACK_RANGE) packed two per
# f32 — halves payload bytes and sort-operand count; max error
# PACK_RANGE/32767 ≈ 1.2e-4, far below the 1/255 alpha threshold.
# Bit 30 is ALWAYS set so the bitcast word is a normal float: without it,
# small channel values produce f32 DENORMALS, which TPU arithmetic flushes
# to zero — silently erasing opacity (whole splats vanished).
N_FEATURES = 7
PACK_RANGE = 4.0
_PACK_BIAS = jnp.int32(1 << 30)


def pack15(x, y):
    """Two [0, PACK_RANGE) floats → one NORMAL f32 holding
    bit30 | (u15 << 15) | u15."""
    q = 32767.0 / PACK_RANGE
    xi = jnp.clip(x * q, 0, 32767).astype(jnp.int32)
    yi = jnp.clip(y * q, 0, 32767).astype(jnp.int32)
    return jax.lax.bitcast_convert_type(_PACK_BIAS | (xi << 15) | yi,
                                        jnp.float32)


class TileBinning(NamedTuple):
    payload: jnp.ndarray      # [PAYLOAD_WIDTH, max_pairs + chunk + 128] f32,
                              # feature-major, (tile, depth)-ordered, zero tail
    tile_start: jnp.ndarray   # [T + 1] int32 pair offsets per tile
    tile_count: jnp.ndarray   # [T] int32 pairs per tile
    total_pairs: jnp.ndarray  # [] int32 pairs before capping
    overflow: jnp.ndarray     # [] bool — total_pairs exceeded max_pairs


def tile_extent(width: int, height: int, tile_w: int, tile_h: int):
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    return ntx, nty


def compute_tile_spans(mean2d, rx, ry, alive, width, height, tile_w, tile_h):
    """Inclusive tile-coordinate spans of each splat's footprint ellipse
    bounding box. Returns (x0, x1, y0, y1, touched); touched = 0 if culled.
    """
    ntx, nty = tile_extent(width, height, tile_w, tile_h)
    x0 = jnp.clip(jnp.floor((mean2d[:, 0] - rx) / tile_w), 0, ntx - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((mean2d[:, 0] + rx) / tile_w), 0, ntx - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((mean2d[:, 1] - ry) / tile_h), 0, nty - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((mean2d[:, 1] + ry) / tile_h), 0, nty - 1).astype(jnp.int32)
    on_screen = ((mean2d[:, 0] + rx >= 0) & (mean2d[:, 0] - rx < width) &
                 (mean2d[:, 1] + ry >= 0) & (mean2d[:, 1] - ry < height))
    alive = alive & on_screen & (rx > 0) & (ry > 0)
    touched = jnp.where(alive, (x1 - x0 + 1) * (y1 - y0 + 1), 0)
    return x0, x1, y0, y1, touched


def build_tile_binning(
    depth, mean2d, quad, opacity, color, rx, ry, alive,
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
    mean2d = mean2d[order]
    quad = quad[order]
    opacity = jnp.where(alive[order], opacity[order], 0.0)
    color = color[order]
    rx = rx[order]
    ry = ry[order]
    alive = alive[order]

    x0, x1, y0, y1, touched = compute_tile_spans(
        mean2d, rx, ry, alive, width, height, tile_w, tile_h)

    offsets = jnp.cumsum(touched)                    # inclusive
    total = offsets[-1]
    overflow = total > max_pairs

    # one per-splat table: 4 int32 geometry cols (bitcast) + 7 feature cols
    tab = jnp.concatenate(
        [jax.lax.bitcast_convert_type(
            jnp.stack([x0, y0, x1 - x0 + 1, offsets - touched], -1),
            jnp.float32),
         jnp.stack([mean2d[:, 0], mean2d[:, 1],
                    quad[:, 0], quad[:, 1], quad[:, 2],
                    pack15(color[:, 0], color[:, 1]),
                    pack15(color[:, 2], opacity)], -1)],
        axis=-1)                                     # [N, 11]

    # --- expand splats → pairs: ONE 2D repeat (measured ~2.5x cheaper than
    # materializing splat ids and row-gathering the table) ---
    rows = jnp.repeat(tab, touched, axis=0,
                      total_repeat_length=max_pairs)  # [MP, 11]
    slots = jnp.arange(max_pairs, dtype=jnp.int32)
    valid = slots < jnp.minimum(total, max_pairs)
    geom = jax.lax.bitcast_convert_type(rows[:, :4], jnp.int32)
    rank = slots - geom[:, 3]
    w_span = jnp.maximum(geom[:, 2], 1)
    tx = geom[:, 0] + rank % w_span
    ty = geom[:, 1] + rank // w_span
    tile = jnp.where(valid, ty * ntx + tx, T).astype(jnp.int32)  # sentinel T

    # --- stable sort by tile, CARRYING the 7 feature rows (splats are
    # depth-ordered, so within-tile order stays front-to-back; carrying
    # beats a post-sort random gather) ---
    sorted_ops = jax.lax.sort(
        (tile,) + tuple(rows[:, 4 + i] for i in range(N_FEATURES)),
        num_keys=1, is_stable=True)
    tile_s = sorted_ops[0]
    feats = sorted_ops[1:]

    tile_start = jnp.searchsorted(tile_s, jnp.arange(T + 1, dtype=jnp.int32),
                                  method="sort").astype(jnp.int32)
    counts = (tile_start[1:] - tile_start[:-1]).astype(jnp.int32)   # [T]

    # --- feature-major payload (sentinel tail already has opacity 0 via the
    # `valid` gating below; padded tail covers the kernel's aligned
    # over-fetch window) ---
    dead = tile_s >= T
    pad = chunk + 128
    payload = jnp.stack(
        list(feats)
        + [jnp.zeros_like(tile_s, jnp.float32)] * (PAYLOAD_WIDTH - N_FEATURES),
        axis=0)                                      # [PAYLOAD_WIDTH, MP]
    payload = jnp.where(dead[None, :], 0.0, payload)
    payload = jnp.pad(payload, ((0, 0), (0, pad)))

    return TileBinning(
        payload=payload,
        tile_start=tile_start,
        tile_count=counts,
        total_pairs=total.astype(jnp.int32),
        overflow=overflow,
    )
