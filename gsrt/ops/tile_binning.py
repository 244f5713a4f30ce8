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

# --- compact payload (int32-typed, 5 rows; splat_packed compact mode) ---
# rows: 0 mean (2 x u16 fixed point, TILE-relative, 1/MEAN_SCALE px,
#       biased by MEAN_BIAS)   1 chol.l11|chol.l21 (2 x bf16)
#       2 chol.l22|camera-depth (2 x bf16)   3 rgba8888 (two-tier 8-bit
#       color x3 + u8 opacity, pack_rgba8 below)   4 tile id
# The conic rides as its CHOLESKY factors, g = ((l11·dx + l21·dy)² +
# (l22·dy)²)/2, NOT as (qa, qb, qc): in the direct quadratic form the
# three bf16 rounding errors hit terms that mutually cancel for
# anisotropic splats (error ~ condition·g·2⁻⁹ — measured 0.08 max color
# error); in the factored form each squared term's error is 2|t|·Δt, so
# small responses stay small (error ~ sqrt(condition)·g·2⁻⁹, measured
# ~6x lower on the same scene).
# Packed words ride as int32 END-TO-END (repeat, sort, select): TPU float
# select paths flush denormal bit patterns to zero (see pack15), integer
# ops never do — so 2x16-bit packing needs no bias-bit normality trick.
# Mean precision is TWO-TIER per axis (bit 15 of each u16 selects the
# tier): fine = 1/256 px over [-64, +64) px, coarse = 1/8 px over
# [-2048, +2048) px. The exponent error is |∇g|·δ; a coarse-tier axis
# means the tile's pixels sit ≥ 48 px from the mean along that axis, so
# a splat alive there has σ ≥ 48/√(2·g_cutoff) ≈ 14 px and |∇g| ≤
# √(2·g_cutoff)/σ ≈ 0.23/px → δg ≤ 0.23/16 ≈ 0.015; the fine tier's
# 1/512-px rounding bounds δg ≈ 0.007 even for sub-2-px splats.
# Measured on the parity test scene: max color error 6e-3, mean 2e-4;
# scene-dependent — alpha compositing accumulates the per-splat opacity
# steps, e.g. 1.09e-2 max color on tpu_smoke's 300-splat overlap scene
# (identical CPU vs TPU, i.e. quantization, not flushing). A documented
# fast tier, not the bit-parity path (the f32 payload).
COMPACT_WIDTH = 5
# Stored HBM rows: Mosaic HBM->VMEM DMAs slice whole sublane tiles, so a
# 5-row slice from a (8,128)-tiled memref is illegal ("Slice shape along
# dimension 0 must be aligned to tiling (8)" on real TPU). The payload is
# therefore STORED with 3 zero pad rows; the tile sort still carries only
# the 5 live rows.
COMPACT_STORE = 8
MEAN_FINE_SCALE = 256.0    # 1/256 px quantization …
MEAN_FINE_BIAS = 64.0      # … over [-64, +64) px
MEAN_COARSE_SCALE = 8.0    # 1/8 px quantization …
MEAN_COARSE_BIAS = 2048.0  # … over [-2048, +2048) px (clamps beyond; a
                           # touched tile >2 Kpx from its splat's mean
                           # needs a >4000-px footprint — gated by the
                           # ntx ≤ 127 compact-mode limit)

# 8-bit two-tier color channel (pack_rgba8): bit 7 = 0 → fine, value =
# mag/127 over [0, 1] (half-step err ≤ 1/254 ≈ 3.9e-3 — the LDR case);
# bit 7 = 1 → coarse, value = 1 + mag·3/127 over (1, PACK_RANGE] (err ≤
# 3/254 ≈ 1.2e-2, HDR colors only). Opacity is plain u8/255 (err ≤ 2e-3,
# against the 1/255 alpha threshold). One int32 carries all four channels
# so the tile sort drops from 6 to 5 operands (the sort scales per
# operand) — this is the reference framebuffer's 8-bit color granularity
# (lumibench output), a documented fast-tier trade; the f32 payload
# remains the bit-parity path.
COLOR8_FINE = 1.0 / 127.0
COLOR8_COARSE = 3.0 / 127.0


def _pack_color8(c):
    fine = jnp.clip(jnp.round(c * 127.0), 0, 127).astype(jnp.int32)
    coarse = jnp.clip(jnp.round((c - 1.0) * (127.0 / 3.0)),
                      0, 127).astype(jnp.int32) | 0x80
    return jnp.where(c <= 1.0, fine, coarse)


def pack_rgba8(r, g, b, o):
    """Three two-tier 8-bit colors + u8 opacity → one int32
    (r<<24 | g<<16 | b<<8 | o)."""
    oi = jnp.clip(jnp.round(o * 255.0), 0, 255).astype(jnp.int32)
    return ((_pack_color8(r) << 24) | (_pack_color8(g) << 16)
            | (_pack_color8(b) << 8) | oi)


def pack15(x, y):
    """Two [0, PACK_RANGE) floats → one NORMAL f32 holding
    bit30 | (u15 << 15) | u15."""
    q = 32767.0 / PACK_RANGE
    xi = jnp.clip(x * q, 0, 32767).astype(jnp.int32)
    yi = jnp.clip(y * q, 0, 32767).astype(jnp.int32)
    return jax.lax.bitcast_convert_type(_PACK_BIAS | (xi << 15) | yi,
                                        jnp.float32)


def pack_bf16_pair(hi, lo):
    """Two f32 → one int32: round-to-nearest bf16(hi) in the top 16 bits,
    bf16(lo) in the low 16. Decode is mask/shift + bitcast (f32 arithmetic
    throughout — only storage narrows)."""
    hb = jax.lax.bitcast_convert_type(hi.astype(jnp.bfloat16), jnp.uint16)
    lb = jax.lax.bitcast_convert_type(lo.astype(jnp.bfloat16), jnp.uint16)
    return (hb.astype(jnp.int32) << 16) | lb.astype(jnp.int32)


def unpack_bf16_hi(w):
    return jax.lax.bitcast_convert_type(w & jnp.int32(-65536), jnp.float32)


def unpack_bf16_lo(w):
    return jax.lax.bitcast_convert_type(w << 16, jnp.float32)


def _pack_mean_axis(v):
    """One tile-relative mean coordinate → u16, two-tier (layout comment
    above): bit 15 = 0 → fine (1/256 px, ±64 px), = 1 → coarse (1/8 px,
    ±2048 px, saturating)."""
    fine = jnp.clip(jnp.round((v + MEAN_FINE_BIAS) * MEAN_FINE_SCALE),
                    0, 32767).astype(jnp.int32)
    coarse = jnp.clip(jnp.round((v + MEAN_COARSE_BIAS) * MEAN_COARSE_SCALE),
                      0, 32767).astype(jnp.int32) | 0x8000
    return jnp.where((v >= -MEAN_FINE_BIAS) & (v < MEAN_FINE_BIAS),
                     fine, coarse)


def pack_mean_rel(mx_rel, my_rel):
    """Tile-relative mean → (x u16 << 16) | y u16, each two-tier."""
    return (_pack_mean_axis(mx_rel) << 16) | _pack_mean_axis(my_rel)


class TileBinning(NamedTuple):
    payload: jnp.ndarray      # [PAYLOAD_WIDTH, max_pairs + chunk + 128] f32,
                              # feature-major, (tile, depth)-ordered, zero tail
    tile_start: jnp.ndarray   # [T + 1] int32 pair offsets per tile
    tile_count: jnp.ndarray   # [T] int32 pairs per tile
    total_pairs: jnp.ndarray  # [] int32 pairs before capping
    overflow: jnp.ndarray     # [] bool — total_pairs exceeded max_pairs
    pair_depth: jnp.ndarray = None  # [max_pairs] f32 camera depth per pair,
                                    # (tile, depth)-ordered (carry_depth=True
                                    # only; the serving cutoff feedback)
    # --- set only when built with with_ids=True (the differentiable path;
    # used to route per-pair gradients back to splats) ---
    sorted_base: jnp.ndarray = None     # [N] int32 first-pair offset per
                                        # depth-sorted splat (_DEAD_BASE if
                                        # no pairs)
    sorted_touched: jnp.ndarray = None  # [N] int32 pairs per sorted splat
    sorted_orig: jnp.ndarray = None     # [N] int32 original splat index of
                                        # each depth-sorted slot


def tile_extent(width: int, height: int, tile_w: int, tile_h: int):
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    return ntx, nty


def compute_tile_spans(cx, cy, rx, ry, alive, width, height, tile_w, tile_h):
    """Inclusive tile-coordinate spans of each splat's footprint ellipse
    bounding box; cx/cy are the projected-center coordinate columns [N].
    Returns (x0, x1, y0, y1, touched); touched = 0 if culled.
    """
    ntx, nty = tile_extent(width, height, tile_w, tile_h)
    x0 = jnp.clip(jnp.floor((cx - rx) / tile_w), 0, ntx - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((cx + rx) / tile_w), 0, ntx - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((cy - ry) / tile_h), 0, nty - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((cy + ry) / tile_h), 0, nty - 1).astype(jnp.int32)
    on_screen = ((cx + rx >= 0) & (cx - rx < width) &
                 (cy + ry >= 0) & (cy - ry < height))
    alive = alive & on_screen & (rx > 0) & (ry > 0)
    touched = jnp.where(alive, (x1 - x0 + 1) * (y1 - y0 + 1), 0)
    return x0, x1, y0, y1, touched


SUPER = 8  # tiles per supertile side for the cutoff coarsening


def cutoff_cull(depth, x0, x1, y0, y1, cutoff_map, ntx: int, nty: int,
                splat_chunk: int = 1 << 16,
                super_size: int = SUPER) -> jnp.ndarray:
    """Temporal-reuse depth cull: keep[s] = splat s's camera depth is within
    the per-tile saturation cutoff of SOME tile its footprint touches.

    cutoff_map [nty*ntx] f32 holds, per tile, the depth beyond which the
    previous frame's blend was fully saturated (+inf = keep everything).
    The exact test needs max(cutoff) over the splat's tile rect — a
    per-splat rect reduction, which on TPU would be a random gather. We
    coarsen conservatively instead: an 8x8-tile supertile MAX map is small
    enough (~135 entries at 1080p/16px tiles) that a 4-corner lookup runs
    as a broadcast-compare + row-reduce (no gather). Splats whose rect
    spans >2 supertiles per axis (footprints wider than a supertile) fall
    back to keep (rare, and they are exactly the splats whose rect the 4
    corners would under-cover).

    Returns keep [N] bool. Conservative by construction: supertile max >=
    rect max, so keep is a superset of the exact test.
    """
    nsx, nsy = -(-ntx // super_size), -(-nty // super_size)
    pad_x, pad_y = nsx * super_size - ntx, nsy * super_size - nty
    cm = cutoff_map.reshape(nty, ntx)
    if pad_x or pad_y:
        cm = jnp.pad(cm, ((0, pad_y), (0, pad_x)),
                     constant_values=-jnp.inf)
    sm = cm.reshape(nsy, super_size, nsx,
                    super_size).max(axis=(1, 3)).reshape(-1)
    # finite encoding for the matmul gather below: a one-hot row dotted
    # with a table containing ±inf would produce 0*inf = NaN
    sm = jnp.clip(sm, -1e30, 1e30)
    S = nsy * nsx

    sx0, sx1 = x0 // super_size, x1 // super_size
    sy0, sy1 = y0 // super_size, y1 // super_size
    big = (sx1 - sx0 > 1) | (sy1 - sy0 > 1)
    corners = [sy0 * nsx + sx0, sy0 * nsx + sx1,
               sy1 * nsx + sx0, sy1 * nsx + sx1]

    N = depth.shape[0]
    pad = (-N) % splat_chunk
    if pad:
        depth = jnp.pad(depth, (0, pad), constant_values=jnp.inf)
        corners = [jnp.pad(c, (0, pad)) for c in corners]
    n_chunks = depth.shape[0] // splat_chunk
    sids = jnp.arange(S, dtype=jnp.int32)[None, :]

    def body(c, keep):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, c * splat_chunk,
                                                    splat_chunk)
        est = jnp.full((splat_chunk,), -1e30)
        for corner in corners:
            # one hot per row -> the dot IS the gather (HIGHEST precision:
            # default MXU rounds the f32 depth table to bf16)
            oh = (sl(corner)[:, None] == sids).astype(jnp.float32)
            v = jax.lax.dot(oh, sm[:, None],
                            precision=jax.lax.Precision.HIGHEST)[:, 0]
            est = jnp.maximum(est, v)
        k = sl(depth) <= est
        return jax.lax.dynamic_update_slice_in_dim(keep, k, c * splat_chunk,
                                                   0)
    keep = jax.lax.fori_loop(0, n_chunks, body,
                             jnp.zeros((depth.shape[0],), bool))
    keep = keep[:N] | big
    return keep


def tile_histogram(x0, x1, y0, y1, alive, ntx: int, nty: int,
                   splat_chunk: int = 1 << 17) -> jnp.ndarray:
    """Per-tile pair counts [nty, ntx] from inclusive tile spans — an MXU
    rectangle histogram.

    For each tile row ty, the count over tx is the 1D difference of one-hot
    marks at x0 and x1+1, accumulated over splats whose y-span covers ty.
    That contraction over splats is a matmul: [nty, N] y-cover mask times
    [N, ntx+1] x-difference marks. Inputs are exact in bf16 (0/±1) and the
    MXU accumulates in f32, so counts are exact. Replaces a
    searchsorted-with-sort over the max_pairs array (~25 ms at 3M pairs on
    v5e) with ~2 GFLOP of matmul per 1M splats.
    """
    N = x0.shape[0]
    pad = (-N) % splat_chunk
    if pad:
        widths = [(0, pad)]
        x0, x1, y0, y1 = (jnp.pad(a, widths) for a in (x0, x1, y0, y1))
        alive = jnp.pad(alive, widths)
    n_chunks = x0.shape[0] // splat_chunk
    tys = jnp.arange(nty, dtype=jnp.int32)[:, None]        # [nty, 1]
    txs = jnp.arange(ntx + 1, dtype=jnp.int32)[None, :]    # [1, ntx+1]

    def body(c, acc):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, c * splat_chunk,
                                                    splat_chunk)
        x0c, x1c, y0c, y1c = sl(x0), sl(x1), sl(y0), sl(y1)
        av = sl(alive)
        ym = ((tys >= y0c[None, :]) & (tys <= y1c[None, :])
              & av[None, :]).astype(jnp.bfloat16)          # [nty, C]
        xd = ((txs == x0c[:, None]).astype(jnp.bfloat16)
              - (txs == (x1c + 1)[:, None]).astype(jnp.bfloat16))  # [C, ntx+1]
        return acc + jnp.dot(ym, xd, preferred_element_type=jnp.float32)

    diff = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((nty, ntx + 1), jnp.float32))
    return jnp.cumsum(diff, axis=1)[:, :ntx].astype(jnp.int32)


def group_rows_k(ntx: int, bs_max: int = 128) -> int | None:
    """Rows of tiles per kernel group for the group-contiguous stream:
    the largest k with k*ntx <= bs_max and (k*ntx) % 8 == 0 (Mosaic block
    constraint). None when no k qualifies (caller falls back to the
    tile-sorted stream)."""
    best = None
    # k <= 31: unit row counts ride the 5 spare bits of the unit sort's
    # geometry word (x0 needs only 7 of its 12-bit field)
    for k in range(1, min(bs_max // max(ntx, 1), 31) + 1):
        if (k * ntx) % 8 == 0:
            best = k
    return best


def build_tile_binning(
    depth, m2x, m2y, qa_c, qb_c, qc_c, opacity, cr, cg, cb, rx, ry, alive,
    *, width: int, height: int, tile_w: int = 128, tile_h: int = 8,
    chunk: int = 128, max_pairs: int = 1 << 20,
    expand_impl: str = "xla", interpret: bool = False,
    with_ids: bool = False, cutoff_map=None, carry_depth: bool = False,
    cull_super: int = SUPER, compact: bool = False,
    span_mode: str = "rect", max_rows: int | None = None,
    g_cutoff: float = 5.6, alpha_threshold: float = 1.0 / 255.0,
    stream: str = "tile",
) -> TileBinning:
    """Bin splats into per-tile, depth-sorted pair lists.

    All per-splat inputs are [N] feature columns (lane-major — [N, 3]-style
    minor-dim layouts pad 3 lanes to the 128-lane tile and waste ~98% of
    HBM bandwidth on TPU). Inputs need NOT be depth-sorted; splats are
    sorted here (by camera depth, the reference's visit order —
    ProceduralGauss.rint:67-68).

    with_ids=True (the differentiable path) additionally carries each
    pair's depth-order index through the tile sort into payload row 7
    (bitcast int32; max_pairs sentinel on dead slots) and returns the
    depth-sorted splat bookkeeping (sorted_base / sorted_touched /
    sorted_orig) used to route per-pair gradients back to splats.
    """
    N = depth.shape[0]
    ntx, nty = tile_extent(width, height, tile_w, tile_h)
    T = ntx * nty
    assert ntx < (1 << 12) and nty < (1 << 12) and T < (1 << 20), \
        "tile grid exceeds the packed-operand bit budget"

    # --- footprint spans on the raw (unsorted) splats ---
    x0, x1, y0, y1, touched = compute_tile_spans(
        m2x, m2y, rx, ry, alive, width, height, tile_w, tile_h)
    opacity = jnp.where(alive, opacity, 0.0)

    # --- temporal-reuse cull (serving): drop splats beyond every touched
    # tile's saturation-depth cutoff from the previous frame. Before the
    # histogram, so counts/offsets see the culled pair stream ---
    if cutoff_map is not None:
        keep = cutoff_cull(depth, x0, x1, y0, y1, cutoff_map, ntx, nty,
                           super_size=cull_super)
        touched = jnp.where(keep, touched, 0)

    if span_mode == "ellipse":
        # per-tile-ROW x-spans (ellipse-exact): its histogram must count
        # the row spans, not the rect — built inside
        assert not with_ids, "ellipse spans are forward-only (rect for VJP)"
        return _build_ellipse(
            depth, m2x, m2y, qa_c, qb_c, qc_c, opacity, cr, cg, cb,
            x0, x1, y0, y1, touched, ntx=ntx, nty=nty, T=T,
            tile_w=tile_w, tile_h=tile_h, chunk=chunk, max_pairs=max_pairs,
            max_rows=max_rows if max_rows is not None else max_pairs,
            expand_impl=expand_impl, interpret=interpret,
            carry_depth=carry_depth, compact=compact,
            g_cutoff=g_cutoff, alpha_threshold=alpha_threshold)

    # --- per-tile pair counts → tile offsets, order-independent (MXU
    # rectangle histogram; replaces a searchsorted over the sorted pairs) ---
    counts = tile_histogram(x0, x1, y0, y1, touched > 0, ntx, nty).reshape(T)
    total = jnp.sum(touched)
    overflow = total > max_pairs
    tile_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)])
    # overflow truncates the deepest pairs mid-array; clamping keeps every
    # segment inside the payload (image is wrong until the caller
    # re-calibrates on the overflow flag, but memory stays safe)
    tile_start = jnp.minimum(tile_start, jnp.minimum(total, max_pairs))

    if compact and stream == "group":
        k = group_rows_k(ntx)
        assert k is not None and not with_ids, \
            "group stream needs a qualifying tile grid and no VJP ids " \
            "(callers gate on group_rows_k and fall back to tile)"
        return _build_group_stream(
            depth, m2x, m2y, qa_c, qb_c, qc_c, opacity, cr, cg, cb,
            x0, x1, y0, y1, touched, ntx=ntx, nty=nty, T=T,
            tile_w=tile_w, tile_h=tile_h, chunk=chunk, max_pairs=max_pairs,
            max_units=max_rows if max_rows is not None else max_pairs,
            interpret=interpret, carry_depth=carry_depth, k_rows=k,
            counts=counts, tile_start=tile_start, total=total,
            overflow=overflow)

    if compact:
        return _build_compact(
            depth, m2x, m2y, qa_c, qb_c, qc_c, opacity, cr, cg, cb,
            x0, x1, y0, y1, touched, ntx=ntx, nty=nty, T=T,
            tile_w=tile_w, tile_h=tile_h, chunk=chunk, max_pairs=max_pairs,
            expand_impl=expand_impl, interpret=interpret,
            carry_depth=carry_depth, with_ids=with_ids,
            counts=counts, tile_start=tile_start, total=total,
            overflow=overflow)

    # --- ONE carry-sort by camera depth compacts pair-generating splats to
    # a prefix and orders them front-to-back (the reference's visit order).
    # Small int fields ride packed two-per-operand: 10 operands vs an
    # argsort + 11 gathers (random row gathers cost ~27 ns/row on v5e) ---
    key = jnp.where(touched > 0, depth, jnp.inf)
    xy0 = x0 | (y0 << 12)
    wspan_touch = ((x1 - x0 + 1) << 20) | touched
    carry_ops = (key, xy0, wspan_touch, m2x, m2y, qa_c, qb_c, qc_c,
                 pack15(cr, cg), pack15(cb, opacity))
    if with_ids:
        carry_ops = carry_ops + (jnp.arange(N, dtype=jnp.int32),)
    sorted_carry = jax.lax.sort(carry_ops, num_keys=1, is_stable=False)
    (depth_s, xy0, wspan_touch, m2x, m2y, qa, qb, qc, rgp,
     bop) = sorted_carry[:10]
    orig_s = sorted_carry[10] if with_ids else None
    x0s = xy0 & 0xFFF
    y0s = xy0 >> 12
    w_span = jnp.maximum(wspan_touch >> 20, 1)
    touched_s = wspan_touch & 0xFFFFF
    offsets = jnp.cumsum(touched_s)                  # inclusive
    from gsrt.ops.pair_expand import _DEAD_BASE
    base = jnp.where(touched_s > 0, offsets - touched_s, _DEAD_BASE)

    return _finish_f32(
        x0s, y0s, w_span, touched_s, base, m2x, m2y, qa, qb, qc, rgp, bop,
        depth_s, orig_s, counts=counts, tile_start=tile_start, total=total,
        overflow=overflow, ntx=ntx, T=T, chunk=chunk, max_pairs=max_pairs,
        expand_impl=expand_impl, interpret=interpret,
        carry_depth=carry_depth, with_ids=with_ids)


def _finish_f32(
    x0s, y0s, w_span, touched_s, base, m2x, m2y, qa, qb, qc, rgp, bop,
    depth_s, orig_s, *, counts, tile_start, total, overflow, ntx, T,
    chunk, max_pairs, expand_impl, interpret, carry_depth, with_ids,
) -> TileBinning:
    """f32-payload second half: expand depth-sorted UNITS (splats in rect
    mode, tile-rows in ellipse mode — a unit covers w_span tiles starting
    at (x0s, y0s), spanning 1 tile row when w_span == touched_s) to pairs,
    tile-sort, build the feature-major payload."""
    if expand_impl == "binned":
        expand_impl = "pallas"   # binned emit is compact-payload-only
    # --- expand units → pairs ---
    if expand_impl in ("pallas", "fused"):
        # streaming barrel-shift expansion at HBM bandwidth; "fused"
        # additionally computes the pair->source merge in-kernel
        from gsrt.ops.pair_expand import (TAB_ROWS, expand_pairs,
                                          expand_pairs_fused)
        ep = expand_pairs_fused if expand_impl == "fused" else expand_pairs
        feats_n = [m2x, m2y, qa, qb, qc, rgp, bop]
        geom_n = [x0s, y0s, w_span, base]
        tabf = jnp.stack(
            [jax.lax.bitcast_convert_type(a, jnp.float32) for a in geom_n]
            + feats_n + [depth_s]
            + [jnp.zeros_like(m2x)] * (TAB_ROWS - 12), axis=0)   # [16, N]
        rowsf = ep(tabf, base, max_pairs,
                   interpret=interpret)                         # [16, MP]
        geom = jax.lax.bitcast_convert_type(rowsf[:4], jnp.int32)
        gx0, gy0, gw, gbase = geom[0], geom[1], geom[2], geom[3]
        pair_feats = [rowsf[4 + i] for i in range(N_FEATURES)]
        pair_depth = rowsf[11]          # expanded for free (16-row copy)
    else:
        # ONE 2D repeat (measured ~2.5x cheaper in XLA than materializing
        # splat ids and row-gathering the table)
        feat_cols = [m2x, m2y, qa, qb, qc, rgp, bop]
        if carry_depth:
            feat_cols.append(depth_s)
        tab = jnp.concatenate(
            [jax.lax.bitcast_convert_type(
                jnp.stack([x0s, y0s, w_span, base], -1), jnp.float32),
             jnp.stack(feat_cols, -1)],
            axis=-1)                                 # [N, 11 (+1)]
        rows = jnp.repeat(tab, touched_s, axis=0,
                          total_repeat_length=max_pairs)  # [MP, 11 (+1)]
        geom = jax.lax.bitcast_convert_type(rows[:, :4], jnp.int32)
        gx0, gy0, gw, gbase = geom[:, 0], geom[:, 1], geom[:, 2], geom[:, 3]
        pair_feats = [rows[:, 4 + i] for i in range(N_FEATURES)]
        pair_depth = rows[:, 11] if carry_depth else None

    slots = jnp.arange(max_pairs, dtype=jnp.int32)
    valid = slots < jnp.minimum(total, max_pairs)
    rank = slots - gbase
    tx = gx0 + rank % gw
    ty = gy0 + rank // gw
    tile = jnp.where(valid, ty * ntx + tx, T).astype(jnp.int32)  # sentinel T

    # --- stable sort by tile, CARRYING the 7 feature rows (splats are
    # depth-ordered, so within-tile order stays front-to-back; carrying
    # beats a post-sort random gather) ---
    sort_ops = (tile,) + tuple(pair_feats)
    if carry_depth:
        sort_ops = sort_ops + (pair_depth,)  # serving cutoff feedback
    if with_ids:
        sort_ops = sort_ops + (slots,)     # depth-order pair index
    sorted_ops = jax.lax.sort(sort_ops, num_keys=1, is_stable=True)
    tile_s = sorted_ops[0]
    feats = sorted_ops[1:1 + N_FEATURES]
    nxt = 1 + N_FEATURES
    pair_depth_s = None
    if carry_depth:
        pair_depth_s = sorted_ops[nxt]
        nxt += 1
    idp_s = sorted_ops[nxt] if with_ids else None

    # --- feature-major payload (sentinel tail already has opacity 0 via the
    # `valid` gating below; padded tail covers the kernel's aligned
    # over-fetch window) ---
    dead = tile_s >= T
    pad = chunk + 128
    extra = [jnp.zeros_like(tile_s, jnp.float32)] * (PAYLOAD_WIDTH
                                                     - N_FEATURES)
    if with_ids:
        extra[0] = jax.lax.bitcast_convert_type(
            jnp.where(dead, max_pairs, idp_s).astype(jnp.int32),
            jnp.float32)
    else:
        # row 7: the pair's tile id (20 bits; dead pairs keep the sentinel
        # T, which falls outside every kernel group's [t0, t0+bs) window).
        # Bit 30 keeps the word a normal float — TPU select paths flush
        # denormals (see pack15)
        extra[0] = jax.lax.bitcast_convert_type(
            jnp.minimum(tile_s, T) | _PACK_BIAS, jnp.float32)
    payload = jnp.stack(list(feats) + extra, axis=0)  # [PAYLOAD_WIDTH, MP]
    # dead pairs: zero the feature rows but KEEP row 7 (pair id / sentinel
    # tile id — a zeroed tile-id word would alias tile 0 of group 0)
    payload = jnp.where(dead[None, :],
                        jnp.where(jnp.arange(PAYLOAD_WIDTH)[:, None]
                                  == N_FEATURES,
                                  payload, 0.0),
                        payload)
    # the aligned-overfetch tail needs the same row-7 sentinel as dead pairs
    tail_id = jnp.int32(max_pairs if with_ids else (T | _PACK_BIAS))
    tail = jnp.where(jnp.arange(PAYLOAD_WIDTH)[:, None] == N_FEATURES,
                     jax.lax.bitcast_convert_type(
                         jnp.full((1, pad), tail_id), jnp.float32),
                     jnp.zeros((PAYLOAD_WIDTH, pad), jnp.float32))
    payload = jnp.concatenate([payload, tail], axis=1)

    return TileBinning(
        payload=payload,
        tile_start=tile_start,
        tile_count=counts,
        total_pairs=total.astype(jnp.int32),
        overflow=overflow,
        pair_depth=pair_depth_s,
        sorted_base=base if with_ids else None,
        sorted_touched=touched_s if with_ids else None,
        sorted_orig=orig_s,
    )


def _build_ellipse(
    depth, m2x, m2y, qa_c, qb_c, qc_c, opacity, cr, cg, cb,
    x0, x1, y0, y1, touched, *, ntx, nty, T, tile_w, tile_h, chunk,
    max_pairs, max_rows, expand_impl, interpret, carry_depth, compact,
    g_cutoff, alpha_threshold,
) -> TileBinning:
    """Ellipse-exact per-tile-row x-spans (ROADMAP #1c).

    The rect path emits a pair for every tile in the footprint's bounding
    box; the ellipse g(d) ≤ G fills only ~pi/4 of it (less when rotated
    anisotropic), so bbox corners are pure overhead through expand, the
    tile sort, and the blend kernel. Here splats first expand to TILE-ROW
    units (one per footprint bbox row, level 1), each row computes its
    exact x-interval of the ellipse over the row's pixel-y range, and the
    existing unit→pair machinery (_finish_f32 / _finish_compact) runs on
    the rows (a row is a w_span×1 rect, so the rank math degenerates to
    tx = x0 + rank). Pairs whose tile the ellipse misses contain no pixel
    with alpha above threshold, so the rendered image is IDENTICAL to
    rect mode — only the pair count (and every per-pair cost) shrinks.

    x-interval at pixel row y (conic Q = [[a,b],[b,c]], alpha-tightened
    cutoff G recomputed by the screen_extents_abc formula): solving
    a·dx² + 2b·dy·dx + c·dy² ≤ 2G for dx gives center -b·dy/a (linear in
    dy, extremal at the row's ends) and half-width sqrt(2G·a - det·dy²)/a
    (maximal at the dy closest to 0). Both bounds are evaluated in f32 and
    dilated 1e-3 px before the floor-to-tile, then clamped to the rect
    span.
    """
    assert nty <= 255, "ellipse spans pack the tile-row count in 8 bits"
    if compact:
        # fail fast like _build_compact's rect path: _finish_compact packs
        # the x-span into 7 bits, and wider grids would silently corrupt
        assert ntx <= 127, "compact payload packs the tile x-span in 7 bits"
    from gsrt.ops.pair_expand import _DEAD_BASE

    rows_n = jnp.where(touched > 0, y1 - y0 + 1, 0)

    # --- level-0 carry-sort by camera depth (units = splats) ---
    key = jnp.where(touched > 0, depth, jnp.inf)
    xy0r = x0 | (y0 << 12) | (rows_n << 24)
    wspan_touch = ((x1 - x0 + 1) << 20) | touched
    if compact:
        # pack the rgba8888 payload word at SPLAT level from the RAW f32
        # colors — bit-identical to _build_compact's rect path. (Packing
        # via the pack15 fast-tier words and re-quantizing shifted 8-bit
        # codes by one step, ~6e-3, breaking ellipse/rect pair-payload
        # identity.) Rides the sort as int32: carries through jax.lax.sort
        # selects must not be denormal-able f32 bit patterns (see pack15).
        cw1 = pack_rgba8(cr, cg, cb, opacity)
        cw2 = jnp.zeros_like(cw1)
    else:
        cw1, cw2 = pack15(cr, cg), pack15(cb, opacity)
    carry = jax.lax.sort(
        (key, xy0r, wspan_touch, m2x, m2y, qa_c, qb_c, qc_c,
         cw1, cw2, jnp.where(touched > 0, opacity, 0.0)),
        num_keys=1, is_stable=False)
    (depth_s, xy0r, wspan_touch, m2x_s, m2y_s, qa_s, qb_s, qc_s, rgp, bop,
     op_s) = carry
    x0s = xy0r & 0xFFF
    y0s = (xy0r >> 12) & 0xFFF
    rows_s = jnp.where((wspan_touch & 0xFFFFF) > 0,
                       (xy0r >> 24) & 0xFF, 0)
    x1s = x0s + jnp.maximum(wspan_touch >> 20, 1) - 1

    row_off = jnp.cumsum(rows_s)
    rows_total = row_off[-1]
    row_base = jnp.where(rows_s > 0, row_off - rows_s, _DEAD_BASE)

    # --- level-1: expand splats → tile-row units (the same run-expansion
    # machinery as level 2: Pallas/fused kernel when configured — the XLA
    # ragged repeat costs ~65 ms per 3M rows, exactly what expand_pairs
    # was built to avoid) ---
    bi = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
    xgeo = x0s | (x1s << 12) | (y0s << 24)
    # in compact mode rgp carries the splat-level rgba8888 int32 word and
    # bop a dead zero column; the expand machinery (gather-only — no float
    # selects) moves the bitcast words without flushing denormal patterns,
    # exactly as _finish_compact already relies on
    tab_cols = [bi(xgeo), bi(row_base), m2x_s, m2y_s,
                qa_s, qb_s, qc_s, op_s,
                bi(rgp) if compact else rgp,
                bi(bop) if compact else bop, depth_s]
    if expand_impl in ("pallas", "fused", "binned"):
        # level 1 (splats → rows) has no tile ids to emit — "binned" uses
        # the plain pallas expansion here and the binned emit at level 2
        from gsrt.ops.pair_expand import expand_pairs, expand_pairs_fused
        ep = expand_pairs_fused if expand_impl == "fused" else expand_pairs
        tabf = jnp.stack(
            tab_cols + [jnp.zeros_like(depth_s)] * 5, axis=0)  # [16, N]
        rf = ep(tabf, row_base, max_rows, interpret=interpret)  # [16, MR]
        rgeo = jax.lax.bitcast_convert_type(rf[0], jnp.int32)
        rbase = jax.lax.bitcast_convert_type(rf[1], jnp.int32)
        mx, my = rf[2], rf[3]
        qa_r, qb_r, qc_r = rf[4], rf[5], rf[6]
        op_r = rf[7]
        rgp_r, bop_r, depth_r = rf[8], rf[9], rf[10]
    else:
        rrows = jnp.repeat(jnp.stack(tab_cols, axis=-1), rows_s, axis=0,
                           total_repeat_length=max_rows)     # [MR, 11]
        rgeo = jax.lax.bitcast_convert_type(rrows[:, 0], jnp.int32)
        rbase = jax.lax.bitcast_convert_type(rrows[:, 1], jnp.int32)
        mx, my = rrows[:, 2], rrows[:, 3]
        qa_r, qb_r, qc_r = rrows[:, 4], rrows[:, 5], rrows[:, 6]
        op_r = rrows[:, 7]
        rgp_r, bop_r, depth_r = rrows[:, 8], rrows[:, 9], rrows[:, 10]
    rx0, rx1 = rgeo & 0xFFF, (rgeo >> 12) & 0xFFF
    ry0 = (rgeo >> 24) & 0xFF

    rslot = jnp.arange(max_rows, dtype=jnp.int32)
    rvalid = rslot < jnp.minimum(rows_total, max_rows)
    ty = ry0 + (rslot - rbase)

    # --- per-row exact x-interval of the ellipse (f32, pre-quantization) ---
    det_r = jnp.maximum(qa_r * qc_r - qb_r * qb_r, 1e-18)
    qa_p = jnp.maximum(qa_r, 1e-12)
    # alpha-tightened cutoff, the same formula as screen_extents_abc so
    # the row span never under-covers the rect machinery's footprint
    g_row = jnp.minimum(
        jnp.float32(g_cutoff),
        jnp.maximum(jnp.log(jnp.maximum(op_r / alpha_threshold, 1e-6)),
                    0.0))
    dy_lo = ty.astype(jnp.float32) * tile_h - my
    dy_hi = dy_lo + (tile_h - 1)
    dy0 = jnp.clip(0.0, dy_lo, dy_hi)        # |dy| minimizer in the row
    two_g_a = jnp.maximum(2.0 * g_row * qa_r, 0.0)
    wmax = jnp.sqrt(jnp.maximum(two_g_a - det_r * dy0 * dy0, 0.0)) / qa_p \
        + 1e-3
    slope = qb_r / qa_p
    xc_lo = mx - slope * dy_lo
    xc_hi = mx - slope * dy_hi
    dxmin = jnp.minimum(xc_lo, xc_hi) - wmax
    dxmax = jnp.maximum(xc_lo, xc_hi) + wmax
    tx0 = jnp.clip(jnp.floor(dxmin / tile_w).astype(jnp.int32), rx0, rx1)
    tx1 = jnp.clip(jnp.floor(dxmax / tile_w).astype(jnp.int32), tx0, rx1)
    span = jnp.where(rvalid, tx1 - tx0 + 1, 0)

    # --- exact per-tile counts from the row spans (reuses the MXU
    # rectangle histogram with degenerate 1-row rects) ---
    counts = tile_histogram(tx0, tx1, ty, ty, span > 0, ntx, nty).reshape(T)
    total = jnp.sum(span)
    overflow = (rows_total > max_rows) | (total > max_pairs)
    tile_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)])
    tile_start = jnp.minimum(tile_start, jnp.minimum(total, max_pairs))

    pair_off = jnp.cumsum(span)
    base = jnp.where(span > 0, pair_off - span, _DEAD_BASE)
    w_span = jnp.maximum(span, 1)

    if compact:
        # pack at ROW level (post span math, f32 inputs — same packing as
        # _build_compact does at splat level)
        l11 = jnp.sqrt(jnp.maximum(qa_r, 1e-12))
        l21 = qb_r / jnp.maximum(l11, 1e-12)
        l22 = jnp.sqrt(jnp.maximum(qc_r - l21 * l21, 1e-12))
        qab = pack_bf16_pair(l11, l21)
        qcd = pack_bf16_pair(l22, jnp.where(rvalid, depth_r, 0.0))
        # the rgba8888 word was packed at splat level from the raw f32
        # colors (carry sort above) and rode the expansion bit-exactly —
        # identical to _build_compact's rect-path packing
        rgba = jax.lax.bitcast_convert_type(rgp_r, jnp.int32)
        return _finish_compact(
            tx0, ty, w_span, span, base, mx, my, qab, qcd, rgba,
            counts=counts, tile_start=tile_start, total=total,
            overflow=overflow, ntx=ntx, T=T, tile_w=tile_w, tile_h=tile_h,
            chunk=chunk, max_pairs=max_pairs, expand_impl=expand_impl,
            interpret=interpret, carry_depth=carry_depth)

    return _finish_f32(
        tx0, ty, w_span, span, base, mx, my, qa_r, qb_r, qc_r, rgp_r, bop_r,
        jnp.where(rvalid, depth_r, jnp.inf), None,
        counts=counts, tile_start=tile_start, total=total,
        overflow=overflow, ntx=ntx, T=T, chunk=chunk, max_pairs=max_pairs,
        expand_impl=expand_impl, interpret=interpret,
        carry_depth=carry_depth, with_ids=False)


def _build_group_stream(
    depth, m2x, m2y, qa_c, qb_c, qc_c, opacity, cr, cg, cb,
    x0, x1, y0, y1, touched, *, ntx, nty, T, tile_w, tile_h, chunk,
    max_pairs, max_units, interpret, carry_depth, k_rows,
    counts, tile_start, total, overflow,
) -> TileBinning:
    """Group-contiguous pair stream: NO pair-level sort.

    The packed blend kernel reads tile_start only at kernel-GROUP
    boundaries (bs tiles per grid step) and routes lanes to subtile
    columns by the payload-carried tile id — so pairs never needed
    (tile, depth) order, only (a) contiguity per group and (b) depth
    order per tile. With groups aligned to k full tile ROWS (bs = k*ntx),
    a pair's group is known at SPLAT level: splats expand to
    (splat x row-group) UNITS (~1.05-1.3x the splat count — most
    footprints fit one k-row band), ONE stable unit-level sort by group
    id replaces the 5-operand sort over every pair, and the fused binned
    expansion emits the final payload directly. The within-group tile
    interleaving this produces requires the logmm scan (its segment
    matrix is built from tile-id equality, not run adjacency) and the
    order-independent chunk-total update (splat_packed group_stream=True).

    Cost model vs _build_compact + tile sort, at 1M splats / 3.15M pairs
    (v5e, tools/sort_probe.py 2026-08-21): the pair-level stable 5-operand
    sort is 16.8 ms; the unit sort runs the same operand count at ~1/2.8
    the rows, and the tile-id/mean/masking stages ride the expansion
    kernel at (1, C) scale.

    Reference analogy: the reference's per-warp coherence tables
    (SURVEY.md S8) exploit ray locality within a warp; here the kernel
    group IS the warp-analogue, and the stream is materialized directly
    in its granularity instead of being fully sorted first.
    """
    from gsrt.ops.pair_expand import _DEAD_BASE, expand_pairs, \
        expand_pairs_binned

    N = depth.shape[0]
    assert ntx <= 127, "compact payload packs the tile x-span in 7 bits"
    assert nty < (1 << 12)
    k = k_rows
    n_groups = -(-nty // k)

    # --- depth carry-sort (as _build_compact, with the row count packed
    # into the geometry word: x0 7b | y0 12b | rows 12b = 31 bits) ---
    key = jnp.where(touched > 0, depth, jnp.inf)
    rows_n = jnp.where(touched > 0, y1 - y0 + 1, 0)
    xy0g = x0 | (y0 << 7) | (rows_n << 19)
    w_spl = jnp.where(touched > 0, x1 - x0 + 1, 1)
    l11 = jnp.sqrt(jnp.maximum(qa_c, 1e-12))
    l21 = qb_c / jnp.maximum(l11, 1e-12)
    l22 = jnp.sqrt(jnp.maximum(qc_c - l21 * l21, 1e-12))
    qab = pack_bf16_pair(l11, l21)
    qcd = pack_bf16_pair(l22, depth)
    rgba = pack_rgba8(cr, cg, cb, opacity)
    carry = jax.lax.sort((key, xy0g, w_spl, m2x, m2y, qab, qcd, rgba),
                         num_keys=1, is_stable=False)
    (_, xy0g, w_spl, m2x_s, m2y_s, qab, qcd, rgba) = carry
    y0s = (xy0g >> 7) & 0xFFF
    rows_s = (xy0g >> 19) & 0xFFF
    # units = row-group bands the footprint crosses
    units_n = jnp.where(rows_s > 0,
                        (y0s + rows_s - 1) // k - y0s // k + 1, 0)
    units_total = jnp.sum(units_n)
    uoff = jnp.cumsum(units_n)
    ubase = jnp.where(units_n > 0, uoff - units_n, _DEAD_BASE)

    # --- level-1 expand: splats -> units (fused kernel: in-kernel merge,
    # no dense N+MU-row sorts — sort_probe 2026-08-21) ---
    from gsrt.ops.pair_expand import expand_pairs_fused
    bi = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
    tab1 = jnp.stack([bi(xy0g), bi(w_spl), bi(ubase),
                      m2x_s, m2y_s, bi(qab), bi(qcd), bi(rgba)], axis=0)
    e = jax.lax.bitcast_convert_type(
        expand_pairs_fused(tab1, ubase, max_units, interpret=interpret),
        jnp.int32)                                       # [8, MU]
    geoA, w_e, ubase_e = e[0], e[1], e[2]
    uslot = jnp.arange(max_units, dtype=jnp.int32)
    valid_u = uslot < jnp.minimum(units_total, max_units)
    rank_u = jnp.maximum(uslot - ubase_e, 0)
    x0_e = geoA & 0x7F
    y0_e = (geoA >> 7) & 0xFFF
    rows_e = (geoA >> 19) & 0xFFF
    gid = y0_e // k + rank_u
    ys = jnp.maximum(y0_e, gid * k)
    ye = jnp.minimum(y0_e + rows_e - 1, gid * k + (k - 1))
    rows_u = jnp.where(valid_u, ye - ys + 1, 0)

    # --- THE sort: stable by group id at unit scale (dead units sink via
    # the n_groups sentinel and keep rows_u = 0). Sort cost scales per
    # operand: rows_u (<= k <= 31) rides the 5 spare bits of the geometry
    # word's 12-bit x field (x0 <= 127), keeping the sort at 7 operands ---
    ukey = jnp.where(valid_u, gid, n_groups)
    xgeo2 = x0_e | (rows_u << 7) | (ys << 12) | (w_e << 24)
    sorted_u = jax.lax.sort(
        (ukey, xgeo2, e[3], e[4], e[5], e[6], e[7]),
        num_keys=1, is_stable=True)
    (_, xgeo2, m2x_u, m2y_u, qab_u, qcd_u, rgba_u) = sorted_u
    rows_u = (xgeo2 >> 7) & 0x1F
    xgeo2 = xgeo2 & ~jnp.int32(0x1F << 7)            # kernel emit format
    w_u = jnp.maximum((xgeo2 >> 24) & 0x7F, 1)
    touched_u = jnp.where(rows_u > 0, rows_u * w_u, 0)
    poff = jnp.cumsum(touched_u)
    pbase = jnp.where(touched_u > 0, poff - touched_u, _DEAD_BASE)

    # --- level-2 fused binned expand: units -> final payload rows ---
    tab2 = jax.lax.bitcast_convert_type(
        jnp.stack([xgeo2, pbase, m2x_u, m2y_u, qab_u, qcd_u, rgba_u,
                   jnp.zeros_like(rgba_u)], axis=0), jnp.float32)
    rb = expand_pairs_binned(
        tab2, pbase, max_pairs, total=jnp.minimum(total, max_pairs),
        ntx=ntx, T=T, tile_w=tile_w, tile_h=tile_h,
        interpret=interpret)                             # [8, MP] int32

    pad = chunk + 128
    zeros_row = jnp.zeros_like(rb[0])
    payload = jnp.stack(
        [rb[0], rb[1], rb[2], rb[3], jnp.minimum(rb[4], T)]
        + [zeros_row] * (COMPACT_STORE - COMPACT_WIDTH), axis=0)
    tail = jnp.where(
        jnp.arange(COMPACT_STORE)[:, None] == COMPACT_WIDTH - 1,
        jnp.full((COMPACT_STORE, pad), T, jnp.int32),
        jnp.zeros((COMPACT_STORE, pad), jnp.int32))
    payload = jnp.concatenate([payload, tail], axis=1)

    return TileBinning(
        payload=payload,
        tile_start=tile_start,
        tile_count=counts,
        total_pairs=total.astype(jnp.int32),
        overflow=overflow | (units_total > max_units),
        pair_depth=unpack_bf16_lo(rb[2]) if carry_depth else None,
    )


def _build_compact(
    depth, m2x, m2y, qa_c, qb_c, qc_c, opacity, cr, cg, cb,
    x0, x1, y0, y1, touched, *, ntx, nty, T, tile_w, tile_h, chunk,
    max_pairs, expand_impl, interpret, carry_depth, with_ids,
    counts, tile_start, total, overflow,
) -> TileBinning:
    """Compact-payload binning: same pipeline as build_tile_binning but
    every packed word rides int32 (see COMPACT_WIDTH layout above).

    Wins over the f32 path (all stages scale with operand/row count):
      * depth carry-sort: 8 operands (qa|qb, qc|depth and rgba8888
        pre-packed);
      * expand table: exactly 8 rows (x-span packed into the xy0 word) —
        half the 16-row f32 table;
      * tile sort: 5 operands vs 9;
      * payload: 5 live rows vs 8.
    Camera depth always rides qc's low half, so the serving feedback
    (carry_depth) is free. Requires the packed blend kernel and ntx ≤ 127
    (7-bit x-span); with_ids (the VJP path) stays on the f32 payload.
    """
    assert not with_ids, "compact payload is forward-only (f32 for VJP)"
    assert ntx <= 127, "compact payload packs the tile x-span in 7 bits"
    N = depth.shape[0]

    # --- depth carry-sort, quads pre-packed (splat-level, tile-free) ---
    key = jnp.where(touched > 0, depth, jnp.inf)
    xy0 = x0 | (y0 << 12)
    wspan_touch = ((x1 - x0 + 1) << 20) | touched
    # Cholesky of the conic [[qa, qb], [qb, qc]] (see layout comment)
    l11 = jnp.sqrt(jnp.maximum(qa_c, 1e-12))
    l21 = qb_c / jnp.maximum(l11, 1e-12)
    l22 = jnp.sqrt(jnp.maximum(qc_c - l21 * l21, 1e-12))
    qab = pack_bf16_pair(l11, l21)
    qcd = pack_bf16_pair(l22, depth)
    rgba = pack_rgba8(cr, cg, cb, opacity)
    carry = jax.lax.sort((key, xy0, wspan_touch, m2x, m2y, qab, qcd,
                          rgba), num_keys=1, is_stable=False)
    (_, xy0, wspan_touch, m2x_s, m2y_s, qab, qcd, rgba) = carry
    x0s = xy0 & 0xFFF
    y0s = xy0 >> 12
    w_span = jnp.maximum(wspan_touch >> 20, 1)
    touched_s = wspan_touch & 0xFFFFF
    offsets = jnp.cumsum(touched_s)
    from gsrt.ops.pair_expand import _DEAD_BASE
    base = jnp.where(touched_s > 0, offsets - touched_s, _DEAD_BASE)

    return _finish_compact(
        x0s, y0s, w_span, touched_s, base, m2x_s, m2y_s, qab, qcd, rgba,
        counts=counts, tile_start=tile_start, total=total, overflow=overflow,
        ntx=ntx, T=T, tile_w=tile_w, tile_h=tile_h, chunk=chunk,
        max_pairs=max_pairs, expand_impl=expand_impl, interpret=interpret,
        carry_depth=carry_depth)


def _finish_compact(
    x0s, y0s, w_span, touched_s, base, m2x_s, m2y_s, qab, qcd, rgba,
    *, counts, tile_start, total, overflow, ntx, T, tile_w, tile_h, chunk,
    max_pairs, expand_impl, interpret, carry_depth,
) -> TileBinning:
    """Compact-payload second half over depth-sorted UNITS (splats in rect
    mode, tile-rows in ellipse mode; see _finish_f32)."""
    # --- expand: ONE 8-row int table (mean stays f32-precise; it is
    # re-based to the pair's tile and quantized only after the tile is
    # known below; row 7 is pad — Mosaic DMAs whole 8-row sublane tiles,
    # so 7 live rows cost the same as 8) ---
    xy0ws = x0s | (y0s << 12) | (w_span << 24)
    tab_rows = [xy0ws, base,
                jax.lax.bitcast_convert_type(m2x_s, jnp.int32),
                jax.lax.bitcast_convert_type(m2y_s, jnp.int32),
                qab, qcd, rgba, jnp.zeros_like(rgba)]
    if expand_impl == "binned":
        # fully-fused expansion: the kernel emits the five tile-sort
        # operands directly (tile id from the in-kernel rank, packed
        # tile-relative mean, dead/saturated lanes already inerted) — no
        # dense merge sorts, no (rows, MP)-scale XLA tile-id stage, no
        # dead-masking pass over the payload
        from gsrt.ops.pair_expand import expand_pairs_binned
        tabf = jax.lax.bitcast_convert_type(
            jnp.stack(tab_rows, axis=0), jnp.float32)        # [8, N]
        rb = expand_pairs_binned(
            tabf, base, max_pairs, total=jnp.minimum(total, max_pairs),
            ntx=ntx, T=T, tile_w=tile_w, tile_h=tile_h,
            interpret=interpret)                             # [8, MP] int32
        sorted_ops = jax.lax.sort((rb[4], rb[0], rb[1], rb[2], rb[3]),
                                  num_keys=1, is_stable=True)
        tile_s = sorted_ops[0]
        feats_i = sorted_ops[1:5]
        pair_depth_s = unpack_bf16_lo(sorted_ops[3]) if carry_depth else None
        pad = chunk + 128
        zeros_row = jnp.zeros_like(tile_s)
        # dead lanes already carry rgba = 0 (inert) and the T sentinel;
        # mean/quad words on them are garbage-but-inert, as documented
        payload = jnp.stack(
            list(feats_i) + [jnp.minimum(tile_s, T)]
            + [zeros_row] * (COMPACT_STORE - COMPACT_WIDTH), axis=0)
        tail = jnp.where(
            jnp.arange(COMPACT_STORE)[:, None] == COMPACT_WIDTH - 1,
            jnp.full((COMPACT_STORE, pad), T, jnp.int32),
            jnp.zeros((COMPACT_STORE, pad), jnp.int32))
        payload = jnp.concatenate([payload, tail], axis=1)
        return TileBinning(
            payload=payload,
            tile_start=tile_start,
            tile_count=counts,
            total_pairs=total.astype(jnp.int32),
            overflow=overflow,
            pair_depth=pair_depth_s,
        )
    if expand_impl in ("pallas", "fused"):
        from gsrt.ops.pair_expand import expand_pairs, expand_pairs_fused
        ep = expand_pairs_fused if expand_impl == "fused" else expand_pairs
        tabf = jax.lax.bitcast_convert_type(
            jnp.stack(tab_rows, axis=0), jnp.float32)        # [8, N]
        e = jax.lax.bitcast_convert_type(
            ep(tabf, base, max_pairs, interpret=interpret),
            jnp.int32)                                       # [8, MP]
        e0, gbase = e[0], e[1]
        m2xp, m2yp, qabp, qcdp, rgbap = (e[i] for i in range(2, 7))
    else:
        rows = jnp.repeat(jnp.stack(tab_rows, axis=-1), touched_s, axis=0,
                          total_repeat_length=max_pairs)     # [MP, 8]
        e0, gbase = rows[:, 0], rows[:, 1]
        m2xp, m2yp, qabp, qcdp, rgbap = (rows[:, i] for i in range(2, 7))

    gx0 = e0 & 0xFFF
    gy0 = (e0 >> 12) & 0xFFF
    gw = jnp.maximum((e0 >> 24) & 0x7F, 1)
    slots = jnp.arange(max_pairs, dtype=jnp.int32)
    valid = slots < jnp.minimum(total, max_pairs)
    rank = slots - gbase
    tx = gx0 + rank % gw
    ty = gy0 + rank // gw
    tile = jnp.where(valid, ty * ntx + tx, T).astype(jnp.int32)

    # tile-relative fixed-point mean (garbage on dead slots — zeroed below)
    mx_rel = (jax.lax.bitcast_convert_type(m2xp, jnp.float32)
              - (tx * tile_w).astype(jnp.float32))
    my_rel = (jax.lax.bitcast_convert_type(m2yp, jnp.float32)
              - (ty * tile_h).astype(jnp.float32))
    meanp = pack_mean_rel(mx_rel, my_rel)
    # a mean past the coarse tier's ±2048 px range would decode clamped
    # and paint a ghost; such a pair's TRUE response is near the alpha
    # threshold (the tile sits >2 Kpx from the mean, so only a >600-px-σ
    # tail reaches it) — drop it instead of mis-decoding
    mean_sat = ((jnp.abs(mx_rel) >= MEAN_COARSE_BIAS - 0.5)
                | (jnp.abs(my_rel) >= MEAN_COARSE_BIAS - 0.5))
    rgbap = jnp.where(mean_sat, 0, rgbap)   # opacity 0 -> inert

    # --- stable tile sort: 5 int32 operands ---
    sorted_ops = jax.lax.sort((tile, meanp, qabp, qcdp, rgbap),
                              num_keys=1, is_stable=True)
    tile_s = sorted_ops[0]
    feats_i = sorted_ops[1:5]
    pair_depth_s = unpack_bf16_lo(sorted_ops[3]) if carry_depth else None

    # --- 5-row int32 payload; dead rows zero (opacity 0 → inert), tile
    # row keeps the T sentinel. NOTE: zeroing every feature row here is
    # cosmetic — rgba = 0 alone inerts a lane in the kernel; the binned
    # and group-stream emit paths zero ONLY rgba, so payload bytes on
    # dead lanes differ across paths (blend output is identical,
    # verified by the parity tests) ---
    dead = tile_s >= T
    pad = chunk + 128
    zeros_row = jnp.zeros_like(tile_s)
    payload = jnp.stack(
        [jnp.where(dead, 0, f) for f in feats_i]
        + [jnp.minimum(tile_s, T)]
        + [zeros_row] * (COMPACT_STORE - COMPACT_WIDTH), axis=0)  # [8, MP]
    tail = jnp.where(
        jnp.arange(COMPACT_STORE)[:, None] == COMPACT_WIDTH - 1,
        jnp.full((COMPACT_STORE, pad), T, jnp.int32),
        jnp.zeros((COMPACT_STORE, pad), jnp.int32))
    payload = jnp.concatenate([payload, tail], axis=1)

    return TileBinning(
        payload=payload,
        tile_start=tile_start,
        tile_count=counts,
        total_pairs=total.astype(jnp.int32),
        overflow=overflow,
        pair_depth=pair_depth_s,
    )
