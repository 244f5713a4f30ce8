"""Pallas TPU kernel: splat-table → pair-table run expansion.

Replaces `jnp.repeat(tab, touched, total_repeat_length=max_pairs)` in the
tile binning (measured ~65 ms at 3M pairs on v5e — XLA lowers the ragged
repeat to cumsum + searchsorted + random row gathers at ~27 ns/row). Here
the same monotone gather is a streaming kernel at HBM bandwidth.

Split of work:
  * XLA computes the per-pair SOURCE INDEX s(p) (the splat covering pair p)
    with one sort-based merge (`searchsorted(base, arange(MP), 'sort')` —
    ~2 ms at 3M rows, nothing like the 65 ms row-gather repeat);
  * the kernel gathers out[:, p] = tab[:, s(p)] with a BARREL SHIFTER over
    the window: the shift distance d(q) = q - s_window(q) is monotone
    non-decreasing with steps in {0, 1} (s is a run index: it advances by
    0 or 1 per pair), and for such distances the log-step shifter is exact.
    Induction: before processing bit b, every lane q holds
    tab[q - (d(q) & ~(2b-1))]; if bit b of d(q) is set, lane q takes from
    lane q-b, whose own residual d(q-b) ∈ [d(q)-b, d(q)] shares the high
    bits of d(q) above b (unit steps make larger drops impossible), so the
    taken value is tab[(q-b) - (d(q) & ~(2b-1))] — the invariant at bit b.

Per output chunk of C pairs the kernel DMAs one aligned [TAB_ROWS, C+128]
window of the depth-sorted splat table (pair-generating splats are
compacted to a prefix and each emits >= 1 pair, so the window covers every
source) and one [8, C+128] window of the s(p) row. All shifter traffic
runs on an int32 bit view: several table rows are small ints bitcast into
f32 (denormals), and TPU float select paths flush denormals to zero —
integer ops never do.

The kernel expands all 11 table rows (4 geometry + 7 features); tile-id
math stays in XLA on the expanded geometry rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TAB_ROWS = 16          # 11 used + pad to a clean sublane count
_DEAD_BASE = 1 << 30   # base sentinel for splats with no pairs


def _expand_kernel(
    # scalar prefetch
    src_start_ref,         # [G] int32: first table row covering pair g*C,
                           # already rounded down to a 128 multiple
    # (emit mode only) misc_ref,  # [1] int32: live pair count
    # then inputs
    *rest,                 # tabf_hbm [TAB_ROWS, N_pad] f32 feature-major;
                           # srow_hbm [8, MP + 128] int32, row 0 = s(p)
                           #   with a 128-lane zero prefix;
                           # out_ref [rows, C] VMEM (int32 in emit mode);
                           # scratch tbuf [2, rows, W] f32,
                           #   sbuf [2, 8, W] int32, sem (2, 2)
    chunk: int, window: int, emit: dict | None = None,
):
    if emit is not None:
        misc_ref, tabf_hbm, srow_hbm, out_ref, tbuf, sbuf, sem = rest
    else:
        tabf_hbm, srow_hbm, out_ref, tbuf, sbuf, sem = rest
    g = pl.program_id(0)
    ng = pl.num_programs(0)
    C, W = chunk, window

    def dma_t(slot, gi):
        col = pl.multiple_of(src_start_ref[gi], 128)
        return pltpu.make_async_copy(
            tabf_hbm.at[:, pl.ds(col, W)], tbuf.at[slot], sem.at[slot, 0])

    def dma_s(slot, gi):
        # frame lane 0 of chunk gi is pair gi*C - 128 = srow column gi*C
        return pltpu.make_async_copy(
            srow_hbm.at[:, pl.ds(gi * C, W)], sbuf.at[slot],
            sem.at[slot, 1])

    @pl.when(g == 0)
    def _():
        dma_t(0, 0).start()
        dma_s(0, 0).start()

    slot = jax.lax.rem(g, 2)

    @pl.when(g + 1 < ng)
    def _():
        dma_t(1 - slot, g + 1).start()
        dma_s(1 - slot, g + 1).start()

    dma_t(slot, g).wait()
    dma_s(slot, g).wait()

    y = pltpu.bitcast(tbuf[slot], jnp.int32)         # (TAB_ROWS, W)

    # window-local source lane and shift distance per frame lane q
    # (lane 128 = pair g*C; lanes [0, 128) are the alignment prefix, whose
    # clamped d keeps the global monotone-unit-step property the shifter
    # correctness proof needs)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    s_w = sbuf[slot][0:1, :] - src_start_ref[g]
    s_w = jnp.minimum(jnp.maximum(s_w, 0), lane)
    d = lane - s_w                                   # (1, W), in [0, q]

    b = 1
    while b * 2 < W:
        b *= 2
    while b >= 1:
        take = (d & b) != 0
        y = jnp.where(take, pltpu.roll(y, shift=b, axis=1), y)
        b //= 2

    if emit is None:
        out_ref[...] = pltpu.bitcast(y[:, 128:128 + C], jnp.float32)
    else:
        jcol = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        _emit_binned_rows(y[:, 128:128 + C], g * C + jcol, misc_ref[0],
                          out_ref, emit)


def _emit_binned_rows(z, p, total, out_ref, emit):
    """Binned emit shared by the expand kernels: from the expanded compact
    table window z ([8, C] int32, _build_compact row order) and the global
    pair indices p ([1, C]), compute tile id + packed tile-relative mean
    and write the 5 tile-sort operands (COMPACT_STORE row order) with dead
    lanes sentineled/inerted. All (1, C)/(8, C)-scale — replaces the XLA
    tile-id stage that otherwise runs at (rows, MP) scale."""
    C = z.shape[1]
    e0 = z[0:1]
    gx0 = e0 & 0xFFF
    gy0 = (e0 >> 12) & 0xFFF
    gw = jnp.maximum((e0 >> 24) & 0x7F, 1)
    rank = jnp.maximum(p - z[1:2], 0)                # pair rank in its splat
    # rank // gw via f32 division (no integer vector divide on the VPU).
    # Exact-multiple quotients divide exactly in f32; otherwise the result
    # is >= 1/127 away from the next integer, far beyond 0.5 ulp — but two
    # conditional fixups make the decomposition exact regardless
    qf = jnp.floor(rank.astype(jnp.float32)
                   / gw.astype(jnp.float32)).astype(jnp.int32)
    m = rank - qf * gw
    over = m >= gw
    qf = jnp.where(over, qf + 1, qf)
    m = jnp.where(over, m - gw, m)
    under = m < 0
    qf = jnp.where(under, qf - 1, qf)
    m = jnp.where(under, m + gw, m)
    tx = gx0 + m
    ty = gy0 + qf
    tile = ty * emit["ntx"] + tx
    mx_rel = (pltpu.bitcast(z[2:3], jnp.float32)
              - tx.astype(jnp.float32) * float(emit["tile_w"]))
    my_rel = (pltpu.bitcast(z[3:4], jnp.float32)
              - ty.astype(jnp.float32) * float(emit["tile_h"]))

    from gsrt.ops.tile_binning import (MEAN_COARSE_BIAS, MEAN_COARSE_SCALE,
                                       MEAN_FINE_BIAS, MEAN_FINE_SCALE)

    def pack_axis(v):                # == tile_binning._pack_mean_axis
        fine = jnp.clip(jnp.round((v + MEAN_FINE_BIAS) * MEAN_FINE_SCALE),
                        0, 32767).astype(jnp.int32)
        coarse = jnp.clip(
            jnp.round((v + MEAN_COARSE_BIAS) * MEAN_COARSE_SCALE),
            0, 32767).astype(jnp.int32) | 0x8000
        return jnp.where((v >= -MEAN_FINE_BIAS) & (v < MEAN_FINE_BIAS),
                         fine, coarse)

    meanp = (pack_axis(mx_rel) << 16) | pack_axis(my_rel)
    # saturated-mean pairs mis-decode clamped — inert them (opacity 0),
    # exactly as _finish_compact's XLA path does
    mean_sat = ((jnp.abs(mx_rel) >= MEAN_COARSE_BIAS - 0.5)
                | (jnp.abs(my_rel) >= MEAN_COARSE_BIAS - 0.5))
    dead = p >= total
    rgba = jnp.where(mean_sat | dead, 0, z[6:7])
    tile = jnp.where(dead, emit["T"], tile)
    zero = jnp.zeros((1, C), jnp.int32)
    out_ref[0:1] = meanp
    out_ref[1:2] = z[4:5]                            # qab
    out_ref[2:3] = z[5:6]                            # qcd
    out_ref[3:4] = rgba
    out_ref[4:5] = tile
    out_ref[5:6] = zero
    out_ref[6:7] = zero
    out_ref[7:8] = zero


def _rank_at(base_c: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """rank[i] = #{j: base_c[j] <= queries[i]} - 1 (so -1 before the first
    base). Same two packed single-operand sorts as _merge_rank, but over
    n + len(queries) rows — used for COARSE ranks (~3% of the rows the
    dense merge pays). queries must be sorted ascending, non-negative,
    with 2·max(query)+1 < 2^31 (the key packing)."""
    nq = queries.shape[0]
    packed = jnp.concatenate([base_c * 2, queries * 2 + 1])
    p1 = jax.lax.sort(packed, is_stable=False)
    is_query = p1 & 1
    ranks = jnp.cumsum(1 - is_query) - 1          # may be -1: no base yet
    packed2 = ((1 - is_query) << 30) | (ranks + 1)  # keep ranks >= 0
    p2 = jax.lax.sort(packed2, is_stable=False)
    return (p2[:nq] & ((1 << 30) - 1)) - 1


def _merge_rank(base: jnp.ndarray, mp: int, n: int) -> jnp.ndarray:
    """s[p] = clip(#{j: base[j] <= p} - 1, 0, n-1) for p in [0, mp).

    base must be sorted ascending (strictly increasing over live splats,
    then _DEAD_BASE sentinels). Implemented as a sorted merge with the
    tag PACKED into the key so both passes are single-operand sorts
    (operand count is the dominant sort cost on TPU):
      1. sort (key·2 + tag) with tag splat=0/query=1 — a splat ties
         BEFORE the equal query, giving side='right' counts;
      2. inclusive cumsum of the tag complement = splats seen so far;
      3. compact the query ranks back out in order by sorting
         (query_flag << 30) | rank — queries (flag 0) come first and,
         being mutually ascending, stay in query order.
    Bit budget: key·2+tag needs mp·2 < 2^31 and rank < 2^30 — fine for
    any realistic pair buffer (mp < 2^30).
    """
    queries = jnp.arange(mp, dtype=jnp.int32)
    base_c = jnp.minimum(base, mp)               # _DEAD_BASE would overflow
    packed = jnp.concatenate([base_c * 2, queries * 2 + 1])
    p1 = jax.lax.sort(packed, is_stable=False)   # packed keys are distinct
    is_query = p1 & 1
    ranks = jnp.maximum(jnp.cumsum(1 - is_query) - 1, 0)
    # unstable is safe: splat words are distinct (ranks strictly increase at
    # splat slots) and tied QUERY words are bit-identical (flag 0, equal
    # rank), so any tie order yields the same output array
    packed2 = ((1 - is_query) << 30) | ranks     # splats flagged to the top
    p2 = jax.lax.sort(packed2, is_stable=False)
    return jnp.clip(p2[:mp] & ((1 << 30) - 1), 0, n - 1).astype(jnp.int32)


def _base_window_cols(window: int) -> int:
    """Lane width of the fused kernel's transposed-base VMEM window: the
    logical need is window//128 + 3 columns at an arbitrary origin, but
    Mosaic lane slices must be 128-aligned with 128-multiple shapes — so
    the window floors to an aligned origin (adding up to 127 columns of
    skew) and rounds the total up to a lane tile."""
    need = window // 128 + 3 + 127
    return -(-need // 128) * 128


def _expand_fused_kernel(
    # scalar prefetch
    coarse_ref,            # [TP + 2] int32: 128·K floor rank at pair
                           # (i-1)*128 (see tile_body; entry 0 covers the
                           # -128 prefix tile with a negative sentinel)
    src_start_ref,         # [G] int32: 128-aligned first table col, chunk g
    # (emit mode only) misc_ref,  # [1] int32: live pair count
    # inputs
    *rest,                 # tabf_hbm [rows, N_pad] f32 feature-major table;
                           # baset_hbm [128, NT] int32: base TRANSPOSED —
                           #   column c = bases [c*128, (c+1)*128) down the
                           #   sublanes;
                           # out_ref [rows, C] VMEM (int32 in emit mode);
                           # scratch: tbuf [2, rows, W] f32, bbuf
                           #   [2, 128, BW] int32, dbuf [1, W] int32,
                           #   sem (2, 2)
    chunk: int, window: int, emit: dict | None = None,
):
    """expand_pairs with the pair->source merge computed IN the kernel.

    The XLA path pays two single-operand sorts over N + max_pairs rows
    (_merge_rank) to hand the kernel a dense s(p) row. But s is monotone
    with unit steps, so within one 128-pair output tile starting at pair
    p_t with known s_t = s(p_t), the only candidate sources are the next
    128 splats, and  s(p) = s_t + #{j: p_t < base_j <= p}  — a pure VALUE
    count against <=256 base entries. The count wants its result along
    LANES (the shifter's axis) while the compare wants bases along
    SUBLANES; loading the base array PRE-TRANSPOSED (an XLA transpose,
    cheap outside Pallas) makes the count a sublane reduction that lands
    lane-major with no in-kernel transpose. Coarse s at 128-pair
    granularity rides in as prefetched scalars (one ~N+TP-row sort, ~3%
    the rows of the two merge sorts this replaces).

    emit (expand_pairs_binned): instead of the raw expanded table, emit
    the COMPACT tile-sort operands directly — per-pair tile id (from the
    in-kernel rank, replacing the XLA mod/div tile-id stage), the
    tile-relative two-tier packed mean (tile_binning.pack_mean_rel
    arithmetic), and the Cholesky/rgba words — with dead lanes already
    sentineled/inerted. Keys of `emit`: ntx, tile_w, tile_h, T (sentinel
    tile id). Requires the extra misc_ref prefetch row carrying the live
    pair count, and the 8-row compact table layout (_build_compact).
    """
    if emit is not None:
        misc_ref, tabf_hbm, baset_hbm, out_ref, tbuf, bbuf, dbuf, sem = rest
    else:
        tabf_hbm, baset_hbm, out_ref, tbuf, bbuf, dbuf, sem = rest
    g = pl.program_id(0)
    ng = pl.num_programs(0)
    C, W = chunk, window
    TILES = W // 128           # prefix tile + C/128 chunk tiles
    BCOLS = _base_window_cols(W)

    def dma_t(slot, gi):
        col = pl.multiple_of(src_start_ref[gi], 128)
        return pltpu.make_async_copy(
            tabf_hbm.at[:, pl.ds(col, W)], tbuf.at[slot], sem.at[slot, 0])

    def _bcol0(gi):
        # transposed-base columns covering table cols
        # [col - 128, col + W + 256): one column earlier for the prefix
        # tile's candidates, spares at the end for strip overreach. Mosaic
        # lane slices must be 128-aligned with 128-multiple shapes, so the
        # window floors to the enclosing BCOLS-wide aligned block.
        col_lo = jnp.maximum(src_start_ref[gi] // 128 - 1, 0)
        return pl.multiple_of((col_lo // 128) * 128, 128)

    def dma_b(slot, gi):
        return pltpu.make_async_copy(
            baset_hbm.at[:, pl.ds(_bcol0(gi), BCOLS)],
            bbuf.at[slot], sem.at[slot, 1])

    @pl.when(g == 0)
    def _():
        dma_t(0, 0).start()
        dma_b(0, 0).start()

    slot = jax.lax.rem(g, 2)

    @pl.when(g + 1 < ng)
    def _():
        dma_t(1 - slot, g + 1).start()
        dma_b(1 - slot, g + 1).start()

    dma_t(slot, g).wait()
    dma_b(slot, g).wait()

    col0 = src_start_ref[g]
    bstart = _bcol0(g)                               # aligned window origin
    bw = bbuf[slot]                                  # (128, BCOLS)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def do_tile(t):
        # global pair tile index; tile t covers pairs [p_t, p_t + 128)
        p_t = (g * C - 128) + t * 128
        # FLOOR coarse rank: s_t = 128·K with K = #{k: base[128k] <= p_t}−1,
        # so the true #{j: base_j <= p_t} ∈ [s_t+1, s_t+128] (sorted bases).
        # Counting ALL bases <= p over strip columns K, K+1 (j ∈
        # [s_t, s_t+256)) then gives s(p) = s_t + cnt − 1 exactly: every
        # j < s_t has base_j <= base[s_t] <= p_t, and
        # #{j: base_j <= p} <= (s_t+128) + 127 < s_t + 256 (each splat
        # emits >= 1 pair, and p <= p_t + 127)
        s_t = coarse_ref[g * (C // 128) + t]
        # 256-candidate base strip, sublane-major: columns floor(s_t/128)
        # and +1 of the transposed base window
        # bbuf columns start one 128-block BEFORE col0 (bstart) so the
        # PREFIX tile's true candidates (s >= col0 - 128) are reachable —
        # wrong prefix s would break the shifter's global monotone
        # unit-step invariant that real lanes read through
        cb = (s_t - bstart * 128) // 128
        cb = jnp.clip(cb, 0, bw.shape[1] - 2)
        # column select: Mosaic has no dynamic_slice on values; a dynamic
        # lane ROTATE brings columns (cb, cb+1) to lanes (0, 1), then two
        # static 1-lane slices read them — far cheaper than the earlier
        # masked lane-sum form (two full (128, BW) where+reduce passes
        # per tile)
        # roll semantics: out[i] = in[(i - shift) mod n]; lane 0 <- col cb
        # needs shift = -cb, expressed non-negatively as (n - cb) mod n
        rot = pltpu.roll(bw, shift=jax.lax.rem(bw.shape[1] - cb,
                                               bw.shape[1]), axis=1)
        # two separate 128-candidate counts: concatenating the two (128,1)
        # column slices is an unsupported offset-mismatched tpu.concatenate
        # on v5e Mosaic ("result/input offset mismatch on non-concat
        # dimension") — summing the two partial counts is equivalent
        p_lane = p_t + lane128                       # (1, 128)

        def _cnt(strip):                             # strip: (128, 1)
            return jnp.sum((strip <= p_lane).astype(jnp.int32),
                           axis=0, keepdims=True)

        cnt = _cnt(rot[:, 0:1]) + _cnt(rot[:, 1:2])
        s_lane = s_t + cnt - 1                       # (1, 128) global s
        q_lane = t * 128 + lane128                   # window lane index
        s_w = jnp.minimum(jnp.maximum(s_lane - col0, 0), q_lane)
        d = q_lane - s_w
        dbuf[0:1, pl.ds(t * 128, 128)] = d

    # manually partially unrolled: at TILES ≈ 129 sequential iterations
    # per chunk, Mosaic's fori_loop branch overhead dominated the whole
    # kernel (the round-3 "masked-sum selects cost more than the merge
    # sorts" verdict was largely loop overhead). Mosaic only supports
    # full/no unroll on fori_loop, so group 16 tiles per trip by hand;
    # the remainder tiles run as straight-line code.
    UNROLL = 16

    def tile_group(tg, _):
        for u in range(UNROLL):
            do_tile(tg * UNROLL + u)
        return _

    jax.lax.fori_loop(0, TILES // UNROLL, tile_group, 0)
    for t in range(TILES - TILES % UNROLL, TILES):
        do_tile(t)

    y = pltpu.bitcast(tbuf[slot], jnp.int32)         # (rows, W)
    d = dbuf[0:1, :]                                 # (1, W)

    b = 1
    while b * 2 < W:
        b *= 2
    while b >= 1:
        take = (d & b) != 0
        y = jnp.where(take, pltpu.roll(y, shift=b, axis=1), y)
        b //= 2

    if emit is None:
        out_ref[...] = pltpu.bitcast(y[:, 128:128 + C], jnp.float32)
    else:
        jcol = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        _emit_binned_rows(y[:, 128:128 + C], g * C + jcol, misc_ref[0],
                          out_ref, emit)


def _merge_rank_blocked(base: jnp.ndarray, mp_pad: int,
                        n: int) -> jnp.ndarray:
    """s[p] = clip(#{j: base[j] <= p} - 1, 0, n-1) for p in [0, mp_pad) —
    the same value as _merge_rank, computed WITHOUT the two N+MP-row merge
    sorts. Three cheap steps:
      1. floor ranks at 128-pair granularity from the 128-DOWNSAMPLED base
         (one _rank_at over N/128 + MP/128 rows — ~1% of the merge rows);
      2. per 128-pair block, slice-gather the 256-candidate base strip at
         the floor (vmapped dynamic_slice → contiguous-row gather);
      3. a broadcast compare-reduce refines each pair's rank against
         its strip: #{j: base_j <= p} = 128·K + #{j in strip: base_j <= p}
         (every j < 128·K has base_j <= base[128K] <= p_t <= p, and the
         count can exceed the strip by nothing: count(p_t) <= 128K + 128
         and p - p_t <= 127 with strictly increasing bases).
    MEASURED LOSER on v5e (tools/sort_probe.py, 2026-08-21, 3.15M pairs):
    24.7 ms vs 9.8 ms for _merge_rank — the (TP, 128, 256) compare-reduce
    does not fuse on this backend. Kept as the reference implementation
    for the in-kernel count logic (its unit test cross-checks the fused
    kernel's rank math); do NOT put it back on the default path without
    a fresh measurement.
    """
    TP = mp_pad // 128
    base_c = jnp.minimum(base, mp_pad)
    base128 = base_c[::128]
    qs = jnp.arange(TP, dtype=jnp.int32) * 128       # block start pairs
    K = jnp.maximum(_rank_at(base128, qs), 0)        # (TP,) floor/128
    starts = K * 128
    # pad so starts + 255 stays in bounds (dead tail reads sentinels)
    base_pad = jnp.concatenate(
        [base_c, jnp.full((256,), mp_pad, jnp.int32)])
    strips = jax.vmap(
        lambda s: jax.lax.dynamic_slice(base_pad, (s,), (256,)))(starts)
    p = qs[:, None] + jnp.arange(128, dtype=jnp.int32)[None, :]
    cnt = jnp.sum(strips[:, None, :] <= p[:, :, None],
                  axis=-1).astype(jnp.int32)         # (TP, 128), fused
    s = starts[:, None] + cnt - 1
    return jnp.clip(s.reshape(mp_pad), 0, n - 1).astype(jnp.int32)


def expand_pairs(tabf: jnp.ndarray, base: jnp.ndarray, max_pairs: int,
                 *, chunk: int = 16384, interpret: bool = False,
                 emit: dict | None = None, total=None) -> jnp.ndarray:
    """Expand a depth-sorted splat table to the pair table.

    tabf: [rows, N] f32, feature-major (rows must be a multiple of 8; the
      compact payload uses 8, the f32 payload 16 = TAB_ROWS); one row must
      hold the splat's first-pair offset ("base", int32 bitcast), with
      _DEAD_BASE for splats that generate no pairs; pair-generating splats
      must form a prefix and bases must be strictly increasing (each
      generates >= 1 pair).
    base: [N] int32 — the same base column (used for the source-index merge
      and to locate chunk windows).

    Returns [rows, max_pairs] f32 where column p = tabf[:, s(p)] with
    s(p) the splat covering pair p.

    chunk: output pairs per grid step. Large chunks amortize the ~10 us
    per-step Mosaic overhead (512-pair chunks measured 71 ms at 3.7M pairs
    — SLOWER than the XLA repeat; 4096 still paid ~10 ms of pure grid
    overhead at 4.19M pairs). 16384 costs ~3.2 MB of double-buffered VMEM,
    well under the 16 MB scoped limit.
    """
    rows = tabf.shape[0]
    assert rows % 8 == 0, "table rows must fill whole f32 sublane tiles"
    assert chunk % 128 == 0
    chunk = min(chunk, max(128, (max_pairs // 128) * 128))
    # pad the pair axis up to a chunk multiple; callers slice back
    mp_pad = -(-max_pairs // chunk) * chunk
    N = tabf.shape[1]
    W = chunk + 128
    G = mp_pad // chunk

    # pad the table so any aligned window read stays in bounds
    n_pad = W + ((-N) % 128)
    tabf = jnp.pad(tabf, ((0, 0), (0, n_pad)))

    # per-pair source index via the two-packed-sort merge. Measured on v5e
    # at 3.15M pairs / 1M splats (tools/sort_probe.py, 2026-08-21):
    # _merge_rank 9.8 ms vs _merge_rank_blocked 24.7 ms — the blocked
    # form's (TP, 128, 256) strip compare-reduce does NOT fuse on this
    # backend and its brief round-4 stint as the default here cost the
    # whole frame ~7 ms (BENCH_r04 22.76 vs 27.0 with this line reverted).
    s_pair = _merge_rank(base, mp_pad, N)
    srow = jnp.pad(s_pair[None, :], ((0, 7), (128, 0)))  # [8, mp_pad + 128]

    # first table row covering pair g*C, 128-aligned down for the window
    src_start = jax.lax.slice(s_pair, (0,), (mp_pad,), (chunk,))
    src_start = (src_start // 128) * 128

    # Materialize operands before the Pallas call: on the axon TPU backend,
    # fusing XLA producers into kernel operands yields wrong layouts /
    # garbage reads (same failure mode documented in render_tiled for the
    # blend kernel; verified again here — the kernel is exact on
    # materialized inputs and wrong on fused ones).
    tabf, srow, src_start = jax.lax.optimization_barrier(
        (tabf, srow, src_start))

    kernel = functools.partial(_expand_kernel, chunk=chunk, window=W,
                               emit=emit)
    n_prefetch = 1 if emit is None else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((rows, chunk),
                               index_map=lambda g, *_: (0, g)),
        scratch_shapes=[
            pltpu.VMEM((2, rows, W), jnp.float32),
            pltpu.VMEM((2, 8, W), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out_dtype = jnp.float32 if emit is None else jnp.int32
    args = (src_start,) if emit is None else \
        (src_start, jnp.reshape(total, (1,)).astype(jnp.int32))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, mp_pad), out_dtype),
        interpret=interpret,
    )(*args, tabf, srow)
    return out[:, :max_pairs] if mp_pad != max_pairs else out


def expand_pairs_binned(tabf: jnp.ndarray, base: jnp.ndarray,
                        max_pairs: int, *, total, ntx: int, T: int,
                        tile_w: int, tile_h: int, chunk: int = 16384,
                        interpret: bool = False) -> jnp.ndarray:
    """Fused expansion that emits the compact TILE-SORT OPERANDS directly.

    tabf must be the 8-row compact table (f32 bitcast of _build_compact's
    tab_rows: xy0ws, base, m2x, m2y, qab, qcd, rgba, pad). Returns an
    int32 [8, max_pairs] array in COMPACT_STORE row order:
    row 0 packed tile-relative mean, 1 qab, 2 qcd, 3 rgba (zeroed on dead
    or mean-saturated lanes), 4 tile id (T sentinel past `total`), 5-7
    zero pad. On top of expand_pairs_fused this moves the tile-id mod/div,
    the mean rebase + two-tier quantization, and the dead masking from
    (rows, MP)-scale XLA ops to (1, C)-scale in-kernel ops.

    total: traced int32 — live pair count (callers pass
    min(total_pairs, max_pairs))."""
    # fused-kernel form: in-kernel 256-candidate rank counts replace the
    # dense merge entirely. Measured on v5e at 3.15M pairs / 1M splats
    # (tools/sort_probe.py, 2026-08-21): expand_fused 9.4 ms total vs
    # 9.8 ms for the dense _merge_rank ALONE (+ the shifter kernel on
    # top) — the round-3 "fused loses" verdict was Mosaic fori_loop
    # branch overhead, fixed by the 16-way manual unroll in
    # _expand_fused_kernel.
    return _expand_fused_common(
        tabf, base, max_pairs, chunk=chunk, interpret=interpret,
        emit={"ntx": ntx, "tile_w": tile_w, "tile_h": tile_h, "T": T},
        total=total)


def expand_pairs_fused(tabf: jnp.ndarray, base: jnp.ndarray, max_pairs: int,
                       *, chunk: int = 16384,
                       interpret: bool = False) -> jnp.ndarray:
    """`expand_pairs` with the dense pair→source merge moved INTO the
    kernel (_expand_fused_kernel): replaces the two N+max_pairs-row merge
    sorts with one small coarse-rank sort (N + max_pairs/128 rows) plus
    in-kernel 256-candidate value counts. Same contract as expand_pairs.
    """
    return _expand_fused_common(tabf, base, max_pairs, chunk=chunk,
                                interpret=interpret, emit=None, total=None)


def _expand_fused_common(tabf, base, max_pairs, *, chunk, interpret,
                         emit, total):
    # The fused kernel prefetches its 128-pair-granular coarse ranks into
    # SMEM: [mp_pad/128 + 3] int32. SMEM is 1 MB on v5e, so huge pair
    # buffers (> ~2^24 pairs; seen at 50M+ pairs when a close-up camera
    # inflates every footprint) must fall back to the plain kernel, whose
    # only SMEM operand is the tiny per-chunk src_start row (the dense
    # s(p) row streams from HBM).
    if max_pairs // 128 + 3 > (1 << 17):
        return expand_pairs(tabf, base, max_pairs, chunk=chunk,
                            interpret=interpret, emit=emit, total=total)
    rows = tabf.shape[0]
    assert rows % 8 == 0, "table rows must fill whole f32 sublane tiles"
    assert chunk % 128 == 0
    chunk = min(chunk, max(128, (max_pairs // 128) * 128))
    mp_pad = -(-max_pairs // chunk) * chunk
    N = tabf.shape[1]
    W = chunk + 128
    G = mp_pad // chunk
    TP = mp_pad // 128

    # pad the table so any aligned window read stays in bounds
    n_pad = W + ((-N) % 128)
    tabf = jnp.pad(tabf, ((0, 0), (0, n_pad)))
    n_tot = N + n_pad

    # value-clamped bases: dead sentinels become mp_pad (> any pair id, so
    # the in-kernel value test never counts them)
    base_c = jnp.minimum(base, mp_pad)
    # TRANSPOSED base array: baseT[l, c] = base_c[c*128 + l] — one XLA
    # transpose so strips load sublane-major in the kernel (cheap here,
    # a relayout nightmare in Mosaic). +3 spare columns for strip/window
    # overreach past the last real splat.
    bt_cols = n_tot // 128 + _base_window_cols(W)
    base_pad = jnp.full((bt_cols * 128,), mp_pad, jnp.int32)
    base_pad = jax.lax.dynamic_update_slice_in_dim(base_pad, base_c, 0, 0)
    baset = base_pad.reshape(bt_cols, 128).T         # [128, bt_cols]

    # FLOOR coarse ranks from the 128-DOWNSAMPLED base array:
    # coarse[i] = 128·K with K = #{k: base[128k] <= (i-1)*128} − 1, i.e.
    # the true s is within [coarse, coarse+127] and the kernel's two
    # 128-candidate strips recover it exactly (see tile_body). Sorting
    # N/128 + TP rows instead of N + TP makes the coarse stage ~free
    # (the full-resolution _rank_at measured 4.75 ms at 1M splats).
    # Entry 0 (the -128 prefix tile) stays a negative sentinel.
    qs = jnp.arange(TP + 1, dtype=jnp.int32) * 128   # pairs 0,128,...
    base128 = base_c[::128]
    coarse = jnp.concatenate(
        [jnp.full((1,), -128, jnp.int32),
         _rank_at(base128, qs).astype(jnp.int32) * 128,
         jnp.zeros((1,), jnp.int32)])                # [TP + 3]
    # first table column of chunk g: s at pair g*C, floored to 128
    s_chunk = coarse[jnp.arange(G, dtype=jnp.int32) * (chunk // 128) + 1]
    src_start = (jnp.maximum(s_chunk, 0) // 128) * 128

    tabf, baset, coarse, src_start = jax.lax.optimization_barrier(
        (tabf, baset, coarse, src_start))

    kernel = functools.partial(_expand_fused_kernel, chunk=chunk, window=W,
                               emit=emit)
    n_prefetch = 2 if emit is None else 3
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((rows, chunk),
                               index_map=lambda g, *_: (0, g)),
        scratch_shapes=[
            pltpu.VMEM((2, rows, W), jnp.float32),
            pltpu.VMEM((2, 128, _base_window_cols(W)), jnp.int32),
            pltpu.VMEM((1, W), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out_dtype = jnp.float32 if emit is None else jnp.int32
    args = (coarse, src_start) if emit is None else \
        (coarse, src_start, jnp.reshape(total, (1,)).astype(jnp.int32))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, mp_pad), out_dtype),
        interpret=interpret,
    )(*args, tabf, baset)
    return out[:, :max_pairs] if mp_pad != max_pairs else out
