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
    # inputs
    tabf_hbm,              # [TAB_ROWS, N_pad] f32 feature-major table
    srow_hbm,              # [8, MP + 128] int32, row 0 = s(p) with a
                           # 128-lane zero prefix (frame alignment)
    # outputs
    out_ref,               # [TAB_ROWS, C] VMEM
    # scratch
    tbuf,                  # [2, rows, W] VMEM f32
    sbuf,                  # [2, 8, W] VMEM int32
    sem,                   # DMA semaphores (2, 2)
    *,
    chunk: int, window: int,
):
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

    out_ref[...] = pltpu.bitcast(y[:, 128:128 + C], jnp.float32)


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
    coarse_ref,            # [TP + 2] int32: s at pair (i-1)*128 (entry 0
                           # covers the -128 prefix tile; clamped >= 0)
    src_start_ref,         # [G] int32: 128-aligned first table col, chunk g
    # inputs
    tabf_hbm,              # [rows, N_pad] f32 feature-major table
    baset_hbm,             # [128, NT] int32: base TRANSPOSED — column c =
                           # bases [c*128, (c+1)*128) down the sublanes
    # outputs
    out_ref,               # [rows, C] VMEM
    # scratch
    tbuf,                  # [2, rows, W] VMEM f32
    bbuf,                  # [2, 128, BW] VMEM int32 (transposed base cols)
    dbuf,                  # [1, W] VMEM int32 (shift distances)
    sem,                   # DMA semaphores (2, 2)
    *,
    chunk: int, window: int,
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
    """
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

    def tile_body(t, _):
        # global pair tile index; tile t covers pairs [p_t, p_t + 128)
        p_t = (g * C - 128) + t * 128
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
        strip = jax.lax.concatenate(
            [rot[:, 0:1], rot[:, 1:2]], 0)           # (256, 1)
        p_lane = p_t + lane128                       # (1, 128)
        cnt = jnp.sum(((strip > p_t) & (strip <= p_lane)
                       ).astype(jnp.int32), axis=0, keepdims=True)
        s_lane = s_t + cnt                           # (1, 128) global s
        q_lane = t * 128 + lane128                   # window lane index
        s_w = jnp.minimum(jnp.maximum(s_lane - col0, 0), q_lane)
        d = q_lane - s_w
        dbuf[0:1, pl.ds(t * 128, 128)] = d
        return _

    jax.lax.fori_loop(0, TILES, tile_body, 0)

    y = pltpu.bitcast(tbuf[slot], jnp.int32)         # (rows, W)
    d = dbuf[0:1, :]                                 # (1, W)

    b = 1
    while b * 2 < W:
        b *= 2
    while b >= 1:
        take = (d & b) != 0
        y = jnp.where(take, pltpu.roll(y, shift=b, axis=1), y)
        b //= 2

    out_ref[...] = pltpu.bitcast(y[:, 128:128 + C], jnp.float32)


def expand_pairs(tabf: jnp.ndarray, base: jnp.ndarray, max_pairs: int,
                 *, chunk: int = 16384, interpret: bool = False) -> jnp.ndarray:
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

    # per-pair source index via a hand-rolled merge rank: two single-operand
    # packed sorts + a cumsum. jnp.searchsorted(method='sort') measured 70 ms
    # at 3.7M queries on v5e (it pays extra unsort/gather passes); this form
    # is ~5x cheaper. Exploits that queries are arange (already sorted).
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

    kernel = functools.partial(_expand_kernel, chunk=chunk, window=W)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((rows, chunk),
                               index_map=lambda g, ss: (0, g)),
        scratch_shapes=[
            pltpu.VMEM((2, rows, W), jnp.float32),
            pltpu.VMEM((2, 8, W), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, mp_pad), jnp.float32),
        interpret=interpret,
    )(src_start, tabf, srow)
    return out[:, :max_pairs] if mp_pad != max_pairs else out


def expand_pairs_fused(tabf: jnp.ndarray, base: jnp.ndarray, max_pairs: int,
                       *, chunk: int = 16384,
                       interpret: bool = False) -> jnp.ndarray:
    """`expand_pairs` with the dense pair→source merge moved INTO the
    kernel (_expand_fused_kernel): replaces the two N+max_pairs-row merge
    sorts with one small coarse-rank sort (N + max_pairs/128 rows) plus
    in-kernel 256-candidate value counts. Same contract as expand_pairs.
    """
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

    # coarse ranks: coarse[i] = s((i-1)*128); entry 0 (pair -128) = -1
    qs = jnp.arange(TP + 1, dtype=jnp.int32) * 128   # pairs 0,128,...
    coarse = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32),
         _rank_at(base_c, qs).astype(jnp.int32),
         jnp.zeros((1,), jnp.int32)])                # [TP + 3]
    # first table column of chunk g: s at pair g*C, floored to 128
    s_chunk = coarse[jnp.arange(G, dtype=jnp.int32) * (chunk // 128) + 1]
    src_start = (jnp.maximum(s_chunk, 0) // 128) * 128

    tabf, baset, coarse, src_start = jax.lax.optimization_barrier(
        (tabf, baset, coarse, src_start))

    kernel = functools.partial(_expand_fused_kernel, chunk=chunk, window=W)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((rows, chunk),
                               index_map=lambda g, c, ss: (0, g)),
        scratch_shapes=[
            pltpu.VMEM((2, rows, W), jnp.float32),
            pltpu.VMEM((2, 128, _base_window_cols(W)), jnp.int32),
            pltpu.VMEM((1, W), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, mp_pad), jnp.float32),
        interpret=interpret,
    )(coarse, src_start, tabf, baset)
    return out[:, :max_pairs] if mp_pad != max_pairs else out
