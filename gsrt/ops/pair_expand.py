"""Pallas TPU kernel: splat-table → pair-table run expansion.

Replaces `jnp.repeat(tab, touched, total_repeat_length=max_pairs)` in the
tile binning (measured ~65 ms at 3M pairs on v5e — XLA lowers the ragged
repeat to cumsum + searchsorted + random row gathers at ~27 ns/row). Here
the same monotone gather is a streaming kernel at HBM bandwidth.

Algorithm (per output chunk of C pairs):
  * the source splats covering pairs [gC, gC+C) are a CONTIGUOUS window of
    at most C+1 rows of the depth-sorted table (every pair-generating splat
    is compacted to a prefix and emits >= 1 pair) — one aligned DMA;
  * each output lane's source index is s(p) = #{splats with base <= p} - 1,
    computed as a (window x window) int compare + sublane reduction
    (the base column is DMA'd splat-major from a side table so the compare
    needs no in-kernel transpose);
  * the expansion out[p] = tab[s(p)] is a BARREL SHIFTER: for bit b from
    high to low, lanes whose shift distance D = p - s(p) has bit b set take
    the value rolled right by 2^b. For run expansions D and s are both
    monotone with steps in {0, 1}, which makes the log2(C)-step shifter
    exact (each step preserves the invariant y[p] = tab[p - (D>>b<<b)]).

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
    base2d_hbm,            # [N_pad, 8] int32, col 0 = base (pair offset)
    # outputs
    out_ref,               # [TAB_ROWS, C] VMEM
    # scratch
    tbuf,                  # [2, TAB_ROWS, W] VMEM
    bbuf,                  # [2, W, 8] VMEM (int32)
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

    def dma_b(slot, gi):
        row = pl.multiple_of(src_start_ref[gi], 128)
        return pltpu.make_async_copy(
            base2d_hbm.at[pl.ds(row, W), :], bbuf.at[slot], sem.at[slot, 1])

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

    w0 = src_start_ref[g]
    base = bbuf[slot][:, 0:1]                       # (W, 1) int32
    # virtual pair id of buffer lane l: pv = g*C + l - 128 (the first 128
    # lanes are a dead prefix so the shifter never needs negative shifts)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    pv = g * C + lane - 128
    # source row (window-local) covering pv: #{base <= pv} - 1
    cnt = jnp.sum((base <= pv).astype(jnp.int32), axis=0, keepdims=True)
    d = lane - (cnt - 1)                            # shift distance, (1, W)

    y = tbuf[slot]                                  # (TAB_ROWS, W)
    b = 1
    while b < W:
        b *= 2
    b //= 2
    while b >= 1:
        take = (d & b) != 0                         # (1, W)
        y = jnp.where(take, pltpu.roll(y, shift=b, axis=1), y)
        b //= 2
    out_ref[...] = y[:, 128:128 + C]


def expand_pairs(tabf: jnp.ndarray, base: jnp.ndarray, max_pairs: int,
                 *, chunk: int = 512, interpret: bool = False) -> jnp.ndarray:
    """Expand a depth-sorted splat table to the pair table.

    tabf: [TAB_ROWS, N] f32, feature-major; row 3 must hold the splat's
      first-pair offset ("base", int32 bitcast), with _DEAD_BASE for splats
      that generate no pairs; pair-generating splats must form a prefix and
      bases must be strictly increasing (each generates >= 1 pair).
    base: [N] int32 — the same base column, used for the in-kernel source
      search.

    Returns [TAB_ROWS, max_pairs] f32 where column p = tabf[:, s(p)].
    """
    assert max_pairs % chunk == 0 and chunk % 128 == 0
    N = tabf.shape[1]
    W = chunk + 128
    G = max_pairs // chunk

    # pad the table so any aligned window read stays in bounds
    n_pad = W + ((-N) % 128)
    tabf = jnp.pad(tabf, ((0, 0), (0, n_pad)))
    dead = jnp.full((n_pad,), _DEAD_BASE, jnp.int32)
    base_p = jnp.concatenate([base, dead])
    base2d = jnp.broadcast_to(base_p[:, None], (N + n_pad, 8))

    # first table row covering pair g*C (right-side rank on the inclusive
    # region): #{base <= gC} - 1, clamped; then 128-aligned down for DMA
    queries = jnp.arange(G, dtype=jnp.int32) * chunk
    idx = jnp.searchsorted(base, queries, side="right",
                           method="sort").astype(jnp.int32)
    src_start = jnp.maximum(idx - 1, 0)
    src_start = (src_start // 128) * 128
    src_start = jnp.minimum(src_start, jnp.int32(N + n_pad - W))

    kernel = functools.partial(_expand_kernel, chunk=chunk, window=W)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((TAB_ROWS, chunk),
                               index_map=lambda g, ss: (0, g)),
        scratch_shapes=[
            pltpu.VMEM((2, TAB_ROWS, W), jnp.float32),
            pltpu.VMEM((2, W, 8), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((TAB_ROWS, max_pairs), jnp.float32),
        interpret=interpret,
    )(src_start, tabf, base2d)
