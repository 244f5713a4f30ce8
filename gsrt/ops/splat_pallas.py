"""Pallas TPU kernel: tile-wise front-to-back splat blending.

The hot loop of the whole framework — the TPU equivalent of the reference's
rt_unit + per-warp intersection tables + rint/rchit shader dispatch
(SURVEY.md §3.4/3.5). One grid step = one **8×128-pixel tile** (exactly one
f32 VPU register, so framebuffer blocks meet the (8,128) tiling constraint
with zero padding; color is planar [3,H,W]).

Each tile walks its depth-sorted pair segment — an arbitrary, unaligned
window of the HBM payload — in C-pair chunks with manually double-buffered
async DMA (manual copies, unlike BlockSpec blocks, can start at any column).
The chunk loop is a `while_loop` with a data-dependent trip count (tiles own
wildly different pair counts — the raggedness the reference handled with
per-warp tables and OOO scheduling, shader.cc:3217) and terminates early
once every pixel in the tile is opaque.

Per chunk: EWA response g for 1024 pixels × C pairs on the VPU, alphas,
front-to-back blend via an exclusive cumulative product (roll-based doubling
scan along the depth-sorted lane axis), per-channel color accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsrt.ops.tile_binning import PAYLOAD_WIDTH, TileBinning, tile_extent

TILE_H = 8
TILE_W = 128

def _exp_neg_lut(x):
    """Piecewise-linear exp(-x), bit-matching the reference's 256-segment
    LUT over [0, 8] (ExpLUT.hpp:10-24 / ProceduralGauss.rint:45-54). The
    table entries are analytic (slope = -e^{-x0}, bias = e^{-x0} at
    x0 = qx/32), so the kernel computes them instead of gathering — TPU
    lanes have no dynamic table lookup, but exp is a fast VPU op."""
    qx = jnp.clip((x * 32.0).astype(jnp.int32), 0, 255)
    x0 = qx.astype(jnp.float32) * (1.0 / 32.0)
    e0 = jnp.exp(-x0)
    return (-e0) * (x - x0) + e0



def _cumprod_lanes_excl(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Exclusive cumulative product along the last (lane) axis via a
    Hillis-Steele doubling scan — log2(n) roll+multiply steps (Mosaic has no
    native cumprod/cumsum lowering). Returns (exclusive_prod, total_prod)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    # shift by one for exclusivity: lane i holds Π_{j<i}
    y = jnp.where(lane >= 1, pltpu.roll(x, shift=1, axis=x.ndim - 1), 1.0)
    d = 1
    while d < n:
        shifted = pltpu.roll(y, shift=d, axis=y.ndim - 1)
        y = y * jnp.where(lane >= d, shifted, 1.0)
        d *= 2
    total = y[..., n - 1:n] * x[..., n - 1:n]
    return y, total


def _blend_kernel(
    # scalar prefetch
    tile_start_ref,        # [T+1] int32 in SMEM
    # inputs
    payload_hbm,           # [PAYLOAD_WIDTH, MP + chunk] in HBM/ANY
    # outputs
    color_ref,             # [3, TILE_H, TILE_W] VMEM
    trans_ref,             # [TILE_H, TILE_W] VMEM
    # scratch
    buf,                   # [2, PAYLOAD_WIDTH, chunk] VMEM
    sem,                   # DMA semaphores (2,)
    *,
    ntx: int, chunk: int,
    g_cutoff: float, alpha_threshold: float, alpha_clamp: float,
    term_eps: float, skip_range_check: bool, use_exp_lut: bool,
):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    n = tile_start_ref[t + 1] - start
    nc = pl.cdiv(n, chunk)

    # Mosaic requires 128-aligned windows even in HBM: round the segment
    # start down and over-fetch a chunk+128 window; lanes before `off` (and
    # past the segment) are masked out of the blend.
    window = chunk + 128
    start_al = (start // 128) * 128
    off = start - start_al

    ox = (t % ntx) * TILE_W
    oy = (t // ntx) * TILE_H
    px = (ox + jax.lax.broadcasted_iota(
        jnp.int32, (TILE_H, TILE_W, 1), 1)).astype(jnp.float32)
    py = (oy + jax.lax.broadcasted_iota(
        jnp.int32, (TILE_H, TILE_W, 1), 0)).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, window), 2)

    def dma(slot, c):
        col = pl.multiple_of(start_al + c * chunk, 128)
        return pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(col, window)],
            buf.at[slot],
            sem.at[slot],
        )

    @pl.when(nc > 0)
    def _():
        dma(0, 0).start()

    def cond(state):
        c, trans, r, g_, b = state
        return (c < nc) & (jnp.max(trans) > term_eps)

    def body(state):
        c, trans, r_acc, g_acc, b_acc = state
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nc)
        def _():
            dma(1 - slot, c + 1).start()

        dma(slot, c).wait()
        pay = buf[slot]                         # (PAYLOAD_WIDTH, chunk)

        mean_x = pay[0:1, :][None]              # (1, 1, C)
        mean_y = pay[1:2, :][None]
        qa = pay[2:3, :][None]
        qb = pay[3:4, :][None]
        qc = pay[4:5, :][None]
        # rows 5/6 hold 15-bit packed (r,g) and (b, opacity) with bit 30
        # set to keep the f32 word normal (denormals flush on TPU) — see
        # tile_binning.pack15. int32 ops (Mosaic can't cast uint32→f32).
        from gsrt.ops.tile_binning import PACK_RANGE
        inv_q = PACK_RANGE / 32767.0
        pay_i = pltpu.bitcast(pay, jnp.int32)
        rg = pay_i[5:6, :][None]
        bo = pay_i[6:7, :][None]
        cr = ((rg >> 15) & 0x7FFF).astype(jnp.float32) * inv_q
        cg = (rg & 0x7FFF).astype(jnp.float32) * inv_q
        cb = ((bo >> 15) & 0x7FFF).astype(jnp.float32) * inv_q
        op = (bo & 0x7FFF).astype(jnp.float32) * inv_q

        dx = px - mean_x                        # (TILE_H, TILE_W, C)
        dy = py - mean_y
        g = 0.5 * (qa * dx * dx + 2.0 * qb * dx * dy + qc * dy * dy)
        # mask the alignment prefix and the ragged tail
        pair_idx = c * chunk + (lane - off)
        live_lane = (lane >= off) & (pair_idx < n) & (lane < off + chunk)
        expf = _exp_neg_lut if use_exp_lut else lambda v: jnp.exp(-v)
        if skip_range_check:
            # standard mode with opacity ≤ 1: alpha > 1/255 already implies
            # g < ln(255) < 5.6, so the g-range test is redundant (g ≥ 0
            # holds for a PSD conic; exp(−g) underflows cleanly for huge g)
            alpha = jnp.minimum(op * expf(g), alpha_clamp)
            accept = (alpha > alpha_threshold) & live_lane
        else:
            in_range = (g >= 0.0) & (g <= g_cutoff)
            alpha = op * expf(jnp.where(in_range, g, 0.0))
            alpha = jnp.minimum(alpha, alpha_clamp)
            accept = in_range & (alpha > alpha_threshold) & live_lane
        alpha = jnp.where(accept, alpha, 0.0)

        one_minus = 1.0 - alpha
        excl, total = _cumprod_lanes_excl(one_minus, window)
        w = alpha * excl * trans[..., None]     # (TILE_H, TILE_W, C)

        r_acc = r_acc + jnp.sum(w * cr, axis=-1)
        g_acc = g_acc + jnp.sum(w * cg, axis=-1)
        b_acc = b_acc + jnp.sum(w * cb, axis=-1)
        trans = trans * total[..., 0]
        return c + 1, trans, r_acc, g_acc, b_acc

    zero = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    c_fin, trans, r_acc, g_acc, b_acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), zero + 1.0, zero, zero, zero))

    # early exit leaves exactly one started-but-unwaited DMA — drain it
    @pl.when(c_fin < nc)
    def _():
        dma(jax.lax.rem(c_fin, 2), c_fin).wait()

    trans_ref[...] = trans
    color_ref[0, :, :] = r_acc
    color_ref[1, :, :] = g_acc
    color_ref[2, :, :] = b_acc


def blend_tiles(
    binning: TileBinning,
    *,
    width: int, height: int,
    chunk: int = 128, g_cutoff: float = 5.6,
    alpha_threshold: float = 1.0 / 255.0, alpha_clamp: float = 0.99,
    term_eps: float = 1e-4, interpret: bool = False,
    skip_range_check: bool = False, use_exp_lut: bool = False,
):
    """Run the tile blend. Returns (color [H,W,3], trans [H,W]) cropped to
    NOTE: `chunk` must not exceed the chunk the binning was BUILT with —
    the payload's over-fetch tail is build-chunk + 128 columns, and a
    larger kernel window would DMA past the array (render_tiled keeps the
    two equal by construction).

    the true image size."""
    assert chunk % 128 == 0, "pair chunk must be a multiple of 128 lanes"
    ntx, nty = tile_extent(width, height, TILE_W, TILE_H)
    T = ntx * nty

    kernel = functools.partial(
        _blend_kernel,
        ntx=ntx, chunk=chunk, g_cutoff=g_cutoff,
        alpha_threshold=alpha_threshold,
        alpha_clamp=alpha_clamp, term_eps=term_eps,
        skip_range_check=skip_range_check, use_exp_lut=use_exp_lut,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            # payload must stay in HBM: its per-tile windows start at
            # arbitrary (unaligned) columns, legal for DMA but not for VMEM
            # slicing
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec(
                (3, TILE_H, TILE_W),
                index_map=lambda t, ts: (0, t // ntx, t % ntx),
            ),
            pl.BlockSpec(
                (TILE_H, TILE_W),
                index_map=lambda t, ts: (t // ntx, t % ntx),
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, PAYLOAD_WIDTH, chunk + 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    color, trans = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((3, nty * TILE_H, ntx * TILE_W), jnp.float32),
            jax.ShapeDtypeStruct((nty * TILE_H, ntx * TILE_W), jnp.float32),
        ],
        interpret=interpret,
    )(binning.tile_start, binning.payload)

    color = jnp.transpose(color, (1, 2, 0))
    return color[:height, :width], trans[:height, :width]
