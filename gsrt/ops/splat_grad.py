"""Pallas TPU kernel: backward pass of the tiled splat blend.

Differentiates the front-to-back transmittance compositing
(rchit:22-31 semantics) with respect to every per-pair quantity —
projected mean, conic, opacity, color — so the tiled perf path is
trainable (the reference has no training path at all; the INRIA CUDA
rasterizer's backward kernel is the capability analogue).

Walks each tile's pair list FRONT-TO-BACK (same order as the forward
kernel) carrying the running transmittance T and the per-channel prefix
color P. The suffix sums the per-alpha gradient needs come from the
forward outputs: S_i = C_final − P_i, so no back-to-front pass and no
extra forward residuals are required:

    C        = Σ_i α_i T_i c_i            T_i = Π_{j<i} (1 − α_j)
    ∂C/∂α_i  = T_i c_i − S_i/(1 − α_i)
    ∂T_N/∂α_i = −T_N/(1 − α_i)
    ∂L/∂c_i  = dC · α_i T_i

Compute is (win pixels [sublanes] × window pairs [lanes]) like the
subtile forward kernel; per chunk the pixel axis is reduced away and 9
per-pair gradient rows are ACCUMULATED into the grad table with a
serialized read-modify-write DMA (consecutive chunk windows overlap at
128-lane alignment boundaries, so each write must see the previous one;
the sequential TPU grid makes RMW safe).

Saturation skipping mirrors the forward exactly: once max(T) drops below
term_eps the forward stopped blending, so the computed function has zero
dependence on later pairs and the backward stops too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsrt.ops.splat_pallas import _cumprod_lanes_excl, _exp_neg_lut
from gsrt.ops.tile_binning import PACK_RANGE, PAYLOAD_WIDTH, tile_extent

GRAD_ROWS = 16   # 9 used: d_mx, d_my, d_qa, d_qb, d_qc, d_op, d_cr/cg/cb


def _cumsum_lanes_incl(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Inclusive cumulative sum along the last (lane) axis (Hillis-Steele
    doubling scan, like _cumprod_lanes_excl)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    y = x
    d = 1
    while d < n:
        shifted = pltpu.roll(y, shift=d, axis=y.ndim - 1)
        y = y + jnp.where(lane >= d, shifted, 0.0)
        d *= 2
    return y


def _blend_bwd_kernel(
    # scalar prefetch
    tile_start_ref,        # [T + 1] int32
    # inputs
    payload_hbm,           # [PAYLOAD_WIDTH, MP + pad] HBM
    pixstate_hbm,          # [8, T*win]: C.rgb, T_N, dC.rgb, dT per pixel,
                           # tile-major (win lanes per tile)
    zeros_hbm,             # [GRAD_ROWS, MP + pad] (aliased to the output)
    # outputs
    grad_hbm,              # [GRAD_ROWS, MP + pad] (manual RMW)
    # scratch
    buf,                   # [2, PAYLOAD_WIDTH, chunk + 128] VMEM
    pixbuf,                # [8, win] VMEM
    gbuf,                  # [GRAD_ROWS, chunk + 128] VMEM
    sem,                   # payload DMA semaphores (2,)
    psem,                  # pixstate semaphore
    gsem,                  # grad RMW semaphores (2,)
    *,
    ntx: int, tw: int, th: int, chunk: int,
    g_cutoff: float, alpha_threshold: float, alpha_clamp: float,
    term_eps: float, skip_range_check: bool, use_exp_lut: bool,
):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    n = tile_start_ref[t + 1] - start
    nc = pl.cdiv(n, chunk)
    win = tw * th
    window = chunk + 128
    start_al = (start // 128) * 128
    off = start - start_al

    pdma = pltpu.make_async_copy(
        pixstate_hbm.at[:, pl.ds(t * win, win)], pixbuf, psem)
    pdma.start()

    ox = ((t % ntx) * tw).astype(jnp.float32)
    oy = ((t // ntx) * th).astype(jnp.float32)
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (win, 1), 0)
    xloc = (p_idx % tw).astype(jnp.float32) + ox
    yloc = (p_idx // tw).astype(jnp.float32) + oy
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, window), 1)

    def dma(slot, c):
        col = pl.multiple_of(start_al + c * chunk, 128)
        return pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(col, window)], buf.at[slot],
            sem.at[slot])

    @pl.when(nc > 0)
    def _():
        dma(0, 0).start()

    pdma.wait()
    pstate = pixbuf[...].T                    # (win, 8)
    c_f = pstate[:, 0:1]                      # (win, 1) each
    c_g = pstate[:, 1:2]
    c_b = pstate[:, 2:3]
    t_n = pstate[:, 3:4]
    dc_r = pstate[:, 4:5]
    dc_g = pstate[:, 5:6]
    dc_b = pstate[:, 6:7]
    d_tn = pstate[:, 7:8]

    inv_q = PACK_RANGE / 32767.0

    def cond(state):
        c, trans, p_r, p_g, p_b = state
        return (c < nc) & (jnp.max(trans) > term_eps)

    def body(state):
        c, trans, p_r, p_g, p_b = state
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nc)
        def _():
            dma(1 - slot, c + 1).start()

        dma(slot, c).wait()
        pay = buf[slot]                         # (PAYLOAD_WIDTH, window)

        mean_x = pay[0:1, :]                    # (1, window)
        mean_y = pay[1:2, :]
        qa = pay[2:3, :]
        qb = pay[3:4, :]
        qc = pay[4:5, :]
        pay_i = pltpu.bitcast(pay, jnp.int32)
        rg = pay_i[5:6, :]
        bo = pay_i[6:7, :]
        cr = ((rg >> 15) & 0x7FFF).astype(jnp.float32) * inv_q
        cg = (rg & 0x7FFF).astype(jnp.float32) * inv_q
        cb = ((bo >> 15) & 0x7FFF).astype(jnp.float32) * inv_q
        op = (bo & 0x7FFF).astype(jnp.float32) * inv_q

        dx = xloc - mean_x                      # (win, window)
        dy = yloc - mean_y
        gq = 0.5 * (qa * dx * dx + 2.0 * qb * dx * dy + qc * dy * dy)

        pair_idx = c * chunk + (lane - off)
        live = (lane >= off) & (pair_idx < n) & (lane < off + chunk)
        gq_c = jnp.where(gq >= 0.0, gq, 0.0)
        if use_exp_lut:
            expg = _exp_neg_lut(gq_c)
            # the LUT is piecewise linear: d(expg)/dgq = slope = -e^{-x0}
            qx0 = jnp.clip((gq_c * 32.0).astype(jnp.int32), 0, 255)
            dexp = -jnp.exp(-qx0.astype(jnp.float32) * (1.0 / 32.0))
        else:
            expg = jnp.exp(-gq_c)
            dexp = -expg
        raw = op * expg
        if skip_range_check:
            accept = (raw > alpha_threshold) & live
        else:
            accept = ((gq >= 0.0) & (gq <= g_cutoff)
                      & (raw > alpha_threshold) & live)
        clamped = raw > alpha_clamp
        alpha = jnp.where(accept, jnp.minimum(raw, alpha_clamp), 0.0)

        one_minus = 1.0 - alpha
        excl, total = _cumprod_lanes_excl(one_minus, window)
        t_i = trans * excl                      # (win, window)
        w = alpha * t_i

        pc_r = p_r + _cumsum_lanes_incl(w * cr, window)
        pc_g = p_g + _cumsum_lanes_incl(w * cg, window)
        pc_b = p_b + _cumsum_lanes_incl(w * cb, window)
        s_r = c_f - pc_r                        # suffix strictly after i
        s_g = c_g - pc_g
        s_b = c_b - pc_b

        inv_om = 1.0 / one_minus                # alpha <= clamp < 1
        d_alpha = (dc_r * (t_i * cr - s_r * inv_om)
                   + dc_g * (t_i * cg - s_g * inv_om)
                   + dc_b * (t_i * cb - s_b * inv_om)
                   - d_tn * t_n * inv_om)
        d_alpha = jnp.where(accept & ~clamped, d_alpha, 0.0)

        d_gq = d_alpha * op * dexp
        d_op = jnp.where(accept & ~clamped, d_alpha * expg, 0.0)

        def red(x):                              # (win, window) -> (1, w)
            return jnp.sum(x, axis=0, keepdims=True)

        rows = [red(d_gq * (-(qa * dx + qb * dy))),       # d_mx
                red(d_gq * (-(qb * dx + qc * dy))),       # d_my
                red(d_gq * (0.5 * dx * dx)),              # d_qa
                red(d_gq * (dx * dy)),                    # d_qb
                red(d_gq * (0.5 * dy * dy)),              # d_qc
                red(d_op),                                # d_op
                red(dc_r * w),                            # d_cr
                red(dc_g * w),                            # d_cg
                red(dc_b * w)]                            # d_cb

        # serialized read-modify-write of the grad window
        col = pl.multiple_of(start_al + c * chunk, 128)
        gin = pltpu.make_async_copy(
            grad_hbm.at[:, pl.ds(col, window)], gbuf, gsem.at[0])
        gin.start()
        gin.wait()
        upd = jnp.concatenate(
            rows + [jnp.zeros_like(rows[0])] * (GRAD_ROWS - len(rows)),
            axis=0)                              # (GRAD_ROWS, window)
        gbuf[...] = gbuf[...] + upd
        gout = pltpu.make_async_copy(
            gbuf, grad_hbm.at[:, pl.ds(col, window)], gsem.at[1])
        gout.start()
        gout.wait()

        trans = trans * total
        p_r = pc_r[:, window - 1:window]
        p_g = pc_g[:, window - 1:window]
        p_b = pc_b[:, window - 1:window]
        return c + 1, trans, p_r, p_g, p_b

    zero = jnp.zeros((win, 1), jnp.float32)
    c_fin, *_ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), zero + 1.0, zero, zero, zero))

    @pl.when(c_fin < nc)
    def _():
        dma(jax.lax.rem(c_fin, 2), c_fin).wait()


def blend_backward(payload, tile_start, pixstate, *,
                   width: int, height: int, tile_w: int, tile_h: int,
                   chunk: int, g_cutoff: float, alpha_threshold: float,
                   alpha_clamp: float, term_eps: float = 1e-4,
                   skip_range_check: bool = False, use_exp_lut: bool = False,
                   interpret: bool = False):
    """Run the backward blend.

    payload/tile_start: from build_tile_binning (same arrays the forward
    consumed). pixstate: [8, T * tile_w*tile_h] per-tile pixel rows in
    row-major tile order (C.rgb, T_N, dC.rgb, dT). Returns the per-pair
    gradient table [GRAD_ROWS, payload-width] aligned with the payload
    columns.
    """
    ntx, nty = tile_extent(width, height, tile_w, tile_h)
    T = ntx * nty
    win = tile_w * tile_h
    assert win % 128 == 0, "tile pixel count must be a lane multiple"
    mp_pad = payload.shape[1]

    kernel = functools.partial(
        _blend_bwd_kernel, ntx=ntx, tw=tile_w, th=tile_h, chunk=chunk,
        g_cutoff=g_cutoff, alpha_threshold=alpha_threshold,
        alpha_clamp=alpha_clamp, term_eps=term_eps,
        skip_range_check=skip_range_check, use_exp_lut=use_exp_lut)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, PAYLOAD_WIDTH, chunk + 128), jnp.float32),
            pltpu.VMEM((8, win), jnp.float32),
            pltpu.VMEM((GRAD_ROWS, chunk + 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    zeros = jnp.zeros((GRAD_ROWS, mp_pad), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((GRAD_ROWS, mp_pad), jnp.float32),
        input_output_aliases={3: 0},   # zeros buffer -> grad output
        interpret=interpret,
    )(tile_start, payload, pixstate, zeros)
