"""Pallas TPU kernel: packed front-to-back splat blending (round-2 v3).

Successor to gsrt.ops.splat_subtile. That kernel processed each subtile's
pair segment in private chunks: every chunk DMA'd a (chunk+128)-lane
window to absorb the segment's alignment offset and computed all lanes,
so a 128-pair chunk paid for 256 lanes (~50% waste), and every segment
rounded up to whole chunks (another ~25% at ~257 pairs/subtile).

This kernel streams the pair payload in GLOBALLY 128-aligned chunks that
ignore segment boundaries — every lane is a distinct live pair. The
segment structure is reconstructed per chunk with arithmetic on the pair
index and handled by small MXU matmuls instead of branches:

  * each pair's tile id rides in payload row 7 (written by tile_binning;
    it was a free pad row), so the kernel reads per-lane segment ids
    directly — no per-chunk boundary compares;
  * a one-hot matrix O[k, lane] = (s == k) contracts (win, bs) carries to
    per-lane values and per-lane sums back to per-subtile columns — tiny
    (win x bs x 128) MXU passes;
  * the exclusive cumulative product becomes a SEGMENTED Hillis-Steele
    roll scan: each doubling step multiplies in the lane d to the left
    only when that lane shares the segment id — 8 masked roll+multiply
    steps over (win, 128), half the lane width (and ~half the cost) of
    the subtile kernel's scan over its (chunk+128) window;
  * per-segment chunk totals are the inclusive products at each segment's
    last in-chunk lane, pulled into (win, bs) columns by a masked-sum
    matmul (exactly one nonzero lane per present segment).

(A first version did the whole scan as one (win,128)x(128,128) log-space
matmul — elegant, but f32 matmuls need Precision.HIGHEST on the MXU
(bf16 operand rounding produced 1e-3 blend errors) and the 6-pass cost
measured SLOWER than the subtile kernel, 137.9 vs 117.7 ms/frame. The
surviving one-hot contractions instead use a 2-pass hi/lo bf16 split —
see the comment at `_split` below.)

Dead lanes (alignment prefix before the group's first segment, tail after
its last, binning's sentinel tail) have alpha = 0 so 1-alpha = 1 — inert
in every product; no masking beyond the alpha gate is needed.

The EWA response math and payload format are identical to splat_subtile,
so oracle-parity tests carry over.

Reference analogy: this is the rt_unit hot loop (shader.cc:2882-3290)
with the warp-coalesced intersection table fully packed — no lane ever
idles on another warp's slot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsrt.ops.splat_pallas import _exp_neg_lut
from gsrt.ops.tile_binning import (COLOR8_COARSE, COLOR8_FINE,
                                   COMPACT_STORE, COMPACT_WIDTH,
                                   MEAN_COARSE_BIAS,
                                   MEAN_COARSE_SCALE, MEAN_FINE_BIAS,
                                   MEAN_FINE_SCALE, PACK_RANGE,
                                   PAYLOAD_WIDTH, TileBinning, tile_extent)

LANES = 128


def _blend_packed_kernel(
    # scalar prefetch
    tile_start_ref,        # [T_pad + 1] int32 in SMEM
    # inputs
    payload_hbm,           # [PAYLOAD_WIDTH, MP + chunk + 128] in HBM
    # outputs
    color_ref,             # [3, BS, WIN] VMEM
    trans_ref,             # [BS, WIN] VMEM
    *rest,                 # track_consumed: consumed_ref [1, 8, BS] VMEM
                           # int32, then scratch; else just scratch
    ntx: int, sub_w: int, sub_h: int, bs: int,
    g_cutoff: float, alpha_threshold: float, alpha_clamp: float,
    term_eps: float, skip_range_check: bool, use_exp_lut: bool,
    exact_dots: bool, track_consumed: bool = False, ablate: str = "",
    compact: bool = False, scan_impl: str = "roll",
    track_hits: bool = False, math_dtype: str = "f32", cw: int = LANES,
    group_stream: bool = False,
):
    rest = list(rest)
    consumed_ref = rest.pop(0) if track_consumed else None
    hits_ref = rest.pop(0) if track_hits else None
    buf, sem = rest
    grp = pl.program_id(0)
    t0 = grp * bs
    win = sub_w * sub_h
    # group_stream: the transmittance carry lives in LOG space — the
    # per-chunk totals become a plain add (no exp), and the scan's exp
    # fuses with the carry routing into ONE exp per chunk (the kernel is
    # transcendental-bound: exp/log on (win, cw) dominate)
    assert not (group_stream and ablate), \
        "ablation modes assume the tile-sorted stream"
    import math
    log_eps = math.log(term_eps) if group_stream else None

    start = tile_start_ref[t0]
    end = tile_start_ref[t0 + bs]
    astart = (start // cw) * cw                # aligned chunk origin
    total_chunks = pl.cdiv(end - astart, cw)

    def dma(slot, j):
        col = pl.multiple_of(astart + j * cw, cw)
        return pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(col, cw)], buf.at[slot],
            sem.at[slot])

    @pl.when(total_chunks > 0)
    def _():
        dma(0, 0).start()

    half = math_dtype == "bf16"
    mdt = jnp.bfloat16 if half else jnp.float32

    # constants hoisted out of the chunk loop
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (win, 1), 0)
    xloc = (p_idx % sub_w).astype(jnp.float32)          # (win, 1)
    yloc = (p_idx // sub_w).astype(jnp.float32)
    xloc_m = xloc.astype(mdt)      # exact: subtile coords are small ints
    yloc_m = yloc.astype(mdt)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cw), 1)
    krow = jax.lax.broadcasted_iota(jnp.int32, (bs, cw), 0)
    ones_lane = jnp.ones((1, cw), jnp.float32)
    if compact:
        # EWA-on-MXU pixel matrix: row p = [x, y, 1, 0…] so the Cholesky
        # response terms become t = P @ B with per-lane coefficient
        # columns B = [l; c] — two tiny (win, 8)x(8, 128) MXU passes
        # replace the five (win, 128) VPU ops (dx, dy, two FMAs, one mul)
        # of the direct form. Compact-mode only: the f32 payload is the
        # bit-parity tier and keeps the original arithmetic.
        p_ewa = jnp.concatenate(
            [xloc, yloc, jnp.ones((win, 1), jnp.float32),
             jnp.zeros((win, 5), jnp.float32)], axis=1)       # (win, 8)
        # pixel coords are small ints — exact in bf16
        p_ewa16 = p_ewa.astype(jnp.float32 if exact_dots else jnp.bfloat16)

    inv_q = PACK_RANGE / 32767.0
    # Split-bf16 matmuls: the MXU rounds f32 operands to bf16 (~0.4%
    # relative — a visible 1e-3 blend error, found by the oracle-parity
    # test), and Precision.HIGHEST (6 passes) measured +37 ms/frame. A
    # hi/lo bf16 split of the VALUE operand (the one-hot side is 0/1 —
    # exact in bf16) restores ~2^-17 accuracy at 2 passes: the MXU
    # accumulates bf16 products in f32. Pallas INTERPRET mode does not
    # (it accumulates bf16 — measured 1e-2 error on a 128-term dot), so
    # interpret runs plain f32 dots instead: CPU tests validate the
    # kernel logic, the on-hardware parity check (tools/tpu_smoke.py)
    # validates the split numerics.
    # default precision bf16-rounds f32 operands even on CPU — exact mode
    # must ask for HIGHEST explicitly
    mm = functools.partial(
        jax.lax.dot_general, preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if exact_dots
                   else jax.lax.Precision.DEFAULT))
    acc_dtype = jnp.float32 if exact_dots else jnp.bfloat16
    # bf16 math tier: the kernel is VPU-bound on the (win, 128) f32
    # elementwise EWA/alpha math (~32 vregs per op at win=256); bf16 packs
    # two lanes per vreg slot, halving those ops, and lets the value-side
    # MXU contractions drop the lo residual pass (single bf16 pass instead
    # of the hi/lo split — 0.4% relative, inside this tier's bound). The
    # transmittance carries, the scan log/exp, and the per-segment total
    # update stay f32: trans multiplies ~4 chunk totals deep per subtile
    # and term_eps = 1e-4 comparisons need the headroom.
    def _split(a):
        if exact_dots:
            return a.astype(jnp.float32), None
        hi = a.astype(jnp.bfloat16)
        if half:                       # tier bound absorbs the residual
            return hi, None
        lo = (a.astype(jnp.float32) - hi.astype(jnp.float32)
              ).astype(jnp.bfloat16)
        return hi, lo

    def _dot2(a, b16, d, exact=False):
        if exact and not exact_dots:
            # full hi/lo split regardless of tier (trans carry update)
            hi = a.astype(jnp.bfloat16)
            lo = (a.astype(jnp.float32) - hi.astype(jnp.float32)
                  ).astype(jnp.bfloat16)
            return mm(hi, b16, d) + mm(lo, b16, d)
        hi, lo = _split(a)
        out = mm(hi, b16, d)
        return out if lo is None else out + mm(lo, b16, d)

    def dot_split(a, b16, exact=False):
        # contract a's last axis with b16's FIRST axis; b16 is 0/1
        return _dot2(a, b16, (((a.ndim - 1,), (0,)), ((), ())), exact)

    def dot_lanes_split(a, b16, exact=False):
        # contract the shared last (lane) axis — a @ b16.T without the
        # in-kernel transpose
        return _dot2(a, b16, (((a.ndim - 1,), (b16.ndim - 1,)), ((), ())),
                     exact)

    def dot_ewa(B):
        # t = P @ B. Coefficient magnitudes reach ~|l|·|mean| (they cancel
        # against the pixel terms), so the value side ALWAYS runs the
        # hi/lo bf16 split — a single-pass bf16 B would put an absolute
        # ~|c|·2⁻⁹ error into a t that is itself O(1), in every tier.
        d = (((1,), (0,)), ((), ()))
        if exact_dots:
            return mm(p_ewa, B, d)
        hi = B.astype(jnp.bfloat16)
        lo = (B - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return mm(p_ewa16, hi, d) + mm(p_ewa16, lo, d)

    def body(state):
        j, trans, r_acc, g_acc, b_acc, *aux = state
        sat = aux.pop(0) if track_consumed else None
        hits = aux.pop(0) if track_hits else None
        slot = jax.lax.rem(j, 2)

        if track_consumed:
            # record, per tile column, the first chunk index at whose START
            # the whole subtile was already saturated: pairs before chunk
            # `sat` sufficed (position bound astart + sat*cw, <= cw over).
            # trans is monotone non-increasing, so that index equals the
            # COUNT of still-unsaturated chunk starts — a plain add; a
            # scalar-j select against the lane vector is an invalid Mosaic
            # relayout (replicated destination) on real TPU
            colmax = jnp.max(trans, axis=0, keepdims=True)    # (1, bs)
            sat = sat + (colmax >= (log_eps if group_stream else term_eps)
                         ).astype(jnp.int32)

        @pl.when(j + 1 < total_chunks)
        def _():
            dma(1 - slot, j + 1).start()

        dma(slot, j).wait()

        pay = buf[slot]                                # (PAYLOAD, LANES)
        if ablate == "dmaonly":
            # consume the buffer so the DMA is not dead-code-eliminated
            junk = 1e-30 * jnp.sum(pay).astype(jnp.float32)
            return (j + 1, trans + junk, r_acc, g_acc, b_acc) \
                + ((sat,) if track_consumed else ()) \
                + ((hits,) if track_hits else ())
        pay_i_all = pay if compact else pltpu.bitcast(pay, jnp.int32)
        # each pair's tile id rides in the last payload row (20 bits, plus
        # a bias bit in f32 mode; tile_binning). Lanes outside this group's
        # [t0, t0+bs) window — the aligned prefix, the tail, dead sentinels
        # (tile = T) — match no one-hot column and are inert below.
        tile_row = COMPACT_WIDTH - 1 if compact else 7
        s_tile = pay_i_all[tile_row:tile_row + 1, :] & 0xFFFFF  # (1, LANES)
        s_local = s_tile - t0
        onehot = (krow == s_local).astype(acc_dtype)   # (bs, LANES)

        if ablate == "nodots":
            trans_lane = trans[:, :1] * jnp.ones((1, cw), jnp.float32)
        else:
            # group mode: trans is log-space, so this routes LOG
            # transmittance per lane (the exp happens fused into w below)
            trans_lane = dot_split(trans, onehot)      # (win, LANES)

        def blend(args):
            trans, r_acc, g_acc, b_acc, *haux = args

            if compact:
                # int32 payload: u16|u16 tile-relative two-tier fixed-point
                # mean (bit 15 = tier), bf16|bf16 Cholesky — mask/shift +
                # bitcast, f32 math after

                def mean_axis(w16):
                    mag = (w16 & 0x7FFF).astype(jnp.float32)
                    fine = mag * (1.0 / MEAN_FINE_SCALE) - MEAN_FINE_BIAS
                    coarse = (mag * (1.0 / MEAN_COARSE_SCALE)
                              - MEAN_COARSE_BIAS)
                    return jnp.where((w16 & 0x8000) != 0, coarse, fine)

                w0 = pay_i_all[0:1, :]
                mean_x = mean_axis((w0 >> 16) & 0xFFFF)      # f32 (1, 128)
                mean_y = mean_axis(w0 & 0xFFFF)
                w1 = pay_i_all[1:2, :]
                l11 = pltpu.bitcast(w1 & jnp.int32(-65536), jnp.float32)
                l21 = pltpu.bitcast(w1 << 16, jnp.float32)
                l22 = pltpu.bitcast(pay_i_all[2:3, :] & jnp.int32(-65536),
                                    jnp.float32)
                # fold gq's 1/2 into the factors (gq = t1² + t2² below)
                rh = 0.7071067811865476
                l11h, l21h, l22h = l11 * rh, l21 * rh, l22 * rh
                # coefficient columns of the affine response terms:
                # t1 = l11'·(x−mx) + l21'·(y−my),  t2 = l22'·(y−my)
                c1 = -(l11h * mean_x + l21h * mean_y)
                c2 = -(l22h * mean_y)
                zrow = jnp.zeros((1, cw), jnp.float32)
                B1 = jnp.concatenate([l11h, l21h, c1] + [zrow] * 5, axis=0)
                B2 = jnp.concatenate([zrow, l22h, c2] + [zrow] * 5, axis=0)
                # rgba8888: two-tier 8-bit colors + u8 opacity
                # (tile_binning.pack_rgba8)
                w3 = pay_i_all[3:4, :]

                def color8(shift):
                    c8 = (w3 >> shift) & 0xFF
                    mag = (c8 & 0x7F).astype(jnp.float32)
                    return jnp.where((c8 & 0x80) != 0,
                                     1.0 + mag * COLOR8_COARSE,
                                     mag * COLOR8_FINE)

                cr, cg, cb = color8(24), color8(16), color8(8)
                op = ((w3 & 0xFF).astype(jnp.float32)
                      * (1.0 / 255.0)).astype(mdt)
            else:
                ox = ((s_tile % ntx) * sub_w).astype(jnp.float32)
                oy = ((s_tile // ntx) * sub_h).astype(jnp.float32)
                mean_x = pay[0:1, :]
                mean_y = pay[1:2, :]
                qa = pay[2:3, :].astype(mdt)
                qb = pay[3:4, :].astype(mdt)
                qc = pay[4:5, :].astype(mdt)
                rg = pay_i_all[5:6, :]
                bo = pay_i_all[6:7, :]
                # absolute-coordinate dx needs f32 (screen coords up to
                # ~2K don't fit bf16's mantissa); cast the small result
                dx = ((xloc + ox) - mean_x).astype(mdt)  # (win, LANES)
                dy = ((yloc + oy) - mean_y).astype(mdt)
                cr = ((rg >> 15) & 0x7FFF).astype(jnp.float32) * inv_q
                cg = (rg & 0x7FFF).astype(jnp.float32) * inv_q
                cb = ((bo >> 15) & 0x7FFF).astype(jnp.float32) * inv_q
                op = ((bo & 0x7FFF).astype(jnp.float32) * inv_q).astype(mdt)
            if compact:
                t1 = dot_ewa(B1).astype(mdt)           # (win, LANES)
                t2 = dot_ewa(B2).astype(mdt)
                gq = t1 * t1 + t2 * t2                 # the 1/2 is in B
            else:
                gq = 0.5 * (qa * dx * dx + 2.0 * qb * dx * dy
                            + qc * dy * dy)
            if ablate == "noewa":                      # keep shape, skip math
                gq = (xloc_m + mean_x.astype(mdt)) if compact else dx + dy

            # no liveness mask: out-of-group lanes match no one-hot column,
            # so their (real) alphas never touch a carry.
            # alpha/accept run f32 even in the bf16 tier: Mosaic on v5e
            # rejects cmpf on PACKED bf16 vectors ("Target does not support
            # this comparison", vector<8x128x2xbf16>), and exp is
            # transcendental (f32 internally regardless). The bf16 win is
            # the (win, 128) quadratic-form math above; these casts are
            # no-ops in the f32 tier.
            if use_exp_lut:
                # the LUT's segment arithmetic manipulates f32 bits
                expf = lambda v: _exp_neg_lut(v.astype(jnp.float32))
            else:
                expf = lambda v: jnp.exp(-v.astype(jnp.float32))
            op32 = op.astype(jnp.float32)
            if skip_range_check:
                alpha = jnp.minimum(op32 * expf(gq), alpha_clamp)
                accept = alpha > alpha_threshold
            else:
                gq32 = gq.astype(jnp.float32)
                in_range = (gq32 >= 0.0) & (gq32 <= g_cutoff)
                alpha = op32 * expf(jnp.where(in_range, gq32, 0.0))
                alpha = jnp.minimum(alpha, alpha_clamp)
                accept = in_range & (alpha > alpha_threshold)
            # carries, scan, and weights run f32 from here
            alpha = jnp.where(accept, alpha, 0.0)

            one_minus = 1.0 - alpha

            # segmented exclusive cumprod: masked Hillis-Steele over the
            # 128 lanes — lane q multiplies in lane q-d only when q-d
            # shares its segment (subtile) id
            def same_seg(d):
                return (s_tile == pltpu.roll(s_tile, shift=d, axis=1)) & \
                       (lane >= d)

            if group_stream:
                # one fused exp: w = α·excl·trans_lane with excl =
                # exp(lm@segmat) and trans_lane already in log space —
                # exp(scan_log + logtrans) replaces the separate excl exp
                # AND the former order-independent totals exp
                segmat = ((s_tile == s_tile.reshape(cw, 1))
                          & (lane > lane.reshape(cw, 1)))  # (cw, cw)
                lm = jnp.log(jnp.maximum(one_minus, 1e-30))
                scan_log = dot_split(lm, segmat.astype(acc_dtype))
                w = alpha * jnp.exp(scan_log + trans_lane)
            elif ablate == "noscan":
                excl = one_minus
            elif scan_impl == "logmm":
                # log-space scan on the MXU: excl = exp(log(1-α) @ M) with
                # M[p, q] = (p < q) & same-segment — data-dependent but
                # 0/1, so exact in bf16; only the log side needs the hi/lo
                # split (2 MXU passes vs 6 for Precision.HIGHEST — the
                # variant the v3 docstring measured slower). α ≤
                # alpha_clamp = 0.99 keeps log(1-α) ≥ log(0.01) — finite.
                segmat = ((s_tile == s_tile.reshape(cw, 1))
                          & (lane > lane.reshape(cw, 1)))  # (cw, cw)
                # floor keeps log finite if alpha_clamp is ever 1.0: a
                # -inf row would NaN-poison every segment through the
                # matmul's -inf * 0 terms (the roll scan just yields 0)
                lm = jnp.log(jnp.maximum(one_minus, 1e-30))   # (win, 128)
                excl = jnp.exp(dot_split(lm, segmat.astype(acc_dtype)))
            else:
                # bf16 tier: the whole masked Hillis-Steele scan runs in
                # bf16 (two lanes per vreg slot — this is the scan the
                # logmm transcendental pair replaced; in bf16 it has no
                # transcendental at all). Error: ~log2(run length) bf16
                # roundings per lane (the scan is a depth-log2 product
                # tree, not a serial chain), ≤ 8·2⁻⁹ ≈ 1.6e-2 relative
                # worst case — the documented bf16-tier bound; the chunk
                # totals below keep their exact split
                sdt = mdt

                def roll_s(v, d):
                    # Mosaic rejects lane rotates on non-32-bit data;
                    # roll the int32 bit view instead — it packs two
                    # bf16 SUBLANES per word, and a lane-axis roll moves
                    # both identically (no-op wrapper in the f32 tier;
                    # interpret mode rolls bf16 directly — CPU allows it)
                    if sdt == jnp.float32 or exact_dots:
                        return pltpu.roll(v, shift=d, axis=1)
                    vi = pltpu.bitcast(v, jnp.int32)
                    return pltpu.bitcast(pltpu.roll(vi, shift=d, axis=1),
                                         jnp.bfloat16)

                one16 = one_minus.astype(sdt)
                excl = jnp.where(same_seg(1), roll_s(one16, 1),
                                 jnp.ones((), sdt))
                d = 1
                while d < cw:
                    excl = excl * jnp.where(
                        same_seg(d), roll_s(excl, d),
                        jnp.ones((), sdt))
                    d *= 2
                excl = excl.astype(jnp.float32)

            if not group_stream:
                w = alpha * excl * trans_lane          # (win, LANES)

            if track_hits:
                # exact per-pixel accepted-pair count: accept and onehot
                # are both 0/1 — exact in bf16, a single MXU pass
                haux = [haux[0] + mm(accept.astype(acc_dtype),
                                     onehot.astype(acc_dtype),
                                     (((1,), (1,)), ((), ())))]
            if ablate == "nodots":
                r_acc = r_acc + 1e-30 * jnp.sum(w * cr)
                g_acc = g_acc + 1e-30 * jnp.sum(w * cg)
                b_acc = b_acc + 1e-30 * jnp.sum(w * cb)
                trans = trans * (1.0 - 1e-30 * jnp.sum(one_minus))
                return tuple([trans, r_acc, g_acc, b_acc] + haux)
            if compact:
                # fold colors into the one-hot: (w∘(1⊗c)) @ Oᵀ = w @ (O∘c)ᵀ
                # — the three (win, 128) color mults become (bs, 128) ops
                # on the one-hot side, same MXU MACs. The colored one-hot
                # rides as a single bf16 operand: its 2⁻⁹ color rounding
                # sits below the rgba8 quantization already in this tier
                # (exact f32 under interpret); w keeps its per-tier split.
                cdt = acc_dtype
                r_acc = r_acc + dot_lanes_split(w, onehot * cr.astype(cdt))
                g_acc = g_acc + dot_lanes_split(w, onehot * cg.astype(cdt))
                b_acc = b_acc + dot_lanes_split(w, onehot * cb.astype(cdt))
            else:
                rgb = jnp.concatenate([w * cr, w * cg, w * cb], axis=0)
                rgb_cols = dot_lanes_split(rgb, onehot)    # (3*win, bs)
                r_acc = r_acc + rgb_cols[:win]
                g_acc = g_acc + rgb_cols[win:2 * win]
                b_acc = b_acc + rgb_cols[2 * win:]

            if group_stream:
                # ORDER-INDEPENDENT chunk totals: the group stream
                # interleaves tiles within a chunk (pairs are only
                # depth-ordered PER TILE), so "inclusive product at the
                # segment's last lane" is meaningless — the per-tile
                # total is the sum of the tile's lanes' lm, and with the
                # carry in log space the update is a plain ADD (tiles
                # absent from the chunk get +0 for free). Exact hi/lo
                # split keeps the log-sum at ~2^-17 relative for the
                # term_eps gate.
                trans = trans + dot_lanes_split(lm, onehot, exact=True)
                return tuple([trans, r_acc, g_acc, b_acc] + haux)
            if half:
                # bf16 tier: the chunk totals must NOT reuse excl (the
                # roll scan's excl is bf16-rounded, and a totals error
                # compounds multiplicatively into trans across chunks) —
                # take the exact-split log-sum per tile column instead
                # (order-independent, absent tiles get exp(0) = 1)
                lm_t = jnp.log(jnp.maximum(one_minus, 1e-30))
                trans = trans * jnp.exp(
                    dot_lanes_split(lm_t, onehot, exact=True))
                return tuple([trans, r_acc, g_acc, b_acc] + haux)
            # chunk totals: inclusive product at each segment's last
            # in-chunk lane, pulled to columns by a masked-sum matmul
            # (exactly one nonzero lane per present segment); absent
            # segments multiply by 1
            nxt = pltpu.roll(s_tile, shift=cw - 1, axis=1)     # s[q+1]
            last = (s_tile != nxt) | (lane == cw - 1)          # (1, cw)
            onehot_last = onehot * last.astype(acc_dtype)
            incl = jnp.concatenate([excl * one_minus, ones_lane], axis=0)
            # exact hi/lo even in the bf16 tier: trans multiplies a chunk
            # total per chunk (~4 deep per subtile) and gates term_eps
            cols = dot_lanes_split(incl, onehot_last, exact=True)
            # (win+1, bs)
            seg_tot = cols[:win]
            has = cols[win:]                                   # (1, bs)
            trans = trans * jnp.where(has > 0, seg_tot, 1.0)
            return tuple([trans, r_acc, g_acc, b_acc] + haux)

        # skip the math once every subtile present in this chunk has
        # saturated (front-to-back makes later chunks no-ops); the DMA
        # stream keeps flowing so the pipeline stays intact (saturation-
        # skipped pairs are NOT counted as hits — like the reference's
        # terminated rays visiting no further BVH nodes)
        carry_in = (trans, r_acc, g_acc, b_acc) \
            + ((hits,) if track_hits else ())
        # group mode gate: routed log-trans, with out-of-group lanes
        # masked to -inf (their routed value is 0 = log 1, which would
        # otherwise hold the gate open forever) — same "present tiles
        # saturated" semantics as the tile stream's gate
        if group_stream:
            in_grp = (s_local >= 0) & (s_local < bs)       # (1, cw)
            gate = jnp.max(jnp.where(in_grp, trans_lane, -jnp.inf)) \
                > log_eps
        else:
            gate = jnp.max(trans_lane) > term_eps
        carry_out = jax.lax.cond(gate, blend, lambda a: a, carry_in)
        trans, r_acc, g_acc, b_acc = carry_out[:4]
        if track_hits:
            hits = carry_out[4]
        return (j + 1, trans, r_acc, g_acc, b_acc) \
            + ((sat,) if track_consumed else ()) \
            + ((hits,) if track_hits else ())

    def cond(state):
        return state[0] < total_chunks

    zero = jnp.zeros((win, bs), jnp.float32)
    # group mode: log-space carry, log(1) = 0
    init = (jnp.int32(0), zero if group_stream else zero + 1.0,
            zero, zero, zero)
    if track_consumed:
        # iota-derived zeros: a constant init takes a lane-REPLICATED
        # Mosaic layout, and the loop body's lane-distributed update can
        # never relayout back to it (Invalid relayout on real TPU); >>31
        # of the non-negative iota is 0 everywhere but not const-folded
        sat0 = jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1) >> 31
        init = init + (sat0,)
    if track_hits:
        h0 = (jax.lax.broadcasted_iota(jnp.int32, (win, bs), 1)
              >> 31).astype(jnp.float32)
        init = init + (h0,)
    fin = jax.lax.while_loop(cond, body, init)
    _, trans, r_acc, g_acc, b_acc = fin[:5]
    aux = list(fin[5:])
    if track_consumed:
        consumed_ref[0] = jnp.broadcast_to(aux.pop(0), (8, bs))
    if track_hits:
        hits_ref[...] = aux.pop(0).T.astype(jnp.int32)

    trans_ref[...] = jnp.exp(trans).T if group_stream else trans.T
    color_ref[0, :, :] = r_acc.T
    color_ref[1, :, :] = g_acc.T
    color_ref[2, :, :] = b_acc.T


def blend_packed(
    binning: TileBinning,
    *,
    width: int, height: int, sub_w: int = 16, sub_h: int = 16,
    bs: int = 8, g_cutoff: float = 5.6,
    alpha_threshold: float = 1.0 / 255.0, alpha_clamp: float = 0.99,
    term_eps: float = 1e-4, interpret: bool = False,
    skip_range_check: bool = False, use_exp_lut: bool = False,
    track_consumed: bool = False, ablate: str = "",
    scan_impl: str = "roll", track_hits: bool = False,
    math_dtype: str = "f32", chunk: int = LANES,
    group_stream: bool = False,
):
    """Run the packed blend. `binning` must have been built with
    tile_w=sub_w, tile_h=sub_h (compact payloads are detected from the
    payload dtype). Returns (color [H,W,3], trans [H,W]), plus
    — when track_consumed — a raw [G, bs] int32 map of the first chunk
    index at which each tile column was saturated (== the group's chunk
    count when it never saturated; position bound = group_aligned_start +
    sat*128, the serving cutoff feedback), plus — when track_hits — an
    exact [H, W] int32 per-pixel accepted-splat count (the
    rt_avg_nodes_per_ray analogue, gpu-sim.cc:1504-1532; one extra 0/1
    MXU pass per chunk). Saturation-skipped chunks count no hits.

    ablate ("", "noscan", "noewa", "nodots", "dmaonly") disables kernel
    stages for perf ablation (tools/blend_ablation.py) — output is WRONG
    in any non-"" mode; "nodots" additionally assumes bs == 128.

    math_dtype="bf16" runs the EWA/alpha elementwise math in bfloat16 and
    drops the lo pass of the value-side MXU contractions (~1e-2-class
    color error, same order as the compact payload tier); transmittance
    carries, the scan's log/exp, and the per-segment total update stay
    f32. Under interpret=True the dots are exact-f32 either way, so CPU
    tests exercise the bf16 elementwise path only."""
    win = sub_w * sub_h
    assert win % 128 == 0, "subtile pixel count must be a multiple of 128"
    assert chunk % 128 == 0, "pair chunk must be whole 128-lane tiles"
    assert bs % 8 == 0, "Mosaic output blocks need sublane dims % 8 == 0"
    if group_stream:
        # the group stream interleaves tiles within a chunk: the roll
        # scan's run-adjacency segments and the run-based chunk totals
        # are both invalid there (tile_binning._build_group_stream)
        assert scan_impl == "logmm", "group stream requires the logmm scan"
    compact = binning.payload.dtype == jnp.int32
    p_width = COMPACT_STORE if compact else PAYLOAD_WIDTH
    p_dtype = jnp.int32 if compact else jnp.float32
    ntx, nty = tile_extent(width, height, sub_w, sub_h)
    T = ntx * nty
    t_pad = (-T) % bs
    tile_start = binning.tile_start
    if t_pad:
        tile_start = jnp.concatenate(
            [tile_start, jnp.broadcast_to(tile_start[-1:], (t_pad,))])
    G = (T + t_pad) // bs

    kernel = functools.partial(
        _blend_packed_kernel,
        ntx=ntx, sub_w=sub_w, sub_h=sub_h, bs=bs,
        g_cutoff=g_cutoff, alpha_threshold=alpha_threshold,
        alpha_clamp=alpha_clamp, term_eps=term_eps,
        skip_range_check=skip_range_check, use_exp_lut=use_exp_lut,
        exact_dots=interpret, track_consumed=track_consumed, ablate=ablate,
        compact=compact, scan_impl=scan_impl, track_hits=track_hits,
        math_dtype=math_dtype, cw=chunk, group_stream=group_stream,
    )

    out_specs = [
        pl.BlockSpec((3, bs, win), index_map=lambda g, ts: (0, g, 0)),
        pl.BlockSpec((bs, win), index_map=lambda g, ts: (g, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((3, G * bs, win), jnp.float32),
        jax.ShapeDtypeStruct((G * bs, win), jnp.float32),
    ]
    if track_consumed:
        # (8, bs) per-group block: Mosaic requires the last two block dims
        # be (8, 128)-divisible, so the (1, bs) row pads to a full sublane
        # tile (broadcast-written; row 0 read back below)
        out_specs.append(pl.BlockSpec((1, 8, bs),
                                      index_map=lambda g, ts: (g, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((G, 8, bs), jnp.int32))
    if track_hits:
        out_specs.append(pl.BlockSpec((bs, win),
                                      index_map=lambda g, ts: (g, 0)))
        out_shape.append(jax.ShapeDtypeStruct((G * bs, win), jnp.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, p_width, chunk), p_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(tile_start, binning.payload)
    color, trans = outs[0], outs[1]
    nxt = 2
    consumed = None
    if track_consumed:
        consumed = outs[nxt][:, 0, :]
        nxt += 1
    hits = outs[nxt] if track_hits else None

    # subtile-major (T, WIN) -> framebuffer (H, W)
    def unshuffle(a):
        lead = a.shape[:-2]
        a = a[..., :T, :].reshape(lead + (nty, ntx, sub_h, sub_w))
        a = jnp.moveaxis(a, -2, -3)
        return a.reshape(lead + (nty * sub_h, ntx * sub_w))[
            ..., :height, :width]

    color = jnp.transpose(unshuffle(color), (1, 2, 0))
    res = (color, unshuffle(trans))
    if track_consumed:
        res = res + (consumed,)
    if track_hits:
        res = res + (unshuffle(hits),)
    return res
