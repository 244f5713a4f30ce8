"""Differentiable tiled splatting — custom VJP around the binned blend.

`render_fast` is AD-friendly but O(N·pixels); this module makes the TILED
perf path trainable: the forward is the production binning + Pallas blend,
the backward is a dedicated Pallas kernel (gsrt.ops.splat_grad) that
re-walks each tile's pair list and emits per-pair gradients, which are
then routed back to splats with two carried sorts (pair→depth order via
the idp row, splat→original order via the carried orig index) and a
cumsum segment reduction.

Use small tiles (16x16 recommended) for training configs: the backward
kernel holds ~23 live (win, window) temporaries in VMEM, which exceeds
the 16 MB scoped limit at the render-default 128x8 tile shape (1024-px
windows) but fits comfortably at 256-px tiles.

Non-differentiable pieces — the depth sort order, footprint extents,
culling masks, and the pack15 color quantization — are treated as
constants of the step, exactly like sort/cull indices in the standard
INRIA CUDA trainer (quantization passes gradients straight through; its
value error is ≤ PACK_RANGE/32767 ≈ 1.2e-4).

The reference has no training path; fitting is the capability gap named
in SURVEY.md §0 (the .ply scenes it would consume are produced by exactly
this optimization).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gsrt.core.config import RenderConfig
from gsrt.core.types import Camera, GaussianCloud
from gsrt.ops.tile_binning import tile_extent


def tiled_blend_diff(cfg: RenderConfig, camera: Camera, max_pairs: int,
                     depth, rx, ry, alive, interpret: bool = False):
    """Build the custom-VJP blend core for one (cfg, camera, buffer-size)
    configuration. depth/rx/ry/alive are captured as non-differentiable
    constants (they only pick the visit order and the culling set).

    Returns core(m2x, m2y, qa, qb, qc, opacity, cr, cg, cb)
    -> (color [H,W,3], trans [H,W]) — background NOT applied."""
    from gsrt.ops.tile_binning import build_tile_binning
    tw, th = cfg.tile_w, cfg.tile_h
    W, H = camera.width, camera.height
    ntx, nty = tile_extent(W, H, tw, th)
    T = ntx * nty
    Hp, Wp = nty * th, ntx * tw

    alpha_clamp = 0.99 if cfg.conic_mode == "standard" else 0.999999
    skip_range = (cfg.conic_mode == "standard"
                  and cfg.alpha_threshold >= 1.0 / 255.0
                  and cfg.g_cutoff >= 5.55
                  and not cfg.use_exp_lut)

    # the backward kernel is VMEM-bound to 128-pair chunks; the forward
    # must use the SAME chunk or its saturation early-stop blends pairs
    # at chunk-boundary granularity the backward then skips (zero grads
    # for pairs inside a straddling chunk)
    diff_chunk = min(cfg.pair_chunk, 128)

    def _forward(m2x, m2y, qa, qb, qc, opacity, cr, cg, cb):
        binning = build_tile_binning(
            depth, m2x, m2y, qa, qb, qc, opacity, cr, cg, cb, rx, ry,
            alive, width=W, height=H, tile_w=tw, tile_h=th,
            chunk=diff_chunk, max_pairs=max_pairs,
            expand_impl=cfg.expand_impl, interpret=interpret,
            with_ids=True)
        binning = jax.lax.optimization_barrier(binning)
        if (tw, th) == (128, 8):
            from gsrt.ops.splat_pallas import blend_tiles
            color, trans = blend_tiles(
                binning, width=W, height=H, chunk=diff_chunk,
                g_cutoff=cfg.g_cutoff, alpha_threshold=cfg.alpha_threshold,
                alpha_clamp=alpha_clamp, interpret=interpret,
                skip_range_check=skip_range, use_exp_lut=cfg.use_exp_lut)
        else:
            from gsrt.ops.splat_subtile import blend_subtiles
            color, trans = blend_subtiles(
                binning, width=W, height=H, sub_w=tw, sub_h=th,
                chunk=diff_chunk, g_cutoff=cfg.g_cutoff,
                alpha_threshold=cfg.alpha_threshold,
                alpha_clamp=alpha_clamp, interpret=interpret,
                skip_range_check=skip_range, use_exp_lut=cfg.use_exp_lut)
        return (color, trans), binning

    @jax.custom_vjp
    def core(m2x, m2y, qa, qb, qc, opacity, cr, cg, cb):
        out, _ = _forward(m2x, m2y, qa, qb, qc, opacity, cr, cg, cb)
        return out

    def core_fwd(m2x, m2y, qa, qb, qc, opacity, cr, cg, cb):
        (color, trans), b = _forward(m2x, m2y, qa, qb, qc, opacity,
                                     cr, cg, cb)
        res = (b.payload, b.tile_start, b.sorted_base, b.sorted_touched,
               b.sorted_orig, color, trans)
        return (color, trans), res

    def core_bwd(res, cots):
        from gsrt.ops.splat_grad import blend_backward
        payload, tile_start, sbase, stouched, sorig, color, trans = res
        dcolor, dtrans = cots

        def tilefy(img):                    # [H, W] -> [T * th*tw]
            a = jnp.pad(img, ((0, Hp - H), (0, Wp - W)))
            a = a.reshape(nty, th, ntx, tw).transpose(0, 2, 1, 3)
            return a.reshape(T * th * tw)

        pixstate = jnp.stack(
            [tilefy(color[..., 0]), tilefy(color[..., 1]),
             tilefy(color[..., 2]), tilefy(trans),
             tilefy(dcolor[..., 0]), tilefy(dcolor[..., 1]),
             tilefy(dcolor[..., 2]), tilefy(dtrans)], axis=0)
        pixstate, payload = jax.lax.optimization_barrier(
            (pixstate, payload))

        # the backward holds ~25 live (th, tw, window) temporaries in
        # VMEM; a 128-pair chunk (256-lane window) keeps that under the
        # 16 MB scoped limit at every tile shape (384-pair chunks at
        # 128x8 tiles measured 40 MB -> compile OOM)
        grad = blend_backward(
            payload, tile_start, pixstate, width=W, height=H,
            tile_w=tw, tile_h=th, chunk=diff_chunk,
            g_cutoff=cfg.g_cutoff, alpha_threshold=cfg.alpha_threshold,
            alpha_clamp=alpha_clamp, skip_range_check=skip_range,
            use_exp_lut=cfg.use_exp_lut, interpret=interpret)

        # pairs (tile order) -> depth-pair order via the carried idp row
        idp = jax.lax.bitcast_convert_type(payload[7, :max_pairs],
                                           jnp.int32)
        rows = tuple(grad[i, :max_pairs] for i in range(9))
        sorted_all = jax.lax.sort((idp,) + rows, num_keys=1,
                                  is_stable=True)
        g_depth = jnp.stack(sorted_all[1:], axis=0)        # [9, MP]

        # per-splat segment sums over [base, base + touched)
        csum = jnp.pad(jnp.cumsum(g_depth, axis=1), ((0, 0), (1, 0)))
        live = stouched > 0
        lo = jnp.where(live, sbase, 0)
        hi = jnp.clip(lo + stouched, 0, max_pairs)
        seg = csum[:, hi] - csum[:, lo]                    # [9, N]
        seg = jnp.where(live[None, :], seg, 0.0)

        # depth-sorted splat order -> original order via the orig index
        unsort = jax.lax.sort((sorig,) + tuple(seg[i] for i in range(9)),
                              num_keys=1, is_stable=True)
        (d_mx, d_my, d_qa, d_qb, d_qc, d_op, d_cr, d_cg, d_cb) = unsort[1:]
        return (d_mx, d_my, d_qa, d_qb, d_qc, d_op, d_cr, d_cg, d_cb)

    core.defvjp(core_fwd, core_bwd)
    return core


def render_tiled_diff(cloud, camera: Camera, cfg: RenderConfig,
                      max_pairs: int, interpret: bool = False):
    """Differentiable tiled render: [H,W,3] color (+white bg per cfg),
    trainable w.r.t. every GaussianCloud parameter. `cloud` may be a
    GaussianCloud or FMCloud."""
    from gsrt.models.gaussian_rt import (FMCloud, _precompute_fm,
                                         fm_from_cloud)
    from gsrt.ops.gaussian import screen_extents_abc

    fm = cloud if isinstance(cloud, FMCloud) else fm_from_cloud(cloud)
    depth, m2x, m2y, qa, qb, qc, in_front, cr, cg, cb = _precompute_fm(
        fm, camera, cfg)
    sg = jax.lax.stop_gradient
    rx, ry = screen_extents_abc(sg(qa), sg(qb), sg(qc), cfg.conic_mode,
                                cfg.g_cutoff, opacity=sg(fm.opacity),
                                alpha_threshold=cfg.alpha_threshold)
    alive = (in_front & (fm.opacity > cfg.alpha_threshold)
             & (depth > cfg.t_min)
             & (depth < min(cfg.t_max, cfg.init_depth)))
    core = tiled_blend_diff(cfg, camera, max_pairs, sg(depth), rx, ry,
                            sg(alive), interpret=interpret)
    color, trans = core(m2x, m2y, qa, qb, qc, fm.opacity, cr, cg, cb)
    if cfg.white_background:
        color = color + trans[..., None]
    return color, trans
