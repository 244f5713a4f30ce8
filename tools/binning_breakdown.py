"""Fine-grained TPU timing of the binning sub-stages at 1M splats/1080p.

Each sub-stage is timed as a separate jitted function (cumulative
prefixes, like tools/stage_timing.py), so stage cost = difference of
consecutive rows. Run: python tools/binning_breakdown.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gsrt.core.config import RenderConfig
from gsrt.models.gaussian_rt import (_precompute_fm, fm_from_cloud,
                                     GaussianRayTracer)
from gsrt.ops.gaussian import screen_extents_abc
from gsrt.ops.tile_binning import (compute_tile_spans, tile_histogram,
                                   tile_extent, pack15, PAYLOAD_WIDTH,
                                   N_FEATURES)
from gsrt.ops.pair_expand import _DEAD_BASE, expand_pairs, TAB_ROWS
from gsrt.scene import random_cloud


def timeit(fn, *args, n=8):
    """Pipelined timing: queue n launches, sync once — the axon tunnel has
    a ~30 ms per-round-trip latency that amortizes across queued launches
    (jax.block_until_ready is a no-op through the tunnel; sync via a tiny
    dependent reduction fetch)."""
    sync = jax.jit(lambda r: jax.tree_util.tree_leaves(r)[0].ravel()[:1].sum())
    float(sync(fn(*args)))
    t0 = time.perf_counter()
    r = None
    for _ in range(n):
        r = fn(*args)
    float(sync(r))
    return (time.perf_counter() - t0) / n


W, H, N = 1920, 1080, 1_000_000
cfg = RenderConfig(width=W, height=H, conic_mode="standard")
cloud, camera = random_cloud(N, seed=0, width=W, height=H,
                             scale_range=(0.004, 0.03))
MP = GaussianRayTracer(cfg, "tiled").calibrate(cloud, camera)
TW, TH, CH = cfg.tile_w, cfg.tile_h, cfg.pair_chunk
ntx, nty = tile_extent(W, H, TW, TH)
T = ntx * nty
print(f"max_pairs={MP} T={T}")


def project_only(fmc, camera):
    from gsrt.ops.gaussian import project_gaussians_fm
    return project_gaussians_fm(fmc.meansT, fmc.cov3dT, camera,
                                conic_mode=cfg.conic_mode,
                                cov2d_dilation=cfg.cov2d_dilation)


def sh_only(fmc, camera):
    from gsrt.ops.sh import eval_sh_fm
    dx = fmc.meansT[0] - camera.position[0]
    dy = fmc.meansT[1] - camera.position[1]
    dz = fmc.meansT[2] - camera.position[2]
    inv = 1.0 / jnp.maximum(jnp.sqrt(dx * dx + dy * dy + dz * dz), 1e-9)
    return eval_sh_fm(fmc.shT, dx * inv, dy * inv, dz * inv, cfg.sh_degree)


def inputs(fmc, camera):
    depth, m2x, m2y, qa, qb, qc, in_front, cr, cg, cb = _precompute_fm(
        fmc, camera, cfg)
    rx, ry = screen_extents_abc(qa, qb, qc, cfg.conic_mode, cfg.g_cutoff,
                                opacity=fmc.opacity,
                                alpha_threshold=cfg.alpha_threshold)
    alive = in_front & (fmc.opacity > cfg.alpha_threshold)
    opacity = jnp.where(alive, fmc.opacity, 0.0)
    return depth, m2x, m2y, qa, qb, qc, opacity, cr, cg, cb, rx, ry, alive


def upto_spans(fmc, camera):
    (depth, m2x, m2y, qa, qb, qc, opacity, cr, cg, cb, rx, ry,
     alive) = inputs(fmc, camera)
    x0, x1, y0, y1, touched = compute_tile_spans(
        m2x, m2y, rx, ry, alive, W, H, TW, TH)
    return (x0, x1, y0, y1, touched, depth, m2x, m2y, qa, qb, qc, opacity,
            cr, cg, cb)


def upto_hist(fmc, camera):
    x0, x1, y0, y1, touched, *rest = upto_spans(fmc, camera)
    counts = tile_histogram(x0, x1, y0, y1, touched > 0, ntx, nty)
    return counts, touched


def upto_carrysort(fmc, camera):
    (x0, x1, y0, y1, touched, depth, m2x, m2y, qa, qb, qc, opacity,
     cr, cg, cb) = upto_spans(fmc, camera)
    key = jnp.where(touched > 0, depth, jnp.inf)
    xy0 = x0 | (y0 << 12)
    wspan_touch = ((x1 - x0 + 1) << 20) | touched
    ops = jax.lax.sort(
        (key, xy0, wspan_touch, m2x, m2y, qa, qb, qc,
         pack15(cr, cg), pack15(cb, opacity)),
        num_keys=1, is_stable=False)
    return ops


def upto_base(fmc, camera):
    ops = upto_carrysort(fmc, camera)
    (_, xy0, wspan_touch, m2x, m2y, qa, qb, qc, rgp, bop) = ops
    touched_s = wspan_touch & 0xFFFFF
    offsets = jnp.cumsum(touched_s)
    base = jnp.where(touched_s > 0, offsets - touched_s, _DEAD_BASE)
    return base, xy0, wspan_touch, m2x, m2y, qa, qb, qc, rgp, bop


def upto_expand(fmc, camera):
    base, xy0, wspan_touch, m2x, m2y, qa, qb, qc, rgp, bop = upto_base(
        fmc, camera)
    x0s = xy0 & 0xFFF
    y0s = xy0 >> 12
    w_span = jnp.maximum(wspan_touch >> 20, 1)
    geom_n = [x0s, y0s, w_span, base]
    feats_n = [m2x, m2y, qa, qb, qc, rgp, bop]
    tabf = jnp.stack(
        [jax.lax.bitcast_convert_type(a, jnp.float32) for a in geom_n]
        + feats_n + [jnp.zeros_like(m2x)] * (TAB_ROWS - 11), axis=0)
    rowsf = expand_pairs(tabf, base, MP, chunk=512)
    return rowsf




def full_pre_sort(fmc, camera):
    base, xy0, wspan_touch, m2x, m2y, qa, qb, qc, rgp, bop = upto_base(
        fmc, camera)
    x0s = xy0 & 0xFFF
    y0s = xy0 >> 12
    w_span = jnp.maximum(wspan_touch >> 20, 1)
    touched_s = wspan_touch & 0xFFFFF
    geom_n = [x0s, y0s, w_span, base]
    feats_n = [m2x, m2y, qa, qb, qc, rgp, bop]
    tabf = jnp.stack(
        [jax.lax.bitcast_convert_type(a, jnp.float32) for a in geom_n]
        + feats_n + [jnp.zeros_like(m2x)] * (TAB_ROWS - 11), axis=0)
    rowsf = expand_pairs(tabf, base, MP, chunk=512)
    geom = jax.lax.bitcast_convert_type(rowsf[:4], jnp.int32)
    gx0, gy0, gw, gbase = geom[0], geom[1], geom[2], geom[3]
    pair_feats = [rowsf[4 + i] for i in range(N_FEATURES)]
    total = jnp.sum(touched_s)
    slots = jnp.arange(MP, dtype=jnp.int32)
    valid = slots < jnp.minimum(total, MP)
    rank = slots - gbase
    tx = gx0 + rank % gw
    ty = gy0 + rank // gw
    tile = jnp.where(valid, ty * ntx + tx, T).astype(jnp.int32)
    return (tile,) + tuple(pair_feats)


def full_with_tilesort(fmc, camera):
    ops = full_pre_sort(fmc, camera)
    sorted_ops = jax.lax.sort(ops, num_keys=1, is_stable=True)
    return sorted_ops


rows = [
    ("project only", jax.jit(project_only)),
    ("sh only", jax.jit(sh_only)),
    ("precompute+extents", jax.jit(inputs)),
    ("  +spans", jax.jit(upto_spans)),
    ("  +mxu histogram", jax.jit(upto_hist)),
    ("  +carry sort", jax.jit(upto_carrysort)),
    ("  +cumsum base", jax.jit(upto_base)),
    ("  +expand kernel", jax.jit(upto_expand)),
    ("  +tileid math", jax.jit(full_pre_sort)),
    ("  +tile sort", jax.jit(full_with_tilesort)),
]
from gsrt.models.gaussian_rt import fm_from_cloud as _ffc
fmc = jax.block_until_ready(_ffc(cloud))
prev = 0.0
for name, fn in rows:
    t = timeit(fn, fmc, camera)
    print(f"{name:24s} {t*1e3:7.1f} ms  (Δ {1e3*(t-prev):6.1f})", flush=True)
    prev = t
