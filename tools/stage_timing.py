"""Measure per-stage wall time of the tiled pipeline on the bench scene,
plus pair-duplication factors for candidate tile shapes.

Run on the real TPU chip: `python tools/stage_timing.py`
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gsrt.core.config import RenderConfig
from gsrt.models.gaussian_rt import (GaussianRayTracer, _precompute,
                                     render_tiled)
from gsrt.ops.gaussian import screen_extents
from gsrt.ops.tile_binning import build_tile_binning, compute_tile_spans
from gsrt.scene.catalog import random_cloud


def timeit(fn, *args, n=10):
    """Pipelined: queue n launches, sync once (amortizes the axon tunnel's
    ~30 ms round-trip; block_until_ready is a no-op through the tunnel)."""
    sync = jax.jit(lambda r: jax.tree_util.tree_leaves(r)[0].ravel()[:1].sum())
    float(sync(fn(*args)))
    t0 = time.perf_counter()
    r = None
    for _ in range(n):
        r = fn(*args)
    float(sync(r))
    return (time.perf_counter() - t0) / n


W, H, N = 1920, 1080, 1_000_000
TW, TH = (int(x) for x in (sys.argv[1].split("x") if len(sys.argv) > 1
                           else ("128", "8")))
PC = int(sys.argv[2]) if len(sys.argv) > 2 else (384 if TW == 128 else 128)
EXPAND = sys.argv[3] if len(sys.argv) > 3 else "pallas"
cfg = RenderConfig(width=W, height=H, conic_mode="standard",
                   tile_w=TW, tile_h=TH, pair_chunk=PC)
cloud, camera = random_cloud(N, seed=0, width=W, height=H,
                             scale_range=(0.004, 0.03))
SKIP_DUP = len(sys.argv) > 1

if not SKIP_DUP:
    # ---- duplication factors for tile shapes ----
    depth, mean2d, quad, in_front, colors = jax.jit(
        functools.partial(_precompute, cfg=cfg))(cloud, camera)
    rx, ry = screen_extents(quad, cfg.conic_mode, cfg.g_cutoff,
                            opacity=cloud.opacity,
                            alpha_threshold=cfg.alpha_threshold)
    alive = in_front & (cloud.opacity > cfg.alpha_threshold)
    print(f"median rx={float(jnp.median(jnp.where(alive, rx, jnp.nan))):.1f} "
          f"ry={float(jnp.median(jnp.where(alive, ry, jnp.nan))):.1f} px")
    base = None
    for tw, th in [(128, 8), (64, 8), (32, 8), (16, 8), (16, 16), (128, 16)]:
        *_, touched = compute_tile_spans(mean2d[:, 0], mean2d[:, 1], rx, ry,
                                         alive, W, H, tw, th)
        tot = int(jnp.sum(touched))
        if base is None:
            base = tot
        ntx, nty = -(-W // tw), -(-H // th)
        print(f"tile {tw}x{th}: pairs={tot/1e6:.2f}M "
              f"dup_vs_128x8={tot/base:.2f} T={ntx*nty}")

# ---- stage timings ----
mp = GaussianRayTracer(cfg, "tiled").calibrate(cloud, camera)
print(f"tile {TW}x{TH} chunk {PC} expand={EXPAND} "
      f"max_pairs = {mp} ({mp/1e6:.2f}M)")


from gsrt.models.gaussian_rt import fm_from_cloud, _precompute_fm
from gsrt.ops.gaussian import screen_extents_abc

fmc = jax.block_until_ready(fm_from_cloud(cloud))


@jax.jit
def stage_project(fmc, camera):
    return _precompute_fm(fmc, camera, cfg)


@jax.jit
def stage_binning(fmc, camera):
    depth, m2x, m2y, qa, qb, qc, in_front, cr, cg, cb = _precompute_fm(
        fmc, camera, cfg)
    rx, ry = screen_extents_abc(qa, qb, qc, cfg.conic_mode, cfg.g_cutoff,
                                opacity=fmc.opacity,
                                alpha_threshold=cfg.alpha_threshold)
    alive = in_front & (fmc.opacity > cfg.alpha_threshold)
    return build_tile_binning(
        depth, m2x, m2y, qa, qb, qc, fmc.opacity, cr, cg, cb, rx, ry, alive,
        width=W, height=H, tile_w=TW, tile_h=TH,
        chunk=cfg.pair_chunk, max_pairs=mp, expand_impl=EXPAND)


full = jax.jit(functools.partial(render_tiled, cfg=cfg, max_pairs=mp))

t_proj = timeit(stage_project, fmc, camera)
t_bin = timeit(stage_binning, fmc, camera)
t_full = timeit(full, fmc, camera)
print(f"projection+SH: {t_proj*1e3:.1f} ms")
print(f"proj+binning:  {t_bin*1e3:.1f} ms  (binning ≈ {(t_bin-t_proj)*1e3:.1f})")
print(f"full frame:    {t_full*1e3:.1f} ms  (blend ≈ {(t_full-t_bin)*1e3:.1f})")
print(f"Mrays/s = {W*H/t_full/1e6:.2f}")
