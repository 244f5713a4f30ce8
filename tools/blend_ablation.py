"""Packed-blend kernel stage ablation at the bench shape (1M/1080p).

Times blend_packed with kernel stages disabled one at a time (ablate=
"noscan" / "noewa" / "nodots" / "dmaonly"); stage cost = full - ablated.
The binning is built once and materialized, so only kernel time varies.
Run on TPU: python tools/blend_ablation.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gsrt.core.config import RenderConfig
from gsrt.models.gaussian_rt import (GaussianRayTracer, _precompute_fm,
                                     fm_from_cloud)
from gsrt.ops.gaussian import screen_extents_abc
from gsrt.ops.splat_packed import blend_packed
from gsrt.ops.tile_binning import build_tile_binning
from gsrt.scene import random_cloud


def timeit(fn, *args, n=16):
    sync = jax.jit(lambda r: jax.tree_util.tree_leaves(r)[0].ravel()[:1].sum())
    float(sync(fn(*args)))
    t0 = time.perf_counter()
    r = None
    for _ in range(n):
        r = fn(*args)
    float(sync(r))
    return (time.perf_counter() - t0) / n


def main():
    W, H, N = 1920, 1080, 1_000_000
    cfg = RenderConfig(width=W, height=H, conic_mode="standard")
    cloud, camera = random_cloud(N, seed=0, width=W, height=H,
                                 scale_range=(0.004, 0.03))
    mp = GaussianRayTracer(cfg, "tiled").calibrate(cloud, camera)
    fm = fm_from_cloud(cloud)

    @jax.jit
    def build(fm):
        depth, m2x, m2y, qa, qb, qc, in_front, cr, cg, cb = _precompute_fm(
            fm, camera, cfg)
        rx, ry = screen_extents_abc(qa, qb, qc, cfg.conic_mode, cfg.g_cutoff,
                                    opacity=fm.opacity,
                                    alpha_threshold=cfg.alpha_threshold)
        alive = in_front & (fm.opacity > cfg.alpha_threshold)
        return build_tile_binning(
            depth, m2x, m2y, qa, qb, qc, fm.opacity, cr, cg, cb, rx, ry,
            alive, width=W, height=H, tile_w=cfg.tile_w, tile_h=cfg.tile_h,
            chunk=cfg.pair_chunk, max_pairs=mp, expand_impl=cfg.expand_impl)

    binning = jax.block_until_ready(build(fm))
    print(f"max_pairs={mp} total={int(binning.total_pairs)}")

    for mode in ["", "noscan", "noewa", "nodots", "dmaonly"]:
        fn = jax.jit(lambda b, m=mode: blend_packed(
            b, width=W, height=H, sub_w=cfg.tile_w, sub_h=cfg.tile_h,
            bs=cfg.blend_bs, skip_range_check=True, ablate=m))
        ms = timeit(fn, binning) * 1e3
        print(f"{mode or 'full':>8}: {ms:7.2f} ms")

    # scan_impl tiers (full kernel, exclusive-cumprod variants)
    for scan in ["roll", "logmm"]:
        fn = jax.jit(lambda b, s=scan: blend_packed(
            b, width=W, height=H, sub_w=cfg.tile_w, sub_h=cfg.tile_h,
            bs=cfg.blend_bs, skip_range_check=True, scan_impl=s))
        ms = timeit(fn, binning) * 1e3
        print(f"scan:{scan:>6}: {ms:7.2f} ms")


if __name__ == "__main__":
    main()
