"""Stage-isolated TPU timing of the group-contiguous stream vs the
tile-sorted stream at the headline workload: binning alone and blend
alone, per stream. Differences localize where the group stream wins or
loses. Run: python tools/group_probe.py [N W H]
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import gsrt  # noqa: F401
from gsrt.core.config import RenderConfig
from gsrt.models.gaussian_rt import (GaussianRayTracer, _precompute_fm,
                                     count_units_numpy, fm_from_cloud,
                                     pair_bucket)
from gsrt.ops.gaussian import screen_extents_abc
from gsrt.ops.splat_packed import blend_packed
from gsrt.ops.tile_binning import (build_tile_binning, group_rows_k,
                                   tile_extent)
from gsrt.scene import random_cloud


def timeit(fn, *args, n=8):
    sync = jax.jit(lambda r: jax.tree_util.tree_leaves(r)[0].ravel()[:1].sum())
    float(sync(fn(*args)))
    t0 = time.perf_counter()
    r = None
    for _ in range(n):
        r = fn(*args)
    float(sync(r))
    return (time.perf_counter() - t0) / n


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
    extra = {}
    if os.environ.get("GSRT_PAIR_CHUNK"):
        extra["pair_chunk"] = int(os.environ["GSRT_PAIR_CHUNK"])
    if os.environ.get("GSRT_TILE"):
        tw, th = os.environ["GSRT_TILE"].split("x")
        extra["tile_w"], extra["tile_h"] = int(tw), int(th)
    cfg = RenderConfig(width=W, height=H, conic_mode="standard", **extra)
    cloud, camera = random_cloud(N, seed=0, width=W, height=H,
                                 scale_range=(0.004, 0.03))
    MP = GaussianRayTracer(cfg, "tiled").calibrate(cloud, camera)
    ntx, nty = tile_extent(W, H, cfg.tile_w, cfg.tile_h)
    k = group_rows_k(ntx)
    total, units = count_units_numpy(cloud, camera, cfg, k)
    MU = pair_bucket(int(units * 1.1))
    print(f"MP={MP} MU={MU} k={k} bs={k*ntx}", flush=True)
    fm = jax.block_until_ready(fm_from_cloud(cloud))

    def bin_inputs(fmc, camera):
        depth, m2x, m2y, qa, qb, qc, in_front, cr, cg, cb = _precompute_fm(
            fmc, camera, cfg)
        rx, ry = screen_extents_abc(qa, qb, qc, cfg.conic_mode, cfg.g_cutoff,
                                    opacity=fmc.opacity,
                                    alpha_threshold=cfg.alpha_threshold)
        alive = in_front & (fmc.opacity > cfg.alpha_threshold)
        return (depth, m2x, m2y, qa, qb, qc, fmc.opacity, cr, cg, cb,
                rx, ry, alive)

    def binning_fn(stream):
        def f(fmc, camera):
            args = bin_inputs(fmc, camera)
            return build_tile_binning(
                *args, width=W, height=H, tile_w=cfg.tile_w,
                tile_h=cfg.tile_h, chunk=cfg.pair_chunk, max_pairs=MP,
                expand_impl=cfg.expand_impl, compact=True,
                stream=stream, max_rows=MU if stream == "group" else None)
        return jax.jit(f)

    for stream in ("tile", "group"):
        t = timeit(binning_fn(stream), fm, camera)
        print(f"binning[{stream}]   {t*1e3:8.2f} ms", flush=True)

    for stream in ("tile", "group"):
        b = jax.block_until_ready(binning_fn(stream)(fm, camera))
        bs = k * ntx if stream == "group" else cfg.blend_bs

        lut = bool(os.environ.get("GSRT_LUT"))
        scan = os.environ.get("GSRT_SCAN", "logmm")
        if stream == "group" and scan != "logmm":
            continue

        def blend_fn(binning):
            return blend_packed(
                binning, width=W, height=H, sub_w=cfg.tile_w,
                sub_h=cfg.tile_h, bs=bs, scan_impl=scan,
                math_dtype=cfg.blend_math, chunk=cfg.pair_chunk,
                skip_range_check=not lut, use_exp_lut=lut,
                group_stream=(stream == "group"))
        t = timeit(jax.jit(blend_fn), b)
        print(f"blend[{stream}] scan={scan}{' lut' if lut else ''} "
              f"{t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
