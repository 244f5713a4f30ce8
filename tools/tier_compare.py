"""End-to-end frame-time sweep over the opt-in perf tiers at the headline
workload: expand_impl x payload x span_mode x scan_impl. Prints a ranked
table; the winner becomes the default config.

Usage: python tools/tier_compare.py [N] [W] [H]
       python tools/tier_compare.py --quick   (pallas/fused x f32/compact only)
"""

from __future__ import annotations

import functools
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from gsrt.core.config import RenderConfig
from gsrt.models.gaussian_rt import (GaussianRayTracer, fm_from_cloud,
                                     render_tiled)
from gsrt.scene.catalog import random_cloud


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    quick = "--quick" in sys.argv
    N = int(args[0]) if len(args) > 0 else 1_000_000
    W = int(args[1]) if len(args) > 1 else 1920
    H = int(args[2]) if len(args) > 2 else 1080
    cloud, camera = random_cloud(N, seed=0, width=W, height=H,
                                 scale_range=(0.004, 0.03))
    fm = jax.block_until_ready(fm_from_cloud(cloud))

    grid = itertools.product(
        ["pallas", "fused"],
        ["f32", "compact"],
        ["rect"] if quick else ["rect", "ellipse"],
        ["roll"] if quick else ["roll", "logmm"])

    ref_img = None
    rows = []
    for expand, payload, span, scan in grid:
        cfg = RenderConfig(width=W, height=H, conic_mode="standard",
                           expand_impl=expand, payload=payload,
                           span_mode=span, scan_impl=scan)
        tracer = GaussianRayTracer(cfg, "tiled")
        mp = tracer.calibrate(cloud, camera)
        render = functools.partial(render_tiled, cfg=cfg, max_pairs=mp,
                                   max_rows=tracer.max_rows)

        @jax.jit
        def step(fm, camera, render=render):
            out = render(fm, camera)
            return out.trans.sum() + out.color.sum()

        @jax.jit
        def frame(fm, camera, render=render):
            return render(fm, camera).color

        name = f"{expand}/{payload}/{span}/{scan}"
        try:
            float(step(fm, camera))
        except Exception as e:  # noqa: BLE001 — report and keep sweeping
            print(f"{name:28s}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        img = np.asarray(frame(fm, camera))
        if ref_img is None:
            ref_img = img
        err = float(np.abs(img - ref_img).max())
        K = 10
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = None
            for _ in range(K):
                r = step(fm, camera)
            float(r)
            times.append((time.perf_counter() - t0) / K)
        dt = min(times)
        rows.append((dt, name, mp, err))
        print(f"{name:28s}: {dt * 1e3:7.2f} ms/frame "
              f"({W * H / dt / 1e6:6.1f} Mrays/s)  mp={mp} "
              f"maxerr={err:.1e}", flush=True)

    rows.sort()
    print("\n=== ranked ===")
    for dt, name, mp, err in rows:
        print(f"{dt * 1e3:8.2f} ms  {name}  (maxerr {err:.1e})")


if __name__ == "__main__":
    main()
