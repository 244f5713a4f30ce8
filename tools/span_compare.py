"""Compare rect vs ellipse pair spans end-to-end on the headline workload
(1M splats, 1920x1080, tiled packed blend): pipelined frame time per span
mode with per-mode calibrated buffers, plus image agreement.

Usage: python tools/span_compare.py [N] [W] [H] [scale_lo scale_hi]
"""

from __future__ import annotations

import functools
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
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
    sr = ((float(sys.argv[4]), float(sys.argv[5]))
          if len(sys.argv) > 5 else (0.004, 0.03))
    cloud, camera = random_cloud(N, seed=0, width=W, height=H,
                                 scale_range=sr)
    fm = jax.block_until_ready(fm_from_cloud(cloud))

    outs = {}
    for span in ("rect", "ellipse"):
        cfg = RenderConfig(width=W, height=H, conic_mode="standard",
                           span_mode=span)
        tracer = GaussianRayTracer(cfg, "tiled")
        mp = tracer.calibrate(cloud, camera)
        mr = tracer.max_rows
        render = functools.partial(render_tiled, cfg=cfg, max_pairs=mp,
                                   max_rows=mr)

        @jax.jit
        def step(fm, camera, render=render):
            out = render(fm, camera)
            return out.trans.sum() + out.color.sum()

        @jax.jit
        def frame(fm, camera, render=render):
            return render(fm, camera).color

        float(step(fm, camera))  # compile + warm
        outs[span] = np.asarray(frame(fm, camera))
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
        print(f"{span:8s}: {dt * 1e3:7.2f} ms/frame "
              f"({W * H / dt / 1e6:6.1f} Mrays/s)  max_pairs={mp}"
              + (f" max_rows={mr}" if mr else ""), flush=True)

    err = np.abs(outs["ellipse"] - outs["rect"])
    print(f"ellipse vs rect: max={err.max():.2e} mean={err.mean():.2e}",
          flush=True)


if __name__ == "__main__":
    main()
