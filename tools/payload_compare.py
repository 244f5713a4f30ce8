"""Compare f32 vs compact pair payloads end-to-end on the headline
workload (1M splats, 1920x1080, tiled packed blend). Reports pipelined
frame time per payload plus the compact tier's color error vs f32.

Usage: python tools/payload_compare.py [N] [W] [H]
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
    base = RenderConfig(width=W, height=H, conic_mode="standard")
    cloud, camera = random_cloud(N, seed=0, width=W, height=H,
                                 scale_range=(0.004, 0.03))
    mp = GaussianRayTracer(base, "tiled").calibrate(cloud, camera)
    fm = jax.block_until_ready(fm_from_cloud(cloud))
    print(f"N={N} {W}x{H} max_pairs={mp}", flush=True)

    outs = {}
    for payload in ("f32", "compact"):
        cfg = base.replace(payload=payload)
        render = functools.partial(render_tiled, cfg=cfg, max_pairs=mp)

        @jax.jit
        def step(fm, camera, render=render):
            out = render(fm, camera)
            return out.trans.sum() + out.color.sum()

        @jax.jit
        def frame(fm, camera, render=render):
            return render(fm, camera).color

        float(step(fm, camera))  # compile + warm
        outs[payload] = np.asarray(frame(fm, camera))
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
        print(f"{payload:8s}: {dt * 1e3:7.2f} ms/frame "
              f"({W * H / dt / 1e6:6.1f} Mrays/s)", flush=True)

    err = np.abs(outs["compact"] - outs["f32"])
    mse = float((err ** 2).mean())
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    print(f"compact vs f32: max={err.max():.4f} mean={err.mean():.2e} "
          f"PSNR={psnr:.1f} dB", flush=True)


if __name__ == "__main__":
    main()
