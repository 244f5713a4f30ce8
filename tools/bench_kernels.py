"""Compare blend kernels / tile shapes end-to-end on the real TPU chip."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gsrt.core.config import RenderConfig
from gsrt.models.gaussian_rt import GaussianRayTracer, render_tiled
from gsrt.scene.catalog import random_cloud


def timeit(fn, *args, n=8):
    r = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0].ravel()[:1]))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(r)[0].ravel()[:1]))
        best = min(best, time.perf_counter() - t0)
    return best


W, H, N = 1920, 1080, 1_000_000
cloud, camera = random_cloud(N, seed=0, width=W, height=H,
                             scale_range=(0.004, 0.03))

shapes = [(128, 8, 384), (16, 16, 128), (16, 16, 256), (32, 8, 128),
          (32, 16, 128)]
if len(sys.argv) > 1:
    picks = [int(x) for x in sys.argv[1].split(",")]
    shapes = [shapes[i] for i in picks]

ref = None
for tw, th, pc in shapes:
    cfg = RenderConfig(width=W, height=H, conic_mode="standard",
                       tile_w=tw, tile_h=th, pair_chunk=pc)
    try:
        mp = GaussianRayTracer(cfg, "tiled").calibrate(cloud, camera)
        fn = jax.jit(functools.partial(render_tiled, cfg=cfg, max_pairs=mp))
        dt = timeit(fn, cloud, camera)
        out = fn(cloud, camera)
        t = np.asarray(out.trans)
        line = (f"tile {tw}x{th} chunk {pc}: {dt*1e3:6.1f} ms  "
                f"{W*H/dt/1e6:6.2f} Mrays/s  mp={mp/1e6:.1f}M")
        if ref is None:
            ref = t
        else:
            line += f"  max|Δtrans|={np.abs(t-ref).max():.2e}"
        print(line, flush=True)
    except Exception as e:
        print(f"tile {tw}x{th} chunk {pc}: FAIL {str(e)[:200]}", flush=True)
