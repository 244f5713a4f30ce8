"""Compare rect vs ellipse pair spans end-to-end on the headline workload
(1M splats, 1920x1080, tiled packed blend): pipelined frame time per span
mode with per-mode calibrated buffers, plus image agreement.

Each mode runs in its own subprocess (the axon runtime raises
InvalidArgument on re-executing after another sizable executable ran
in-process — tools/tpu_smoke.py docstring).

Usage: python tools/span_compare.py [N] [W] [H] [scale_lo scale_hi]
"""

from __future__ import annotations

import functools
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMG_DIR = "/tmp/gsrt_span_imgs"


def run_one(span: str, N: int, W: int, H: int, sr) -> None:
    import jax
    import numpy as np

    from gsrt.core.config import RenderConfig
    from gsrt.models.gaussian_rt import (GaussianRayTracer, fm_from_cloud,
                                         render_tiled)
    from gsrt.scene.catalog import random_cloud

    cloud, camera = random_cloud(N, seed=0, width=W, height=H,
                                 scale_range=sr)
    fm = jax.block_until_ready(fm_from_cloud(cloud))

    cfg = RenderConfig(width=W, height=H, conic_mode="standard",
                       span_mode=span)
    tracer = GaussianRayTracer(cfg, "tiled")
    mp = tracer.calibrate(cloud, camera)
    mr = tracer.max_rows
    render = functools.partial(render_tiled, cfg=cfg, max_pairs=mp,
                               max_rows=mr)

    @jax.jit
    def step(fm, camera):
        out = render(fm, camera)
        return out.trans.sum() + out.color.sum()

    @jax.jit
    def frame(fm, camera):
        return render(fm, camera).color

    float(step(fm, camera))  # compile + warm
    os.makedirs(IMG_DIR, exist_ok=True)
    np.save(os.path.join(IMG_DIR, f"{span}.npy"),
            np.asarray(frame(fm, camera)))
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
    print(f"RESULT {dt * 1e3:.3f} {mp} {mr or 0}", flush=True)


def main() -> None:
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        span = sys.argv[i + 1]
        N, W, H = (int(a) for a in sys.argv[i + 2:i + 5])
        sr = ((float(sys.argv[i + 5]), float(sys.argv[i + 6]))
              if len(sys.argv) > i + 6 else (0.004, 0.03))
        run_one(span, N, W, H, sr)
        return

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
    sr = ((sys.argv[4], sys.argv[5]) if len(sys.argv) > 5
          else ("0.004", "0.03"))

    import numpy as np

    for span in ("rect", "ellipse"):
        cmd = [sys.executable, os.path.abspath(__file__), "--one", span,
               str(N), str(W), str(H), sr[0], sr[1]]
        p = subprocess.run(cmd, capture_output=True, text=True, timeout=900)
        result = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
        if p.returncode != 0 or not result:
            tail = (p.stderr or p.stdout).strip().splitlines()[-6:]
            print(f"{span:8s}: FAILED rc={p.returncode}", flush=True)
            for l in tail:
                print(f"    {l}", flush=True)
            continue
        dt_ms, mp, mr = result[-1].split()[1:4]
        dt = float(dt_ms) / 1e3
        print(f"{span:8s}: {dt * 1e3:7.2f} ms/frame "
              f"({W * H / dt / 1e6:6.1f} Mrays/s)  max_pairs={mp}"
              + (f" max_rows={mr}" if mr != "0" else ""), flush=True)

    try:
        a = np.load(os.path.join(IMG_DIR, "rect.npy"))
        b = np.load(os.path.join(IMG_DIR, "ellipse.npy"))
        err = np.abs(b - a)
        print(f"ellipse vs rect: max={err.max():.2e} mean={err.mean():.2e}",
              flush=True)
    except FileNotFoundError:
        pass


if __name__ == "__main__":
    main()
