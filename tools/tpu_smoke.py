"""On-hardware TPU checks: parity + perf, each in an isolated subprocess.

The CPU test suite cannot catch TPU-only failure modes (this round found
two: f32 denormal flushing corrupting bit-packed payloads, and an axon
runtime bug where re-executing a program after another sizable executable
fails with InvalidArgument). Run this on a real chip:

    python tools/tpu_smoke.py

Each check runs in its own process because of the executable-interference
bug — that isolation is itself part of the contract being tested.
"""

from __future__ import annotations

import subprocess
import sys

CHECKS = {
    "tiled_parity": """
import numpy as np, jax.numpy as jnp
from gsrt import RenderConfig
from gsrt.models import GaussianRayTracer
from gsrt.models.gaussian_rt import render_fast
from gsrt.scene import random_cloud
cloud, camera = random_cloud(300, seed=3, width=64, height=48)
# f32: the bit-parity tier (validates split-bf16 MXU numerics on real HW)
cfg = RenderConfig(width=64, height=48, conic_mode="standard",
                   payload="f32")
a = render_fast(cloud, camera, cfg)
b = GaussianRayTracer(cfg, "tiled")(cloud, camera)
d = float(np.abs(np.asarray(a.trans) - np.asarray(b.trans)).max())
dc = float(np.abs(np.asarray(a.color) - np.asarray(b.color)).max())
assert d < 5e-4, f"trans parity {d}"
assert dc < 1e-3, f"color parity {dc}"
# the DEFAULT config is the compact+logmm fast tier. Per-word error is
# 8-bit quantization (color fine tier <= 1/254, opacity <= 1/510), but
# alpha-compositing ACCUMULATES the opacity steps across overlapping
# splats: measured max on this scene 1.09e-2 color / 5.2e-3 trans,
# bit-identical CPU(interpret) vs TPU (checked 2026-08-19 — the error is
# quantization, not denormal flushing). Bound = measured * ~1.4 slack.
cfg2 = RenderConfig(width=64, height=48, conic_mode="standard")
c = GaussianRayTracer(cfg2, "tiled")(cloud, camera)
d2 = float(np.abs(np.asarray(a.trans) - np.asarray(c.trans)).max())
dc2 = float(np.abs(np.asarray(a.color) - np.asarray(c.color)).max())
assert d2 < 8e-3, f"compact-tier trans parity {d2}"
assert dc2 < 1.5e-2, f"compact-tier color parity {dc2}"
print(f"OK trans_err={d:.2e} color_err={dc:.2e} "
      f"compact_err={max(d2, dc2):.2e}")
""",
    "repeat_execution": """
import functools, jax
from gsrt import RenderConfig
from gsrt.models.gaussian_rt import render_tiled, GaussianRayTracer
from gsrt.scene import random_cloud
cloud, camera = random_cloud(50_000, seed=0, width=512, height=256)
cfg = RenderConfig(width=512, height=256, conic_mode="standard")
rt = GaussianRayTracer(cfg, "tiled")
for i in range(4):
    out = rt(cloud, camera)
    s = float(out.trans.sum())
print(f"OK 4 repeats, checksum {s:.1f}")
""",
    "perf_1080p": """
import functools, time, jax
from gsrt import RenderConfig
from gsrt.models.gaussian_rt import render_tiled, GaussianRayTracer
from gsrt.scene import random_cloud
W, H, N = 1920, 1080, 1_000_000
cfg = RenderConfig(width=W, height=H, conic_mode="standard")
cloud, camera = random_cloud(N, seed=0, width=W, height=H,
                             scale_range=(0.004, 0.03))
mp = GaussianRayTracer(cfg, "tiled").calibrate(cloud, camera)
from gsrt.models.gaussian_rt import fm_from_cloud
fmc = fm_from_cloud(cloud)
@jax.jit
def step(cl, cam):
    o = render_tiled(cl, cam, cfg, max_pairs=mp)
    return o.trans.sum() + o.color.sum()
float(step(fmc, camera))
# pipelined: queue K frames, sync once (the axon tunnel's ~30 ms dispatch
# round-trip is host latency, not device time — it overlaps across queued
# launches)
K = 8
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(K):
        r = step(fmc, camera)
    float(r)
    ts.append((time.perf_counter() - t0) / K)
dt = min(ts)
print(f"OK {dt*1e3:.1f} ms/frame  {W*H/dt/1e6:.2f} Mrays/s")
""",
}


def main() -> int:
    failed = []
    for name, code in CHECKS.items():
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=1800)
        lines = [ln for ln in r.stdout.splitlines() if not
                 ln.startswith("WARNING")]
        status = lines[-1] if lines and r.returncode == 0 else "FAILED"
        print(f"{name}: {status}")
        if r.returncode != 0:
            failed.append(name)
            print(r.stderr.strip().splitlines()[-1] if r.stderr else "")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
