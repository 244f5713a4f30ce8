"""End-to-end frame-time sweep over the opt-in perf tiers at the headline
workload: expand_impl x payload x span_mode x scan_impl x blend_math.
Prints a ranked
table; the winner becomes the default config.

Each config runs in its OWN subprocess: the axon runtime raises
InvalidArgument when re-executing a program after another sizable
executable ran in-process (tools/tpu_smoke.py docstring), which killed
the first in-process version of this sweep after one config.

Usage: python tools/tier_compare.py [N] [W] [H]
       python tools/tier_compare.py --quick   (pallas/fused x f32/compact
                                               x f32/bf16 math, logmm only)
       python tools/tier_compare.py --one expand payload span scan math [N W H]
"""

from __future__ import annotations

import functools
import itertools
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMG_DIR = "/tmp/gsrt_tier_imgs"


def run_one(expand: str, payload: str, span: str, scan: str,
            math: str, N: int, W: int, H: int) -> None:
    import jax
    import numpy as np

    from gsrt.core.config import RenderConfig
    from gsrt.models.gaussian_rt import (GaussianRayTracer, fm_from_cloud,
                                         render_tiled)
    from gsrt.scene.catalog import random_cloud

    cloud, camera = random_cloud(N, seed=0, width=W, height=H,
                                 scale_range=(0.004, 0.03))
    fm = jax.block_until_ready(fm_from_cloud(cloud))

    # optional sweep axes beyond the 5 positional tiers
    extra = {}
    if os.environ.get("GSRT_PAIR_CHUNK"):
        extra["pair_chunk"] = int(os.environ["GSRT_PAIR_CHUNK"])
    if os.environ.get("GSRT_TILE"):
        tw, th = os.environ["GSRT_TILE"].split("x")
        extra["tile_w"], extra["tile_h"] = int(tw), int(th)
    if os.environ.get("GSRT_STREAM"):
        extra["stream"] = os.environ["GSRT_STREAM"]
    cfg = RenderConfig(width=W, height=H, conic_mode="standard",
                       expand_impl=expand, payload=payload,
                       span_mode=span, scan_impl=scan, blend_math=math,
                       **extra)
    tracer = GaussianRayTracer(cfg, "tiled")
    mp = tracer.calibrate(cloud, camera)
    render = functools.partial(render_tiled, cfg=cfg, max_pairs=mp,
                               max_rows=tracer.max_rows)

    @jax.jit
    def step(fm, camera):
        out = render(fm, camera)
        return out.trans.sum() + out.color.sum()

    @jax.jit
    def frame(fm, camera):
        return render(fm, camera).color

    float(step(fm, camera))
    img = np.asarray(frame(fm, camera))
    os.makedirs(IMG_DIR, exist_ok=True)
    np.save(os.path.join(
        IMG_DIR, f"{expand}-{payload}-{span}-{scan}-{math}.npy"),
            img[:: max(1, H // 128), :: max(1, W // 128)])

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
    # parsed by the parent: RESULT dt_ms mp
    print(f"RESULT {dt * 1e3:.3f} {mp}", flush=True)


def main() -> None:
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        expand, payload, span, scan, math = sys.argv[i + 1:i + 6]
        rest = [int(a) for a in sys.argv[i + 6:i + 9]]
        N, W, H = (rest + [1_000_000, 1920, 1080][len(rest):])[:3]
        run_one(expand, payload, span, scan, math, N, W, H)
        return

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    quick = "--quick" in sys.argv
    N = int(args[0]) if len(args) > 0 else 1_000_000
    W = int(args[1]) if len(args) > 1 else 1920
    H = int(args[2]) if len(args) > 2 else 1080

    import numpy as np

    grid = list(itertools.product(
        ["pallas", "fused"],
        ["f32", "compact"],
        ["rect"] if quick else ["rect", "ellipse"],
        ["logmm"] if quick else ["roll", "logmm"],
        ["f32", "bf16"]))

    ref_img = None
    rows = []
    for expand, payload, span, scan, math in grid:
        name = f"{expand}/{payload}/{span}/{scan}/{math}"
        cmd = [sys.executable, os.path.abspath(__file__), "--one",
               expand, payload, span, scan, math, str(N), str(W), str(H)]
        try:
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=1500)
        except subprocess.TimeoutExpired as e:
            print(f"{name:28s}: TIMEOUT", flush=True)
            out = e.stderr or e.stdout or b""
            if isinstance(out, bytes):
                out = out.decode(errors="replace")
            for l in out.strip().splitlines()[-6:]:
                print(f"    {l}", flush=True)
            continue
        result = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
        if p.returncode != 0 or not result:
            tail = (p.stderr or p.stdout).strip().splitlines()[-6:]
            print(f"{name:28s}: FAILED rc={p.returncode}", flush=True)
            for l in tail:
                print(f"    {l}", flush=True)
            continue
        dt_ms, mp = result[-1].split()[1:3]
        dt = float(dt_ms) / 1e3
        img = np.load(os.path.join(
            IMG_DIR, f"{expand}-{payload}-{span}-{scan}-{math}.npy"))
        if ref_img is None:
            ref_img = img
        err = float(np.abs(img - ref_img).max())
        rows.append((dt, name, int(mp), err))
        print(f"{name:28s}: {dt * 1e3:7.2f} ms/frame "
              f"({W * H / dt / 1e6:6.1f} Mrays/s)  mp={mp} "
              f"maxerr={err:.1e}", flush=True)

    rows.sort()
    print("\n=== ranked ===")
    for dt, name, mp, err in rows:
        print(f"{dt * 1e3:8.2f} ms  {name}  (maxerr {err:.1e})")


if __name__ == "__main__":
    main()
