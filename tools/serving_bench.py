"""On-hardware serving/orbit benchmark (VERDICT round-2 item 6).

Workload: the reference's interactive orbit (ModelViewController.cpp
orbit state, rendered every frame from scratch by the Application render
loop) — here a 1M-splat cloud at 1080p swept through an orbit path, with
and without the temporal-reuse serving path (gsrt/serving.py).

Reports ms/frame cold (fresh render_tiled per frame, what the reference
does), ms/frame served (cutoff-culled, pipelined), pair counts, and the
violation / re-render rate. Appends a JSON row to docs/serving_bench.json
when --out is given.

    python tools/serving_bench.py --splats 1000000 --frames 48
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# honor JAX_PLATFORMS even when a site plugin (axon TPU) prepends itself
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from gsrt.core.config import RenderConfig
from gsrt.models.gaussian_rt import GaussianRayTracer
from gsrt.scene.campath import orbit_path
from gsrt.scene.catalog import random_cloud
from gsrt.serving import ServingRenderer


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--splats", type=int, default=1_000_000)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--degrees", type=float, default=60.0,
                    help="orbit arc swept over the frames (smaller = more "
                         "frame coherence, the serving regime)")
    ap.add_argument("--radius", type=float, default=10.0)
    ap.add_argument("--strict", action="store_true",
                    help="re-render violated frames uncull-ed")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--interpret", action="store_true",
                    help="interpret-mode kernels (CPU smoke of the tool)")
    args = ap.parse_args()

    cfg = RenderConfig(width=args.width, height=args.height,
                       conic_mode="standard")
    # headline footprint statistics (bench.py's cloud): without the
    # scale_range the default splat scales at extent 4.0 inflate to
    # ~50M pairs/frame — a different workload than the 1080p headline
    cloud, _ = random_cloud(args.splats, seed=0, extent=4.0,
                            width=args.width, height=args.height,
                            scale_range=(0.004, 0.03))
    path = orbit_path((0, 0, 6.0), args.radius, args.frames,
                      height=2.0, width=args.width, height_px=args.height,
                      degrees=args.degrees, start_deg=200.0)

    # --- cold baseline: fresh full render every frame (reference loop);
    # defer_overflow pipelines the per-frame overflow check (a sync scalar
    # fetch costs a ~30 ms tunnel round-trip per frame) ---
    rt = GaussianRayTracer(cfg, "tiled", interpret=args.interpret,
                           defer_overflow=4)
    out = rt(cloud, path[0])                      # calibrate + compile
    jax.block_until_ready(out.trans)
    t0 = time.perf_counter()
    outs = [rt(cloud, cam) for cam in path]       # queued, overlapping
    jax.block_until_ready(outs[-1].trans)
    cold_ms = (time.perf_counter() - t0) / len(path) * 1e3

    # --- served: temporal cutoff culling ---
    srv = ServingRenderer(cfg, strict=args.strict,
                          interpret=args.interpret)
    srv(cloud, path[0])                           # compile + warm cutoffs
    srv.finish()
    srv.reset()
    t0 = time.perf_counter()
    souts = [srv(cloud, cam) for cam in path]
    jax.block_until_ready(souts[-1].trans)
    srv.finish()
    served_ms = (time.perf_counter() - t0) / len(path) * 1e3

    st = srv.stats[-len(path):]
    viol = sum(s.get("violations", 0) > 0 for s in st)
    rerender = sum(s.get("full_renders", 0) for s in st)
    pairs = [s.get("pairs") for s in st if s.get("pairs") is not None]
    row = {
        "workload": "orbit_serving",
        "splats": args.splats, "width": args.width, "height": args.height,
        "frames": args.frames, "degrees": args.degrees,
        "strict": bool(args.strict),
        "cold_ms_per_frame": round(cold_ms, 2),
        "served_ms_per_frame": round(served_ms, 2),
        "speedup": round(cold_ms / served_ms, 3),
        "violation_frames": viol,
        "full_rerenders": rerender,
        "pairs_first": pairs[0] if pairs else None,
        "pairs_last": pairs[-1] if pairs else None,
        "backend": jax.default_backend(),
    }
    print(json.dumps(row))
    if args.out:
        try:
            rows = json.load(open(args.out))
        except (FileNotFoundError, json.JSONDecodeError):
            rows = []
        rows.append(row)
        json.dump(rows, open(args.out, "w"), indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
