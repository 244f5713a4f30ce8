"""Headline benchmark: Mrays/s/chip for the flagship tiled 3DGS renderer.

Workload: 1M-splat synthetic Gaussian cloud at 1920x1080, SH degree 3,
depth-sorted front-to-back blend through the full pipeline
(projection → tile binning → Pallas blend kernel). The Mip-NeRF360 garden
.ply itself is not available in this zero-egress environment, so the cloud
is synthesized at comparable splat count and screen-footprint statistics
(~4-8 px median radius, ~100 blended splats per pixel).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 100 Mrays/s (the BASELINE.json north-star target).

Timing note: sync via a jitted scalar reduction fetched to host —
jax.block_until_ready() is a no-op through the axon TPU tunnel.
"""

from __future__ import annotations

import functools
import json
import os
import subprocess
import sys
import time


def _tpu_reachable(timeout_s: int = 120) -> bool:
    """Probe the axon tunnel in a SUBPROCESS: when the tunnel is down, jax
    device init hangs indefinitely (retry loop), which would hang this
    whole benchmark — observed during the round-2 outage."""
    try:
        # DEVNULL, not capture_output: a hung probe can leave an orphaned
        # tunnel helper holding the pipe, and run() would block draining
        # it even after killing the child (observed deadlock)
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.default_backend() == 'tpu'"],
            timeout=timeout_s, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    # The driver environment exports JAX_PLATFORMS=axon, so an unreachable
    # tunnel would hang this process inside backend init. Probe first in a
    # killable subprocess; only an explicit cpu/host setting skips it.
    want = os.environ.get("JAX_PLATFORMS") or "axon"
    if ("axon" in want or "tpu" in want) and not _tpu_reachable():
        # fall back to CPU so the run records a (clearly-labeled) result
        # instead of hanging the driver
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from gsrt.core.config import RenderConfig
    from gsrt.models.gaussian_rt import render_fast, render_tiled
    from gsrt.scene.catalog import random_cloud

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        W, H, N = 1920, 1080, 1_000_000
    else:  # CPU fallback so the script still runs without a TPU
        W, H, N = 256, 128, 20_000
    cfg = RenderConfig(width=W, height=H, conic_mode="standard")
    cloud, camera = random_cloud(N, seed=0, width=W, height=H,
                                 scale_range=(0.004, 0.03))

    if on_tpu:
        from gsrt.models.gaussian_rt import GaussianRayTracer, fm_from_cloud
        tracer = GaussianRayTracer(cfg, "tiled")
        mp = tracer.calibrate(cloud, camera)
        # max_rows sizes the group-stream unit buffer (falls back to a
        # fat max_pairs-sized buffer if omitted — ~13 ms/frame of waste)
        render = functools.partial(render_tiled, cfg=cfg, max_pairs=mp,
                                   max_rows=tracer.max_rows)
        # one-time feature-major relayout (scene-build cost, not frame cost)
        cloud = jax.block_until_ready(fm_from_cloud(cloud))
    else:
        render = functools.partial(render_fast, cfg=cfg)

    @jax.jit
    def step(cloud, camera):
        out = render(cloud, camera)
        # scalar checksum: forces the full pipeline, syncs via 4-byte fetch
        return out.trans.sum() + out.color.sum()

    checksum = float(step(cloud, camera))  # compile + first run
    assert checksum == checksum, "NaN checksum"

    # Pipelined throughput: queue K frames, sync once. The axon tunnel has
    # a ~30 ms dispatch round-trip that is NOT device time and fully
    # overlaps across queued launches (measured: 20 independent launches
    # complete in one round-trip). Per-frame sync would tax every frame
    # with host latency the way no real render/serve loop does.
    K = 10
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = None
        for _ in range(K):
            r = step(cloud, camera)
        float(r)
        times.append((time.perf_counter() - t0) / K)
    dt = min(times)

    rays = W * H  # primary rays per frame (1 spp) — the reference's Mrays/s
    # definition: W·H·spp / frame time (RayTracer.cpp:180-183)
    mrays = rays / dt / 1e6
    metric = "Mrays/s/chip (1M-splat 3DGS @1080p, tiled Pallas)"
    if not on_tpu:
        metric = ("Mrays/s CPU-FALLBACK (TPU tunnel unreachable; "
                  "small render_fast workload — not the headline)")
    print(json.dumps({
        "metric": metric,
        "value": round(mrays, 4),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
