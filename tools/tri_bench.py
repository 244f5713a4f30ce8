"""A/B the triangle primary-ray paths on TPU: packed-cluster block
traversal vs screen-tile binned cast (rect and exact spans), pipelined
timing at real resolutions.

Each (scene, impl) measurement runs in its own subprocess — the axon
runtime raises InvalidArgument on re-executing a program after another
sizable executable ran in-process (tools/tpu_smoke.py docstring).

Usage:
  python tools/tri_bench.py                      # reference scenes @128x128
  python tools/tri_bench.py --scene bigtris --width 1920 --height 1080
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IMPLS = ("block", "rect", "exact")


def timeit(fn, *args, n=8):
    import jax
    sync = jax.jit(lambda r: jax.tree_util.tree_leaves(r)[0].ravel()[:1].sum())
    float(sync(fn(*args)))
    t0 = time.perf_counter()
    r = None
    for _ in range(n):
        r = fn(*args)
    float(sync(r))
    return (time.perf_counter() - t0) / n


def load_scene(args):
    import jax.numpy as jnp
    from gsrt.core.types import look_at, make_camera
    if args.scene == "bigtris":
        rng = np.random.default_rng(0)
        c = rng.uniform(-2, 2, (20000, 3)).astype(np.float32)
        a = c + rng.normal(0, 1.0, c.shape).astype(np.float32)
        b = c + rng.normal(0, 1.0, c.shape).astype(np.float32)
        cam = make_camera(look_at((0, 0, -7.0), (0, 0, 0.0)),
                          55.0, args.width, args.height)
        return (jnp.asarray(c), jnp.asarray(a), jnp.asarray(b)), cam
    from gsrt.scene.reference_scenes import REFERENCE_SCENES
    sc, cam, _ = REFERENCE_SCENES[args.scene](args.width, args.height,
                                              max_files=args.max_files)
    return (sc.tri_v0, sc.tri_v1, sc.tri_v2), cam


def run_one(args) -> None:
    import jax
    import jax.numpy as jnp
    from gsrt.core.config import RenderConfig
    from gsrt.models.path_tracer import generate_camera_rays
    from gsrt.ops.tri_binning import (build_tri_binning, cast_primary,
                                      count_tri_pairs_numpy)

    W, H = args.width, args.height
    cfg = RenderConfig(width=W, height=H)
    (v0, v1, v2), camera = load_scene(args)
    n_tris = int(v0.shape[0])
    orig, dirn = generate_camera_rays(jax.random.PRNGKey(0), camera, cfg)
    dirn = jax.block_until_ready(dirn)

    if args.impl == "block":
        from gsrt.ops.tri_kernel import build_tri_table, closest_hit_packed
        tt = build_tri_table(v0, v1, v2, jnp.zeros((n_tris,), jnp.int32))

        @jax.jit
        def run(o, d):
            t, *_ = closest_hit_packed(tt, o, d, 1e-3, 1e4)
            return t

        ms = timeit(run, orig, dirn) * 1e3
        print(f"RESULT {ms:.3f} {n_tris} 0", flush=True)
        return

    exact = args.impl == "exact"
    need = count_tri_pairs_numpy(v0, v1, v2, camera, tile_w=args.tile_w,
                                 tile_h=args.tile_h, span_exact=exact)
    mp = int(need * 1.2) + 1024

    @jax.jit
    def run(d):
        binning = build_tri_binning(
            v0, v1, v2, camera, tile_w=args.tile_w,
            tile_h=args.tile_h, max_pairs=mp, span_exact=exact)
        t, _ = cast_primary(binning, d, camera.position,
                            width=W, height=H, tile_w=args.tile_w,
                            tile_h=args.tile_h)
        return t

    ms = timeit(run, dirn) * 1e3
    print(f"RESULT {ms:.3f} {n_tris} {need}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="reference",
                    help="'reference' (lumibench datasets), 'bigtris', "
                         "or a named reference scene")
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--tile-w", type=int, default=16)
    ap.add_argument("--tile-h", type=int, default=8)
    ap.add_argument("--max-files", type=int, default=None)
    ap.add_argument("--impl", default=None, choices=IMPLS,
                    help="(internal) run ONE measurement in-process")
    args = ap.parse_args()

    if args.impl is not None:
        run_one(args)
        return

    if args.scene == "reference":
        from gsrt.scene.reference_scenes import (REFERENCE_SCENES,
                                                 reference_data_available)
        assert reference_data_available()
        names = list(REFERENCE_SCENES)
    else:
        names = [args.scene]

    base = [sys.executable, os.path.abspath(__file__),
            "--width", str(args.width), "--height", str(args.height),
            "--tile-w", str(args.tile_w), "--tile-h", str(args.tile_h)]
    if args.max_files is not None:
        base += ["--max-files", str(args.max_files)]

    for name in names:
        for impl in IMPLS:
            cmd = base + ["--scene", name, "--impl", impl]
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=1800)
            result = [l for l in p.stdout.splitlines()
                      if l.startswith("RESULT ")]
            if p.returncode != 0 or not result:
                tail = (p.stderr or p.stdout).strip().splitlines()[-5:]
                print(f"{name:16s} {impl:6s}: FAILED rc={p.returncode}",
                      flush=True)
                for l in tail:
                    print(f"    {l}", flush=True)
                continue
            ms, n_tris, extra = result[-1].split()[1:4]
            note = f"pairs~{extra}" if impl != "block" else ""
            print(f"{name:16s} tris={int(n_tris):8d}  {impl:6s}: "
                  f"{float(ms):8.2f} ms  {note}", flush=True)


if __name__ == "__main__":
    main()
