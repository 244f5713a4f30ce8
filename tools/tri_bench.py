"""A/B the triangle primary-ray paths on TPU: packed-cluster block
traversal vs screen-tile binned cast (rect and exact spans), pipelined
timing at real resolutions.

Usage:
  python tools/tri_bench.py                      # reference scenes @128x128
  python tools/tri_bench.py --scene bigtris --width 1920 --height 1080
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def timeit(fn, *args, n=8):
    sync = jax.jit(lambda r: jax.tree_util.tree_leaves(r)[0].ravel()[:1].sum())
    float(sync(fn(*args)))
    t0 = time.perf_counter()
    r = None
    for _ in range(n):
        r = fn(*args)
    float(sync(r))
    return (time.perf_counter() - t0) / n


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
    args = ap.parse_args()

    import jax.numpy as jnp
    from gsrt.core.config import RenderConfig
    from gsrt.core.types import look_at, make_camera
    from gsrt.models.path_tracer import (generate_camera_rays,
                                         with_tri_table)
    from gsrt.ops.tri_binning import (build_tri_binning, cast_primary,
                                      count_tri_pairs_numpy)
    from gsrt.ops.tri_kernel import closest_hit_packed

    W, H = args.width, args.height
    cfg = RenderConfig(width=W, height=H)

    def scene_list():
        if args.scene == "bigtris":
            rng = np.random.default_rng(0)
            c = rng.uniform(-2, 2, (20000, 3)).astype(np.float32)
            a = c + rng.normal(0, 1.0, c.shape).astype(np.float32)
            b = c + rng.normal(0, 1.0, c.shape).astype(np.float32)
            cam = make_camera(look_at((0, 0, -7.0), (0, 0, 0.0)),
                              55.0, W, H)
            yield "bigtris", (jnp.asarray(c), jnp.asarray(a),
                              jnp.asarray(b)), cam
            return
        from gsrt.scene.reference_scenes import (REFERENCE_SCENES,
                                                 reference_data_available)
        assert reference_data_available()
        names = ([args.scene] if args.scene in REFERENCE_SCENES
                 else list(REFERENCE_SCENES))
        for name in names:
            sc, cam, _ = REFERENCE_SCENES[name](W, H,
                                                max_files=args.max_files)
            if sc.tri_v0.shape[0] < 8:
                continue
            yield name, (sc.tri_v0, sc.tri_v1, sc.tri_v2), cam

    for name, (v0, v1, v2), camera in scene_list():
        n_tris = int(v0.shape[0])
        orig, dirn = generate_camera_rays(jax.random.PRNGKey(0), camera,
                                          cfg)
        dirn = jax.block_until_ready(dirn)

        # block traversal (build outside timing, like a BLAS)
        from gsrt.ops.tri_kernel import build_tri_table
        tt = build_tri_table(v0, v1, v2, jnp.zeros((n_tris,), jnp.int32))

        @jax.jit
        def block(o, d):
            t, *_ = closest_hit_packed(tt, o, d, 1e-3, 1e4)
            return t

        ms_block = timeit(block, orig, dirn) * 1e3
        print(f"{name:16s} tris={n_tris:8d}  block: {ms_block:8.2f} ms",
              flush=True)

        for exact in (False, True):
            need = count_tri_pairs_numpy(v0, v1, v2, camera,
                                         tile_w=args.tile_w,
                                         tile_h=args.tile_h)
            mp = int(need * 1.2) + 1024

            @jax.jit
            def binned(d, exact=exact, mp=mp):
                binning = build_tri_binning(
                    v0, v1, v2, camera, tile_w=args.tile_w,
                    tile_h=args.tile_h, max_pairs=mp, span_exact=exact)
                t, _ = cast_primary(binning, d, camera.position,
                                    width=W, height=H, tile_w=args.tile_w,
                                    tile_h=args.tile_h)
                return t

            ms = timeit(binned, dirn) * 1e3
            tag = "exact" if exact else "rect "
            print(f"{'':16s} {'':14s}  binned/{tag}: {ms:8.2f} ms "
                  f"(pairs~{need})", flush=True)


if __name__ == "__main__":
    main()
