"""End-to-end fit benchmark at the BASELINE.json training config.

Closes the loop "gsrt can produce the .ply the reference consumes" with
numbers: synthesize a posed capture from a known Gaussian cloud, write it
in the exact COLMAP layout `cli fit` consumes (sparse/0 text model +
images/, gsrt.scene.colmap.write_text_model), fit through adaptive
densification (gsrt.models.multiview.fit_views — the INRIA schedule
shape), and record holdout PSNR + steady-state step time as a JSON row.

BASELINE.md config: "~100K-splat ray-traced 3DGS with k=16 and SH-3
color" — the fit densifies from SfM-point init toward --max-gaussians,
and the step-time probe re-times the jitted train step at the final
splat count (compile excluded).

    python tools/fit_bench.py --iters 2000 --out docs/fit_bench.json
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# honor JAX_PLATFORMS even when a site plugin (axon TPU) prepends itself
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np


def synthesize_capture(root: str, *, n_gt: int, n_views: int,
                       width: int, height: int, seed: int = 0):
    """Ground-truth cloud -> orbit renders -> COLMAP text capture."""
    from gsrt.core.config import RenderConfig
    from gsrt.core.types import look_at, make_camera
    from gsrt.models.gaussian_rt import render_fast
    from gsrt.scene.catalog import random_cloud
    from gsrt.scene.colmap import (ColmapCamera, ColmapImage, ColmapModel,
                                   write_text_model)
    from gsrt.utils.image import save_png

    extent = 2.5
    cloud, _ = random_cloud(n_gt, seed=seed, extent=extent,
                            scale_range=(0.04, 0.18),
                            width=width, height=height)
    center = np.asarray(cloud.means).mean(0)
    radius = float(np.abs(np.asarray(cloud.means) - center).max()) * 2.2

    cfg = RenderConfig(width=width, height=height, conic_mode="standard")
    rng = np.random.default_rng(seed + 1)
    cams, images = [], []
    imdir = os.path.join(root, "images")
    os.makedirs(imdir, exist_ok=True)
    render = jax.jit(lambda c: render_fast(cloud, c, cfg).color)
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        # two elevation rings so the fit sees parallax in y
        h = radius * (0.25 if i % 2 else -0.1)
        eye = center + np.array([radius * np.cos(ang), h,
                                 radius * np.sin(ang)])
        view = look_at(eye, center).astype(np.float32)
        cam = make_camera(view, 50.0, width, height)
        cams.append(cam)
        name = f"im_{i:03d}.png"
        save_png(os.path.join(imdir, name), np.asarray(render(cam)))
        images.append(ColmapImage(name=name, camera_id=1, view=view))

    # SfM points: noisy subsample of the GT means, DC-term colors —
    # what a real SfM front-end would hand the trainer
    means = np.asarray(cloud.means)
    sh0 = np.asarray(cloud.sh[:, 0, :])
    pick = rng.choice(n_gt, size=min(5000, n_gt), replace=False)
    pts = means[pick] + rng.normal(0, 0.01 * extent, (len(pick), 3))
    cols = np.clip(sh0[pick] * 0.2820948 + 0.5, 0, 1)
    c0 = cams[0]
    model = ColmapModel(
        cameras={1: ColmapCamera("PINHOLE", width, height,
                                 float(c0.fx), float(c0.fy),
                                 width / 2.0, height / 2.0)},
        images=images, points=pts.astype(np.float32),
        colors=cols.astype(np.float32))
    write_text_model(os.path.join(root, "sparse", "0"), model)
    return extent


STATE = "fit_state.npz"


def _save_state(path, params, opt_state, stats, it):
    leaves_p = jax.tree_util.tree_leaves(params)
    leaves_o = jax.tree_util.tree_leaves(opt_state)
    leaves_s = jax.tree_util.tree_leaves(stats)
    np.savez(path, it=it,
             **{f"p{i}": np.asarray(x) for i, x in enumerate(leaves_p)},
             **{f"o{i}": np.asarray(x) for i, x in enumerate(leaves_o)},
             **{f"s{i}": np.asarray(x) for i, x in enumerate(leaves_s)})


def _load_state(path, params0, optimizer):
    """Rebuild (params, opt_state, stats, it) from the npz: the treedefs
    come from freshly-built templates of the SAME code, the leaves from
    disk (leaf order is deterministic for a fixed structure)."""
    from gsrt.models.densify import init_stats
    z = np.load(path)
    n = z["p0"].shape[0]
    pt = jax.tree_util.tree_structure(params0)
    params = jax.tree_util.tree_unflatten(
        pt, [z[f"p{i}"] for i in range(len(
            jax.tree_util.tree_leaves(params0)))])
    tmpl_o = optimizer.init(params)
    ot = jax.tree_util.tree_structure(tmpl_o)
    opt_state = jax.tree_util.tree_unflatten(
        ot, [z[f"o{i}"] for i in range(len(
            jax.tree_util.tree_leaves(tmpl_o)))])
    tmpl_s = init_stats(n)
    st = jax.tree_util.tree_structure(tmpl_s)
    stats = jax.tree_util.tree_unflatten(
        st, [z[f"s{i}"] for i in range(len(
            jax.tree_util.tree_leaves(tmpl_s)))])
    return params, opt_state, stats, int(z["it"])


def run_segment(args, mp) -> int:
    """One subprocess unit of the fit: either a densify-bounded run of
    train steps (--segment) or the holdout-PSNR eval (--eval-state)."""
    import jax.numpy as jnp

    from gsrt.core.config import RenderConfig
    from gsrt.models.densify import densify_and_prune, init_stats, \
        reset_opacity
    from gsrt.models.multiview import (eval_psnr, holdout_split,
                                       make_train_step_mv,
                                       viewset_from_colmap)
    from gsrt.models.trainer import make_optimizer

    vs, params0, extent = viewset_from_colmap(
        args.dir, os.path.join(args.dir, "images"))
    cfg = RenderConfig(width=vs.width, height=vs.height,
                       conic_mode="standard")
    optimizer = make_optimizer(lr_means=1.6e-4 * extent)
    spath = os.path.join(args.dir, STATE)
    train_idx, test_idx = holdout_split(vs.n_views, args.holdout)
    if os.path.exists(spath):
        params, opt_state, stats, it = _load_state(spath, params0,
                                                   optimizer)
    else:
        params, it = params0, 0
        opt_state = optimizer.init(params)
        stats = init_stats(params.means.shape[0])

    if args.eval_state:
        print(json.dumps({
            "n_splats": int(params.means.shape[0]), "it": it,
            "train_psnr": eval_psnr(params, vs, train_idx[:8], cfg),
            "test_psnr": eval_psnr(params, vs, test_idx[:8], cfg)}))
        return 0

    # deterministic cross-process view order: epoch e = permutation
    # seeded (seed, e)
    total = args.iters
    seg = args.densify_every if args.densify_every else total
    end = min(it + seg, total)
    step = make_train_step_mv(cfg, optimizer, 0.2, max_pairs=mp)
    ne = len(train_idx)
    loss = float("nan")
    for i in range(it, end):
        e, o = divmod(i, ne)
        order = np.random.default_rng((0, e)).permutation(train_idx)
        params, opt_state, stats, loss = step(
            params, opt_state, stats, vs, jnp.int32(int(order[o])))
    loss = float(loss)
    n_before = n_after = int(params.means.shape[0])
    if (args.densify_every and end < total
            and end < total * 0.75):
        params, opt_state, stats, rep = densify_and_prune(
            params, opt_state, stats, grad_threshold=2e-4,
            scale_threshold=0.01 * extent,
            max_splats=args.max_gaussians, seed=end)
        n_after = int(params.means.shape[0])
        if args.opacity_reset_every and \
                end % args.opacity_reset_every < seg:
            params = reset_opacity(params)
    _save_state(spath, params, opt_state, stats, end)
    print(json.dumps({"it": end, "loss": round(loss, 5),
                      "n_before": n_before, "n_after": n_after}))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", type=str, default="/tmp/gsrt_fit_capture")
    ap.add_argument("--gt-splats", type=int, default=40_000)
    ap.add_argument("--views", type=int, default=28)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--holdout", type=int, default=7,
                    help="every 7th view held out (INRIA llffhold=8 shape)")
    ap.add_argument("--densify-every", type=int, default=300)
    ap.add_argument("--max-gaussians", type=int, default=120_000)
    ap.add_argument("--opacity-reset-every", type=int, default=900)
    ap.add_argument("--fresh", action="store_true",
                    help="re-synthesize the capture even if --dir exists")
    ap.add_argument("--max-pairs", type=int, default=1 << 20,
                    help="tiled custom-VJP loss pair bucket (0 = the "
                         "brute-force AD loss — OOMs beyond ~300x300 px: "
                         "its chunked VJP residuals are "
                         "[chunks, pixels, feat] in HBM)")
    ap.add_argument("--save-ply", type=str, default=None)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--probe-step", type=int, default=None,
                    help="internal: time one train step at N splats in a "
                         "fresh process and print ms (the axon runtime "
                         "cannot re-execute the step after the eval "
                         "renders ran in-process)")
    ap.add_argument("--segment", action="store_true",
                    help="internal: run ONE densify-bounded training "
                         "segment from the checkpoint and exit — the "
                         "axon runtime cannot re-execute the train step "
                         "after the densify executables ran in-process, "
                         "so the INRIA schedule runs as a chain of "
                         "subprocess segments")
    ap.add_argument("--eval-state", action="store_true",
                    help="internal: holdout PSNR of the checkpoint")
    args = ap.parse_args()
    mp = args.max_pairs if args.max_pairs > 0 else None

    if args.segment or args.eval_state:
        return run_segment(args, mp)

    if args.probe_step is not None:
        from gsrt.core.config import RenderConfig
        from gsrt.models.densify import init_stats
        from gsrt.models.multiview import (make_train_step_mv,
                                           viewset_from_colmap)
        from gsrt.models.trainer import make_optimizer
        from gsrt.scene.colmap import init_params_from_points
        vs, _, extent = viewset_from_colmap(
            args.dir, os.path.join(args.dir, "images"))
        cfg = RenderConfig(width=vs.width, height=vs.height,
                           conic_mode="standard")
        n = args.probe_step
        rngp = np.random.default_rng(0)
        pts = rngp.uniform(-extent, extent, (n, 3)).astype(np.float32)
        cols = rngp.uniform(0.2, 0.8, (n, 3)).astype(np.float32)
        params = init_params_from_points(pts, cols)
        optimizer = make_optimizer(lr_means=1.6e-4 * extent)
        opt_state = optimizer.init(params)
        stats = init_stats(n)
        step = make_train_step_mv(cfg, optimizer, 0.2, max_pairs=mp)
        out = step(params, opt_state, stats, vs, 0)
        jax.block_until_ready(out[0].means)
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            out = step(params, opt_state, stats, vs, 0)
        jax.block_until_ready(out[0].means)
        print((time.perf_counter() - t0) / reps * 1e3)
        return 0

    if args.fresh and os.path.isdir(args.dir):
        shutil.rmtree(args.dir)
    if not os.path.isdir(os.path.join(args.dir, "sparse", "0")):
        t0 = time.perf_counter()
        synthesize_capture(args.dir, n_gt=args.gt_splats,
                           n_views=args.views, width=args.width,
                           height=args.height)
        print(f"capture synthesized in {time.perf_counter() - t0:.1f}s "
              f"-> {args.dir}", file=sys.stderr)

    from gsrt.scene.colmap import load_colmap_model

    n_init = load_colmap_model(
        os.path.join(args.dir, "sparse", "0")).points.shape[0]

    # subprocess-segmented INRIA schedule (see --segment help): steps run
    # as the only sizable executable per process; densify runs LAST in
    # its segment's process; state checkpoints through <dir>/fit_state.npz
    import subprocess
    spath = os.path.join(args.dir, STATE)
    if os.path.exists(spath):
        os.remove(spath)
    seg = args.densify_every if args.densify_every else args.iters
    t0 = time.perf_counter()
    it = 0
    seg_args = [sys.executable, os.path.abspath(__file__),
                "--dir", args.dir, "--iters", str(args.iters),
                "--densify-every", str(args.densify_every),
                "--opacity-reset-every", str(args.opacity_reset_every),
                "--max-gaussians", str(args.max_gaussians),
                "--holdout", str(args.holdout),
                "--max-pairs", str(args.max_pairs)]
    while it < args.iters:
        r = subprocess.run(seg_args + ["--segment"], capture_output=True,
                           text=True, timeout=2400)
        if r.returncode != 0:
            print(r.stderr[-3000:], file=sys.stderr)
            return 1
        info = json.loads(r.stdout.strip().splitlines()[-1])
        it = info["it"]
        print(f"iter {it:5d}  loss {info['loss']:.5f}  "
              f"splats {info['n_before']}->{info['n_after']}",
              file=sys.stderr)
    fit_wall = time.perf_counter() - t0

    r = subprocess.run(seg_args + ["--eval-state"], capture_output=True,
                       text=True, timeout=2400)
    ev = json.loads(r.stdout.strip().splitlines()[-1])

    class rep:   # shim for the report fields below
        n_splats = ev["n_splats"]
        train_psnr = ev["train_psnr"]
        test_psnr = ev["test_psnr"]

    # steady-state step time at the FINAL splat count — in a SUBPROCESS:
    # the axon TPU runtime raises InvalidArgument when re-executing the
    # train step after another sizable executable (fit_views' eval
    # renders) ran in this process (tools/tpu_smoke.py docstring)
    import subprocess
    probe = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--probe-step",
         str(rep.n_splats), "--dir", args.dir, "--max-pairs",
         str(args.max_pairs)],
        capture_output=True, text=True, timeout=1200)
    try:
        step_ms = float(probe.stdout.strip().splitlines()[-1])
    except (ValueError, IndexError):
        print(probe.stderr[-2000:], file=sys.stderr)
        step_ms = float("nan")

    if args.save_ply:
        from gsrt.scene.ply import save_gaussian_ply
        import jax.numpy as jnp
        save_gaussian_ply(args.save_ply, params.means, params.quats,
                          jnp.exp(params.log_scales),
                          jax.nn.sigmoid(params.opacity_logit), params.sh)

    row = {
        "workload": "fit_colmap_synthetic",
        "gt_splats": args.gt_splats, "views": args.views,
        "width": args.width, "height": args.height,
        "iters": args.iters, "init_points": n_init,
        "final_splats": rep.n_splats,
        "train_psnr_db": round(rep.train_psnr, 2),
        "test_psnr_db": round(rep.test_psnr, 2),
        "fit_wall_s": round(fit_wall, 1),
        "step_ms_at_final": round(step_ms, 2),
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
