"""Command-line interface — mirrors the reference's options surface
(RayTracingInVulkan/src/Options.cpp:9-72: --scene --width --height --samples
--bounces --shadowrays --shader-type --benchmark ...) as subcommands over the
TPU renderers.

  python -m gsrt.cli render  --scene 3DGS --width 128 --height 128 --out o.png
  python -m gsrt.cli render  --ply garden.ply --width 1920 --height 1080
  python -m gsrt.cli pt      --scene rtiow --samples 8 --bounces 16
  python -m gsrt.cli bench   --out results.json          # lumibench-style sweep
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _add_common(p):
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--samples", type=int, default=1)
    p.add_argument("--bounces", type=int, default=16)
    p.add_argument("--out", type=str, default=None, help="PNG output path")
    p.add_argument("--dump-binary", type=str, default=None,
                   help="reference-style image.binary dump path")
    p.add_argument("--stats", action="store_true")


def cmd_render(args) -> int:
    """Ray-traced 3DGS rendering (the reference's --scene '3DGS' path)."""
    import jax
    from gsrt.core.config import RenderConfig
    from gsrt.core.types import make_camera, look_at
    from gsrt.models.gaussian_rt import GaussianRayTracer
    from gsrt.scene.catalog import demo_gauss_splat, random_cloud
    from gsrt.utils.image import dump_image_binary, save_png
    from gsrt.utils.stats import RenderStats

    cfg = RenderConfig(width=args.width, height=args.height,
                       samples=args.samples,
                       conic_mode="reference" if args.reference_conic
                       else "standard",
                       use_exp_lut=args.exp_lut, k=args.k,
                       expand_impl=getattr(args, "expand_impl", "pallas"),
                       payload=getattr(args, "payload", "f32"),
                       span_mode=getattr(args, "span_mode", "rect"),
                       scan_impl=getattr(args, "scan_impl", "roll"))
    if args.ply:
        from gsrt.scene.ply import load_gaussian_ply
        cloud = load_gaussian_ply(args.ply)
        center = np.asarray(cloud.means).mean(0)
        eye = center + np.asarray([0, 0, -4.0]) * float(
            np.abs(np.asarray(cloud.means) - center).max() / 2 + 1)
        if args.camera:
            from gsrt.scene.obj import load_camera_file
            eye, center = load_camera_file(args.camera)
        camera = make_camera(look_at(eye, center), args.fov,
                             args.width, args.height)
    elif args.scene == "3DGS":
        cloud, camera = demo_gauss_splat(args.width, args.height)
    elif args.scene.startswith("random"):
        n = int(args.scene[len("random"):] or "100000")
        cloud, camera = random_cloud(n, width=args.width, height=args.height)
    else:
        print(f"unknown gaussian scene {args.scene!r}", file=sys.stderr)
        return 2

    rt = GaussianRayTracer(cfg, mode=args.mode,
                           interpret=jax.default_backend() != "tpu")
    out = rt(cloud, camera)
    np.asarray(out.trans)  # sync
    t0 = time.perf_counter()
    out = rt(cloud, camera)
    color = np.asarray(out.color)
    dt = time.perf_counter() - t0

    if args.out:
        save_png(args.out, color)
        print(f"wrote {args.out}")
    if args.dump_binary:
        dump_image_binary(args.dump_binary, color)
    if args.heatmap:
        from gsrt.utils.heatmap import heatmap
        save_png(args.heatmap, heatmap(np.asarray(out.hits)))
        print(f"wrote {args.heatmap}")
    if args.stats:
        st = RenderStats(width=args.width, height=args.height,
                         samples=args.samples, n_splats=cloud.n)
        st.from_output(out, hits_granularity=(
            "tile-pairs" if args.mode == "tiled" else "pixel")).finish(dt)
        if out.overflow is not None:
            st.overflow = bool(out.overflow)
        print(st.to_json())
    else:
        print(f"{dt * 1e3:.1f} ms  "
              f"{args.width * args.height / dt / 1e6:.2f} Mrays/s")
    return 0


def cmd_pt(args) -> int:
    """Path tracing / shadow / AO workloads (--shader-type analogues)."""
    from gsrt.core.config import RenderConfig
    from gsrt.models.path_tracer import (
        render_ambient_occlusion,
        render_path_traced,
        render_shadow_rays,
    )
    from gsrt.scene.primitives_catalog import (
        cornell_box,
        cube_and_spheres,
        ray_tracing_in_one_weekend,
    )
    from gsrt.utils.image import save_png

    from gsrt.scene.primitives_catalog import (
        cubes_and_common_scene,
        cylinder_cubes_common_scene,
        mandelbulb_scene,
        planets_in_one_weekend,
        simple_test,
    )
    scenes = {"rtiow": ray_tracing_in_one_weekend,
              "cornell": cornell_box,
              "cubes": cube_and_spheres,
              "planets": planets_in_one_weekend,
              "cubesgrid": cubes_and_common_scene,
              "cylinders": cylinder_cubes_common_scene,
              "mandelbulb": mandelbulb_scene,
              "simple": simple_test}
    if args.scene == "obj":
        from gsrt.core.types import make_camera, look_at
        from gsrt.scene.obj import load_obj
        scene = load_obj(args.obj)
        allv = np.concatenate([np.asarray(scene.tri_v0),
                               np.asarray(scene.tri_v1),
                               np.asarray(scene.tri_v2)], axis=0)
        lo, hi = allv.min(0), allv.max(0)
        c = 0.5 * (lo + hi)
        eye = c + (hi - lo) * np.asarray([0.0, 0.3, 1.8])
        camera = make_camera(look_at(eye, c), 40.0, args.width, args.height)
        extra = dict(aperture=0.0, focus=1.0, has_sky=True, gamma=True)
    elif args.scene in scenes:
        scene, camera, extra = scenes[args.scene](args.width, args.height)
    else:
        print(f"unknown scene {args.scene!r}; have {list(scenes)} + obj",
              file=sys.stderr)
        return 2

    cfg = RenderConfig(width=args.width, height=args.height,
                       samples=args.samples, bounces=args.bounces,
                       shadow_rays=args.shadowrays, ao_rays=args.aorays,
                       has_sky=extra["has_sky"],
                       gamma_correction=extra["gamma"])
    if getattr(args, "mips", False):
        from gsrt.models.path_tracer import with_texture_mips
        scene = with_texture_mips(scene)
        if scene.tex_mips is None:
            print("note: --mips ignored (scene has no UV textures)",
                  file=sys.stderr)
    pk = {}
    if getattr(args, "primary", "block") == "binned" and \
            int(scene.tri_v0.shape[0]) > 0 and \
            scene.alpha_textures is None and \
            (extra["aperture"] == 0.0 or args.shader_type != "path"):
        pk = dict(primary_impl="binned")
    elif getattr(args, "primary", "block") == "binned":
        print("note: binned primary unavailable for this scene "
              "(no triangles, alpha cutouts, or aperture > 0) — "
              "using the block path", file=sys.stderr)
    if args.shader_type == "path":
        fn = lambda s, c: render_path_traced(s, c, cfg,
                                             aperture=extra["aperture"],
                                             focus=extra["focus"], **pk)
    elif args.shader_type == "shadow":
        fn = lambda s, c: render_shadow_rays(
            s, c, cfg,
            light_pos=(278, 554, -279)
            if args.scene == "cornell" else (0, 5, 2), **pk)
    elif args.shader_type == "ao":
        fn = lambda s, c: render_ambient_occlusion(s, c, cfg, **pk)
    elif args.shader_type == "foveated":
        from gsrt.models.path_tracer import render_foveated
        fn = lambda s, c: render_foveated(s, c, cfg,
                                          aperture=extra["aperture"],
                                          focus=extra["focus"])
    else:
        print(f"unknown shader type {args.shader_type}", file=sys.stderr)
        return 2
    # jit the whole frame with the scene as a pytree argument: eager
    # per-op dispatch pays the tunnel round-trip thousands of times, and
    # no-arg closures make XLA constant-fold the mesh (see cmd_bench)
    import jax
    t0 = time.perf_counter()
    try:
        img = np.asarray(jax.jit(fn)(scene, camera))
    except Exception as e:
        print(f"note: eager fallback ({type(e).__name__})", file=sys.stderr)
        img = np.asarray(fn(scene, camera))
    dt = time.perf_counter() - t0
    rays = args.width * args.height * args.samples
    print(f"{dt * 1e3:.1f} ms  {rays / dt / 1e6:.2f} Mrays/s "
          f"(compile included)")
    if args.out:
        save_png(args.out, img)
        print(f"wrote {args.out}")
    return 0


def cmd_bench(args) -> int:
    """lumibench.sh-style sweep: scene × shader-type grid at 128x128/2spp
    (lumibench.sh:1-46), emitting one JSON record per run.

    --suite lumibench sweeps the named REFERENCE datasets
    (gsrt.scene.reference_scenes: TreesAndGrass, Blender_2.xx, Bathroom,
    Ship — 6K-1M+ triangles) through the Morton-cluster acceleration
    structure, reporting aabb/prim tests per camera ray (the
    rt_avg_nodes_per_ray analogue, gpu-sim.cc:1504-1532)."""
    import functools
    from gsrt.core.config import RenderConfig
    from gsrt.models.path_tracer import (
        render_ambient_occlusion,
        render_path_traced,
        render_shadow_rays,
        with_tri_clusters,
    )
    from gsrt.scene.primitives_catalog import (
        cornell_box,
        cube_and_spheres,
        ray_tracing_in_one_weekend,
    )

    results = []
    if args.suite == "lumibench":
        from gsrt.scene.reference_scenes import (REFERENCE_SCENES,
                                                 reference_data_available)
        if not reference_data_available():
            print("reference Scenes/ data not found", file=sys.stderr)
            return 1
        scenes = {k: functools.partial(f, max_files=args.max_files)
                  for k, f in REFERENCE_SCENES.items()}
    else:
        scenes = {"rtiow": ray_tracing_in_one_weekend,
                  "cornell": cornell_box,
                  "cubes": cube_and_spheres}
    if args.scenes:
        keep = set(args.scenes.split(","))
        scenes = {k: v for k, v in scenes.items() if k in keep}
    for sname, factory in scenes.items():
        scene, camera, extra = factory(args.width, args.height)
        cfg = RenderConfig(width=args.width, height=args.height,
                           samples=args.samples, bounces=args.bounces,
                           has_sky=extra["has_sky"],
                           gamma_correction=extra["gamma"])
        n_tris = int(scene.tri_v0.shape[0])
        stats = {}
        if args.suite == "lumibench":
            from gsrt.models.path_tracer import with_tri_table
            scene = with_tri_table(scene)
            if scene.tri_table is not None:
                # traversal-work metric on the primary bundle: visited
                # super-clusters per block x 128 leaf tris per cluster
                from gsrt.models.path_tracer import generate_camera_rays
                from gsrt.ops.tri_kernel import closest_hit_packed
                import jax
                orig, dirn = generate_camera_rays(
                    jax.random.PRNGKey(0), camera, cfg)
                *_, plan = closest_hit_packed(
                    scene.tri_table, orig, dirn, cfg.t_min, cfg.t_max)
                R = orig.shape[0]
                nb = max(R // 512, 1)
                stats = {"tris": n_tris,
                         "sup_visits_per_block": round(
                             float(plan.total) / nb, 1),
                         "prim_tests_per_ray": round(
                             float(plan.total) * 8 * 128 / R, 1)}
                if plan.actual is not None:
                    # EXECUTED visits: the front-to-back early exit +
                    # best-t bound stop blocks well short of the plan
                    act = float(plan.actual.mean())
                    stats["sup_visits_actual_per_block"] = round(act, 1)
                    stats["prim_tests_per_ray_max"] = round(
                        act * 8 * 128 / 512, 1)
            else:
                scene = with_tri_clusters(scene)
        pk = {}
        if args.primary == "binned" and n_tris > 0 and \
                scene.alpha_textures is None:
            from gsrt.models.gaussian_rt import pair_bucket
            from gsrt.ops.tri_binning import count_tri_pairs_numpy
            exact = getattr(args, "tri_span", "rect") == "exact"
            need = count_tri_pairs_numpy(
                scene.tri_v0, scene.tri_v1, scene.tri_v2, camera,
                tile_w=cfg.tile_w, tile_h=cfg.tile_h, span_exact=exact)
            want = pair_bucket(int(need * 1.1))
            if want > args.tri_max_pairs:
                print(f"warning: {sname} needs ~{need} tri pairs but "
                      f"--tri-max-pairs caps at {args.tri_max_pairs}; "
                      "the binned cast will truncate", file=sys.stderr)
            pk = dict(primary_impl="binned", tri_span_exact=exact,
                      tri_max_pairs=min(want, args.tri_max_pairs))
            # candidate-work metric for the binned path: avg (tile, tri)
            # pairs per pixel — the rasterizer-side rt_avg_nodes_per_ray
            stats["binned_pairs"] = int(need)
            stats["candidates_per_pixel"] = round(
                need / (args.width * args.height), 2)
        for wname, fn in [
            ("PT", lambda s, c: render_path_traced(s, c, cfg, **pk)),
            ("SH", lambda s, c: render_shadow_rays(
                s, c, cfg,
                light_pos=(278, 554, -279) if sname == "cornell"
                else (0, 5, 2), **pk)),
            ("AO", lambda s, c: render_ambient_occlusion(s, c, cfg, **pk)),
        ]:
            # jit the whole workload with the scene as a pytree ARGUMENT:
            # eager dispatch pays the axon tunnel's per-op round-trip
            # thousands of times per frame (measured 7.5 s/frame eager vs
            # ms-scale jitted on trees_and_grass PT @128x128), and no-arg
            # closures embed the mesh as constants, which XLA then
            # constant-folds at compile time (minutes on big scenes)
            import jax
            try:
                fnj = jax.jit(fn)
                np.asarray(fnj(scene, camera))   # compile + warm
                fn = fnj
            except Exception as e:    # host-side code in some path
                print(f"note: {sname}/{wname} falls back to eager "
                      f"({type(e).__name__})", file=sys.stderr)
                np.asarray(fn(scene, camera))    # warm caches at least
            t0 = time.perf_counter()
            np.asarray(fn(scene, camera))
            dt = time.perf_counter() - t0
            rec = {"scene": sname, "workload": wname,
                   "width": args.width, "height": args.height,
                   "samples": args.samples, "ms": round(dt * 1e3, 2),
                   "mrays_s": round(args.width * args.height *
                                    args.samples / dt / 1e6, 3), **stats}
            results.append(rec)
            print(json.dumps(rec))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    return 0


def cmd_orbit(args) -> int:
    """Offline camera-path rendering with temporal-reuse serving — the
    headless analogue of the reference's interactive orbit
    (ModelViewController.cpp) plus the frame-coherent cull gsrt adds on
    top (gsrt.serving)."""
    import os

    from gsrt.core.config import RenderConfig
    from gsrt.models.gaussian_rt import GaussianRayTracer
    from gsrt.scene.campath import orbit_path
    from gsrt.scene.catalog import demo_gauss_splat, random_cloud
    from gsrt.serving import ServingRenderer
    from gsrt.utils.image import save_png

    cfg = RenderConfig(width=args.width, height=args.height,
                       conic_mode="standard", use_exp_lut=args.exp_lut)
    if args.ply:
        from gsrt.scene.ply import load_gaussian_ply
        cloud = load_gaussian_ply(args.ply)
        center = np.asarray(cloud.means).mean(0)
        radius = args.radius or float(
            np.abs(np.asarray(cloud.means) - center).max() * 1.5 + 1)
    elif args.scene.startswith("random"):
        n = int(args.scene[len("random"):] or "100000")
        # bench.py's headline scene parameters (~4-8 px footprints) so
        # orbit throughput is comparable with `cli bench` / bench.py
        cloud, cam0 = random_cloud(n, width=args.width, height=args.height,
                                   scale_range=(0.004, 0.03))
        center = np.asarray(cloud.means).mean(0)
        radius = args.radius or float(np.linalg.norm(
            np.asarray(cam0.position) - center))
    else:
        cloud, cam0 = demo_gauss_splat(args.width, args.height)
        center = np.asarray(cloud.means).mean(0)
        radius = args.radius or float(np.linalg.norm(
            np.asarray(cam0.position) - center))

    if args.frames < 1:
        print("--frames must be >= 1", file=sys.stderr)
        return 2
    cams = orbit_path(center, radius, args.frames, height=args.elev,
                      fov_y_deg=args.fov, width=args.width,
                      height_px=args.height, degrees=args.degrees)

    import jax
    interp = jax.default_backend() == "cpu"   # Pallas kernels: interpret
    if args.no_serving:
        rt = GaussianRayTracer(cfg, mode="tiled", interpret=interp,
                               defer_overflow=4)
        render = lambda cam: rt(cloud, cam)
        stats = None
    else:
        srv = ServingRenderer(cfg, margin=args.margin, strict=args.strict,
                              interpret=interp)
        render = lambda cam: srv(cloud, cam)
        stats = srv.stats

    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
    frame_ms = []
    inflight: list = []   # (index, out) — sync `depth` frames behind so
    depth = 4             # dispatch overlaps the axon tunnel round-trip
    t0 = time.perf_counter()
    for i, cam in enumerate(cams):
        t1 = time.perf_counter()
        out = render(cam)
        inflight.append((i, out))
        if len(inflight) >= depth:
            j, old = inflight.pop(0)
            if args.out_dir:
                save_png(os.path.join(args.out_dir, f"frame_{j:04d}.png"),
                         np.asarray(old.color))
            else:
                jax.block_until_ready(old.trans)  # sync, no host transfer
        frame_ms.append((time.perf_counter() - t1) * 1e3)
    for j, old in inflight:
        if args.out_dir:
            save_png(os.path.join(args.out_dir, f"frame_{j:04d}.png"),
                     np.asarray(old.color))
        else:
            jax.block_until_ready(old.trans)
    if stats is not None:
        srv.finish()
    wall = time.perf_counter() - t0
    rays = args.width * args.height * len(cams)
    # early frames carry jit compiles (+ serving's shrink re-bucketing
    # compiles); steady-state = the last half of the path
    tail = frame_ms[len(frame_ms) // 2:] or frame_ms
    rec = dict(frames=len(cams), wall_s=round(wall, 3),
               ms_per_frame=round(wall / len(cams) * 1e3, 2),
               steady_ms=round(sum(tail) / len(tail), 2),
               mrays_per_s=round(rays / wall / 1e6, 2),
               steady_mrays_per_s=round(
                   args.width * args.height / (sum(tail) / len(tail)) / 1e3,
                   2),
               serving=not args.no_serving)
    if stats:
        rec["violations"] = sum(f["violations"] for f in stats)
        rec["full_renders"] = sum(f["full_renders"] for f in stats)
        rec["pairs_first"] = stats[0]["pairs"]
        rec["pairs_last"] = stats[-1]["pairs"]
    print(json.dumps(rec))
    if args.stats_out and stats:
        with open(args.stats_out, "w") as f:
            json.dump(stats, f)
    return 0


def cmd_view(args) -> int:
    """Interactive browser viewer (ModelViewController + UserInterface
    rebuilt headless — gsrt/viewer): WASD fly, mouse look, live fps /
    Mrays/s overlay, heatmap toggle, served over HTTP."""
    from gsrt.core.config import RenderConfig
    from gsrt.core.types import make_camera, look_at
    from gsrt.viewer.server import ViewerServer

    cfg = RenderConfig(width=args.width, height=args.height,
                       conic_mode="standard", use_exp_lut=args.exp_lut)
    if args.ply:
        from gsrt.scene.ply import load_gaussian_ply
        cloud = load_gaussian_ply(args.ply)
        center = np.asarray(cloud.means).mean(0)
        radius = float(
            np.abs(np.asarray(cloud.means) - center).max() * 1.5 + 1)
        eye = center + np.array([0.0, 0.0, -radius])
        cam0 = make_camera(look_at(eye, center), args.fov,
                           args.width, args.height)
    elif args.scene.startswith("random"):
        from gsrt.scene.catalog import random_cloud
        n = int(args.scene[len("random"):] or "100000")
        cloud, cam0 = random_cloud(n, width=args.width, height=args.height,
                                   scale_range=(0.004, 0.03))
    else:
        from gsrt.scene.catalog import demo_gauss_splat
        cloud, cam0 = demo_gauss_splat(args.width, args.height)

    srv = ViewerServer(cloud, cfg, cam0, renderer=args.renderer,
                       fov_y_deg=args.fov, host=args.host, port=args.port,
                       max_fps=args.max_fps)
    print(f"gsrt viewer: http://{args.host}:{srv.port}/  "
          f"({np.asarray(cloud.means).shape[0]} splats, "
          f"{args.width}x{args.height}, renderer={args.renderer})")
    srv.serve_forever()
    return 0


def cmd_compare(args) -> int:
    """PSNR/SSIM between two images (the north-star parity check)."""
    from gsrt.utils.image import load_png, psnr, ssim
    a = load_png(args.a)
    b = load_png(args.b)
    if a.shape != b.shape:
        print(f"shape mismatch {a.shape} vs {b.shape}", file=sys.stderr)
        return 2
    p_db = psnr(a, b)
    print(json.dumps({"psnr_db": round(min(p_db, 999.0), 3),  # cap inf (identical)
                      "ssim": round(ssim(a, b), 4)}))
    return 0


def cmd_train(args) -> int:
    """Fit a Gaussian cloud to a target image (single-camera demo of the
    differentiable renderer); saves an INRIA .ply."""
    import jax
    import jax.numpy as jnp
    from gsrt.core.config import RenderConfig
    from gsrt.models.gaussian_rt import render_fast
    from gsrt.models.trainer import (make_optimizer, random_init, train_step)
    from gsrt.scene.catalog import demo_gauss_splat
    from gsrt.utils.image import load_png, save_png

    cfg = RenderConfig(width=args.width, height=args.height,
                       conic_mode="standard")
    if args.target:
        target = jnp.asarray(load_png(args.target))
        from gsrt.core.types import make_camera, look_at
        camera = make_camera(look_at((0, 0, 0), (0, 0, 1)), 60.0,
                             args.width, args.height)
    else:  # self-supervised demo: fit the 2-gaussian reference scene
        cloud, camera = demo_gauss_splat(args.width, args.height)
        target = render_fast(cloud, camera, cfg).color

    params = random_init(jax.random.PRNGKey(0), args.n_gaussians,
                         extent=2.0, z_offset=4.0, sh_degree=0)
    optimizer = make_optimizer(lr_means=2e-3, lr_scales=5e-3,
                               lr_opacity=5e-2, lr_sh=1e-2)
    opt_state = optimizer.init(params)
    if args.densify_every:
        from gsrt.models.densify import (densify_and_prune, init_stats,
                                         make_train_step_adaptive)
        stats = init_stats(params.means.shape[0])
        astep = make_train_step_adaptive(cfg, optimizer,
                                         lambda_ssim=args.lambda_ssim)
        for it in range(args.iters):
            params, opt_state, stats, loss = astep(
                params, opt_state, stats, target, camera)
            if (it + 1) % args.densify_every == 0 and \
                    it < args.iters * 3 // 4:
                params, opt_state, stats, rep = densify_and_prune(
                    params, opt_state, stats,
                    grad_threshold=args.densify_grad,
                    scale_threshold=args.densify_scale,
                    max_splats=args.max_gaussians,
                    bucket=max(64, args.n_gaussians), seed=it)
                print(f"iter {it:5d}  densify: {rep.n_before} -> "
                      f"{rep.n_after} live (+{rep.n_cloned} cloned, "
                      f"{rep.n_split} split, -{rep.n_pruned} pruned)")
            if it % max(1, args.iters // 10) == 0:
                print(f"iter {it:5d}  loss {float(loss):.5f}")
    else:
        step = jax.jit(lambda p, s: train_step(
            p, s, target, camera, cfg, optimizer,
            lambda_ssim=args.lambda_ssim))
        for it in range(args.iters):
            params, opt_state, loss = step(params, opt_state)
            if it % max(1, args.iters // 10) == 0:
                print(f"iter {it:5d}  loss {float(loss):.5f}")
    if args.out:
        save_png(args.out,
                 __import__("numpy").asarray(
                     render_fast(params.to_cloud(), camera, cfg).color))
        print(f"wrote {args.out}")
    if args.save_ply:
        from gsrt.scene.ply import save_gaussian_ply
        import numpy as np
        save_gaussian_ply(args.save_ply, params.means,
                          params.quats, jnp.exp(params.log_scales),
                          jax.nn.sigmoid(params.opacity_logit), params.sh)
        print(f"wrote {args.save_ply}")
    return 0


def cmd_fit(args) -> int:
    """Fit a Gaussian cloud to a posed COLMAP capture (the full INRIA
    multi-view pipeline: SfM-point init, adaptive densification, holdout
    PSNR; BASELINE.md Mip-NeRF360-style inputs)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gsrt.core.config import RenderConfig
    from gsrt.models.multiview import fit_views, viewset_from_colmap

    images_dir = args.images or __import__("os").path.join(
        args.colmap, "images")
    vs, params, extent = viewset_from_colmap(
        args.colmap, images_dir, downscale=args.downscale,
        limit=args.limit or None)
    print(f"loaded {vs.n_views} views @{vs.width}x{vs.height}, "
          f"{params.means.shape[0]} SfM points, extent {extent:.2f}")
    cfg = RenderConfig(width=vs.width, height=vs.height,
                       conic_mode="standard")
    params, rep = fit_views(
        vs, params, cfg, iters=args.iters, lambda_ssim=args.lambda_ssim,
        holdout=args.holdout, densify_every=args.densify_every,
        densify_grad=args.densify_grad, scene_scale=extent,
        opacity_reset_every=args.opacity_reset_every,
        max_splats=args.max_gaussians, seed=0,
        log_every=max(1, args.iters // 20))
    print(f"fit done: {rep.n_splats} splats, "
          f"train PSNR {rep.train_psnr:.2f} dB, "
          f"test PSNR {rep.test_psnr:.2f} dB")
    if args.out:
        from gsrt.models.gaussian_rt import render_fast
        from gsrt.utils.image import save_png
        save_png(args.out, np.asarray(render_fast(
            params.to_cloud(), vs.camera_at(0), cfg).color))
        print(f"wrote {args.out}")
    if args.save_ply:
        from gsrt.scene.ply import save_gaussian_ply
        save_gaussian_ply(args.save_ply, params.means,
                          params.quats, jnp.exp(params.log_scales),
                          jax.nn.sigmoid(params.opacity_logit), params.sh)
        print(f"wrote {args.save_ply}")
    return 0


def main(argv=None) -> int:
    # honor JAX_PLATFORMS even when a site plugin (axon TPU) prepends itself
    import os
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    ap = argparse.ArgumentParser(prog="gsrt")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("render", help="ray-traced 3DGS")
    _add_common(p)
    p.add_argument("--scene", type=str, default="3DGS")
    p.add_argument("--ply", type=str, default=None)
    p.add_argument("--camera", type=str, default=None,
                   help=".camera file (eye xyz, center xyz)")
    p.add_argument("--fov", type=float, default=60.0)
    p.add_argument("--mode", choices=["tiled", "fast", "reference"],
                   default="tiled")
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--exp-lut", action="store_true")
    p.add_argument("--reference-conic", action="store_true")
    p.add_argument("--heatmap", type=str, default=None,
                   help="write per-pixel cost heatmap PNG (Heatmap.glsl analogue)")
    p.add_argument("--expand-impl", choices=["pallas", "xla", "fused"],
                   default="pallas", help="pair-expansion implementation")
    p.add_argument("--payload", choices=["f32", "compact"], default="f32",
                   help="pair-payload tier (compact = fast, ~1e-3 error)")
    p.add_argument("--span-mode", choices=["rect", "ellipse"],
                   default="rect", help="footprint pair-generation rule")
    p.add_argument("--scan-impl", choices=["roll", "logmm"], default="roll",
                   help="blend-kernel transmittance scan")
    p.set_defaults(fn=cmd_render)

    p = sub.add_parser("pt", help="path tracing workloads")
    _add_common(p)
    p.add_argument("--scene", type=str, default="rtiow")
    p.add_argument("--obj", type=str, default=None)
    p.add_argument("--shader-type",
                   choices=["path", "shadow", "ao", "foveated"],
                   default="path")
    p.add_argument("--shadowrays", type=int, default=2)
    p.add_argument("--aorays", type=int, default=4)
    p.add_argument("--primary", choices=["block", "binned"],
                   default="block",
                   help="primary-ray path (binned = screen-tile cast)")
    p.add_argument("--mips", action="store_true",
                   help="trilinear mip-mapped texture sampling "
                        "(ray-cone LOD; getTexture txl analogue)")
    p.set_defaults(fn=cmd_pt)

    p = sub.add_parser("bench", help="lumibench-style sweep")
    _add_common(p)
    p.add_argument("--primary", choices=["block", "binned"],
                   default="block",
                   help="primary-ray path: packed-cluster traversal or "
                        "screen-tile binned cast (no-cutout scenes only)")
    p.add_argument("--tri-max-pairs", type=int, default=1 << 20)
    p.add_argument("--tri-span", choices=["rect", "exact"], default="rect",
                   help="binned-cast pair generation (exact = scanline "
                        "clip; fewer pairs, identical image)")
    p.add_argument("--suite", choices=["synthetic", "lumibench"],
                   default="synthetic",
                   help="lumibench = reference Scenes/ datasets")
    p.add_argument("--scenes", type=str, default=None,
                   help="comma-separated scene-name filter")
    p.add_argument("--max-files", type=int, default=None,
                   help="cap OBJ count per directory scene")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("orbit", help="camera-path serving (orbit video)")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--scene", type=str, default="random1000000")
    p.add_argument("--ply", type=str, default=None)
    p.add_argument("--frames", type=int, default=24,
                   help="number of path frames (>= 1)")
    p.add_argument("--degrees", type=float, default=90.0)
    p.add_argument("--radius", type=float, default=None)
    p.add_argument("--elev", type=float, default=0.0)
    p.add_argument("--fov", type=float, default=60.0)
    p.add_argument("--margin", type=float, default=1.5)
    p.add_argument("--strict", action="store_true",
                   help="re-render frames the cull degraded")
    p.add_argument("--no-serving", action="store_true",
                   help="plain per-frame rendering (baseline)")
    p.add_argument("--exp-lut", action="store_true")
    p.add_argument("--out-dir", type=str, default=None)
    p.add_argument("--stats-out", type=str, default=None)
    p.set_defaults(fn=cmd_orbit)

    p = sub.add_parser("view", help="interactive browser viewer")
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--height", type=int, default=540)
    p.add_argument("--scene", type=str, default="random100000")
    p.add_argument("--ply", type=str, default=None)
    p.add_argument("--fov", type=float, default=60.0)
    p.add_argument("--renderer",
                   choices=["serving", "tiled", "fast", "reference"],
                   default="serving")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-fps", type=float, default=30.0)
    p.add_argument("--exp-lut", action="store_true")
    p.set_defaults(fn=cmd_view)

    p = sub.add_parser("compare", help="PSNR/SSIM between two PNGs")
    p.add_argument("a")
    p.add_argument("b")
    p.set_defaults(fn=cmd_compare)

    p = sub.add_parser("train", help="fit gaussians to a target image")
    _add_common(p)
    p.add_argument("--target", type=str, default=None)
    p.add_argument("--n-gaussians", type=int, default=256)
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--lambda-ssim", type=float, default=0.2)
    p.add_argument("--save-ply", type=str, default=None)
    p.add_argument("--densify-every", type=int, default=0,
                   help="run adaptive density control every N iters "
                        "(0 = fixed splat budget)")
    p.add_argument("--densify-grad", type=float, default=2e-4,
                   help="mean-gradient threshold for clone/split")
    p.add_argument("--densify-scale", type=float, default=0.05,
                   help="world-space scale split/clone boundary")
    p.add_argument("--max-gaussians", type=int, default=None,
                   help="hard cap on splat count during densification")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("fit", help="multi-view fit from a COLMAP capture")
    p.add_argument("--colmap", type=str, required=True,
                   help="scene root or sparse model dir (text or binary)")
    p.add_argument("--images", type=str, default=None,
                   help="image directory (default <colmap>/images)")
    p.add_argument("--downscale", type=int, default=1)
    p.add_argument("--limit", type=int, default=0,
                   help="use only the first N views (0 = all)")
    p.add_argument("--iters", type=int, default=2000)
    p.add_argument("--lambda-ssim", type=float, default=0.2)
    p.add_argument("--holdout", type=int, default=8,
                   help="every Nth view is held out for test PSNR (0=off)")
    p.add_argument("--densify-every", type=int, default=100)
    p.add_argument("--densify-grad", type=float, default=2e-4)
    p.add_argument("--opacity-reset-every", type=int, default=0)
    p.add_argument("--max-gaussians", type=int, default=None)
    p.add_argument("--out", type=str, default=None,
                   help="render view 0 to PNG after the fit")
    p.add_argument("--save-ply", type=str, default=None)
    p.set_defaults(fn=cmd_fit)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
