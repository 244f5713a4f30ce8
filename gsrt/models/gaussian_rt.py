"""Flagship model: ray-traced 3D Gaussian Splatting renderer.

Two execution paths over the same math (gsrt.ops.gaussian / kbuffer / sh):

* `render_reference` — exact replication of the reference's multi-pass
  k-buffer algorithm (GaussTracing.rgen:47-72 driving
  RayTracing.ProceduralGauss.{rint,rchit}): per pass, gather the k nearest
  splats beyond the per-pixel depth front, composite, advance the front,
  repeat until a pass is empty. Implemented as a `lax.while_loop` over
  batched pixel state — the per-warp intersection tables and per-thread PTX
  interpretation of the reference (vulkan_ray_tracing.cc:1052-1090,
  intersection_table.cc) collapse into dense [P, chunk] VPU ops.

* `render_fast` — single-pass front-to-back blend over splats globally
  sorted by camera-space depth. Because a splat's depth (camera z of its
  center, ProceduralGauss.rint:67-68) is the same for every pixel, the global
  sort yields the exact per-pixel visit order, so this computes *identical*
  transmittance/color to the multi-pass scheme in one sweep — the TPU-native
  reformulation of the whole rgen/rint/rchit state machine.

Both paths stream splats in fixed-size chunks (static shapes for XLA) and
carry no data-dependent shapes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gsrt.core.config import RenderConfig
from gsrt.core.types import Camera, GaussianCloud
from gsrt.ops import explut
from gsrt.ops.gaussian import (
    eval_gaussian_response,
    project_gaussians,
    screen_extents,
)
from gsrt.ops.kbuffer import (
    advance_depth_front,
    composite_color,
)
from gsrt.ops.sh import eval_sh


def _pixel_grid(width: int, height: int) -> jnp.ndarray:
    """[H*W, 2] pixel centers at integer coordinates (the reference evaluates
    g at integer pixel coords, ProceduralGauss.rint:58,100-101)."""
    ys, xs = jnp.mgrid[0:height, 0:width]
    return jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(jnp.float32)


def _precompute(cloud: GaussianCloud, camera: Camera, cfg: RenderConfig):
    """Project all splats; evaluate per-splat SH color (view dir from camera
    origin to splat center — constant per splat, standard 3DGS convention)."""
    depth, mean2d, quad, det, in_front = project_gaussians(
        cloud.means, cloud.cov3d, camera,
        conic_mode=cfg.conic_mode, cov2d_dilation=cfg.cov2d_dilation)
    dirs = cloud.means - camera.position
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-9)
    degree = min(cfg.sh_degree, cloud.sh_degree)
    colors = eval_sh(cloud.sh, dirs, degree)
    return depth, mean2d, quad, in_front, colors


class FMCloud(NamedTuple):
    """Feature-major (lane-major) device layout of a GaussianCloud.

    TPU tiles pad an array's minor dimension to 128 lanes, so the AoS-ish
    [N, 3] / [N, 6] / [N, K, 3] layouts of `GaussianCloud` waste ~98% of
    every vector register and HBM beat (measured: 31 ms to project 1M
    splats from [N,3] vs ~1 ms from [3,N] rows). The perf path transposes
    ONCE per scene (outside the per-frame jit) and renders from rows."""

    meansT: jnp.ndarray    # [3, N]
    cov3dT: jnp.ndarray    # [6, N]
    opacity: jnp.ndarray   # [N]
    shT: jnp.ndarray       # [K, 3, N]

    @property
    def n(self) -> int:
        return self.meansT.shape[1]

    @property
    def sh_degree(self) -> int:
        return int(self.shT.shape[0] ** 0.5 + 0.5) - 1


@jax.jit
def fm_from_cloud(cloud: GaussianCloud) -> FMCloud:
    """One-time relayout (pays the padded-layout read once per scene)."""
    return FMCloud(meansT=cloud.means.T,
                   cov3dT=cloud.cov3d.T,
                   opacity=cloud.opacity,
                   shT=jnp.transpose(cloud.sh, (1, 2, 0)))


def _precompute_fm(fm: FMCloud, camera: Camera, cfg: RenderConfig):
    """Feature-major `_precompute`: all outputs are [N] columns.

    Returns (depth, m2x, m2y, qa, qb, qc, in_front, cr, cg, cb)."""
    from gsrt.ops.gaussian import project_gaussians_fm
    from gsrt.ops.sh import eval_sh_fm

    depth, m2x, m2y, qa, qb, qc, det, in_front = project_gaussians_fm(
        fm.meansT, fm.cov3dT, camera,
        conic_mode=cfg.conic_mode, cov2d_dilation=cfg.cov2d_dilation)
    dx = fm.meansT[0] - camera.position[0]
    dy = fm.meansT[1] - camera.position[1]
    dz = fm.meansT[2] - camera.position[2]
    inv_n = 1.0 / jnp.maximum(jnp.sqrt(dx * dx + dy * dy + dz * dz), 1e-9)
    degree = min(cfg.sh_degree, fm.sh_degree)
    cr, cg, cb = eval_sh_fm(fm.shT, dx * inv_n, dy * inv_n, dz * inv_n,
                            degree)
    return depth, m2x, m2y, qa, qb, qc, in_front, cr, cg, cb


def _chunk_alphas(pix, mean2d_c, quad_c, depth_c, opacity_c, in_front_c,
                  cfg: RenderConfig, lut):
    """Evaluate splat alphas for a [P,2] pixel block × [C] splat chunk.

    Returns alpha [P, C] and accept mask [P, C]."""
    g = eval_gaussian_response(pix[:, None, :], mean2d_c[None, :, :],
                               quad_c[None, :, :])                    # [P, C]
    in_range = (g >= 0.0) & (g <= cfg.g_cutoff)
    gc = jnp.where(in_range, g, 0.0)
    power = explut.linear_exp(gc, lut) if cfg.use_exp_lut else jnp.exp(-gc)
    alpha = opacity_c[None, :] * power
    if cfg.conic_mode == "standard":
        alpha = jnp.minimum(alpha, 0.99)
    # the rgen ray window (tMin/tMax, rgen:50-51) and the k-buffer's
    # init_depth far sentinel: splats outside never composite
    in_window = ((depth_c > cfg.t_min)
                 & (depth_c < min(cfg.t_max, cfg.init_depth)))[None, :]
    accept = (in_range & (alpha > cfg.alpha_threshold)
              & in_front_c[None, :] & in_window)
    return jnp.where(accept, alpha, 0.0), accept


def _pad_splats(arrs, n: int, chunk: int):
    """Pad leading splat axis to a multiple of `chunk`."""
    pad = (-n) % chunk
    if pad == 0:
        return arrs, n
    out = []
    for a in arrs:
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        out.append(jnp.pad(a, widths))
    return out, n + pad


def _empty_output(camera: Camera, cfg: RenderConfig) -> "RenderOutput":
    H, W = camera.height, camera.width
    bg = 1.0 if cfg.white_background else 0.0
    return RenderOutput(trans=jnp.ones((H, W)),
                        color=jnp.full((H, W, 3), bg),
                        passes=jnp.zeros((H, W), jnp.int32),
                        hits=jnp.zeros((H, W), jnp.int32))


class RenderOutput(NamedTuple):
    trans: jnp.ndarray    # [H, W] final transmittance (reference's Ray.Trans)
    color: jnp.ndarray    # [H, W, 3]
    passes: jnp.ndarray   # [H, W] int32 — k-buffer passes per pixel
                          #   (render_fast reports equivalent ceil(hits/k))
    hits: jnp.ndarray     # [H, W] int32 — splats blended per pixel
    depth: Optional[jnp.ndarray] = None  # [H, W] alpha-weighted expected
                          #   depth (render_fast with cfg-independent
                          #   `with_depth=True`); None elsewhere
    overflow: Optional[jnp.ndarray] = None  # [] bool — tiled mode only:
                          #   the view's true pair count exceeded max_pairs
                          #   (farthest splats were truncated)


def render_reference(cloud: GaussianCloud, camera: Camera,
                     cfg: RenderConfig) -> RenderOutput:
    """Exact multi-pass k-buffer semantics (see module docstring)."""
    if cloud.n == 0:
        return _empty_output(camera, cfg)
    depth, mean2d, quad, in_front, colors = _precompute(cloud, camera, cfg)
    lut = explut.build_exp_lut() if cfg.use_exp_lut else None

    chunk = min(cfg.splat_chunk, max(cloud.n, 8))
    (depth, mean2d, quad, opac, in_front, colors), n_pad = _pad_splats(
        [depth, mean2d, quad, cloud.opacity, in_front, colors], cloud.n, chunk)
    # padded lanes: in_front=False keeps them out of every pass
    n_chunks = n_pad // chunk

    pix = _pixel_grid(camera.width, camera.height)        # [P, 2]
    P = pix.shape[0]
    k = cfg.k
    init_d = jnp.float32(cfg.init_depth)

    # colors for the k selected splats need indices; in reference mode only
    # trans matters, but we support color by re-looking-up via depth match.
    # Simpler: run the pass loop for (trans, front), and composite color by
    # the mathematically-equal sorted sweep in render_fast. Here we composite
    # color from the k-buffer by carrying per-chunk colors through the merge.
    def one_pass_with_color(front):
        def body(c, carry):
            kd, ka, kc = carry
            ds = jax.lax.dynamic_slice_in_dim(depth, c * chunk, chunk)
            m2 = jax.lax.dynamic_slice_in_dim(mean2d, c * chunk, chunk)
            qd = jax.lax.dynamic_slice_in_dim(quad, c * chunk, chunk)
            op = jax.lax.dynamic_slice_in_dim(opac, c * chunk, chunk)
            inf = jax.lax.dynamic_slice_in_dim(in_front, c * chunk, chunk)
            col = jax.lax.dynamic_slice_in_dim(colors, c * chunk, chunk)
            alpha, accept = _chunk_alphas(pix, m2, qd, ds, op, inf, cfg, lut)
            valid = accept & (ds[None, :] > front[:, None])
            cd = jnp.where(valid, ds[None, :], init_d)
            md = jnp.concatenate([kd, cd], axis=-1)
            ma = jnp.concatenate([ka, jnp.where(valid, alpha, 0.0)], axis=-1)
            ccol = jnp.broadcast_to(col[None, :, :], (P, chunk, 3))
            mc = jnp.concatenate([kc, ccol], axis=-2)
            neg_d, idx = jax.lax.top_k(-md, k)
            kd2 = -neg_d
            ka2 = jnp.take_along_axis(ma, idx, axis=-1)
            kc2 = jnp.take_along_axis(mc, idx[..., None], axis=-2)
            return kd2, ka2, kc2

        kd0 = jnp.full((P, k), init_d)
        ka0 = jnp.zeros((P, k))
        kc0 = jnp.zeros((P, k, 3))
        kd, ka, kc = jax.lax.fori_loop(0, n_chunks, body, (kd0, ka0, kc0))
        count = jnp.sum(kd < init_d, axis=-1).astype(jnp.int32)
        return kd, ka, kc, count

    def cond(state):
        front, trans, color, passes, hits, done = state
        return jnp.logical_not(jnp.all(done))

    def step(state):
        front, trans, color, passes, hits, done = state
        kd, ka, kc, count = one_pass_with_color(front)
        miss = count == 0
        new_trans, new_color = composite_color(trans, color, ka, kc, count)
        new_front = advance_depth_front(front, kd, count)
        live = jnp.logical_not(done)
        trans = jnp.where(live, new_trans, trans)
        color = jnp.where(live[:, None], new_color, color)
        front = jnp.where(live, new_front, front)
        passes = passes + jnp.where(live & ~miss, 1, 0)
        hits = hits + jnp.where(live, count, 0)
        done = done | miss | (passes >= cfg.max_passes)
        return front, trans, color, passes, hits, done

    state = (
        jnp.zeros(P),                 # depth front (rgen:30 "Rays.Depth = 0")
        jnp.ones(P),                  # transmittance (rgen:31 "Ray.Trans = 1")
        jnp.zeros((P, 3)),
        jnp.zeros(P, jnp.int32),
        jnp.zeros(P, jnp.int32),      # splats blended per pixel
        jnp.zeros(P, bool),
    )
    front, trans, color, passes, hits, done = jax.lax.while_loop(
        cond, step, state)

    if cfg.white_background:
        color = color + trans[:, None]

    H, W = camera.height, camera.width
    return RenderOutput(
        trans=trans.reshape(H, W),
        color=color.reshape(H, W, 3),
        passes=passes.reshape(H, W),
        hits=hits.reshape(H, W),
    )


def render_fast(cloud: GaussianCloud, camera: Camera,
                cfg: RenderConfig, with_depth: bool = False) -> RenderOutput:
    """Single-sweep sorted front-to-back blend (see module docstring).

    with_depth=True also accumulates the alpha-weighted expected depth
    E[z] = Σ wᵢ·zᵢ (standard 3DGS depth map — a capability gap in the
    reference, which tracks depth only as the k-buffer front)."""
    if cloud.n == 0:
        return _empty_output(camera, cfg)
    depth, mean2d, quad, in_front, colors = _precompute(cloud, camera, cfg)
    lut = explut.build_exp_lut() if cfg.use_exp_lut else None

    # Global depth sort = exact per-pixel visit order (depth is per-splat).
    order = jnp.argsort(jnp.where(in_front, depth, jnp.inf))
    depth = depth[order]
    mean2d = mean2d[order]
    quad = quad[order]
    opac = cloud.opacity[order]
    in_front_s = in_front[order]
    colors = colors[order]

    chunk = min(cfg.splat_chunk, max(cloud.n, 8))
    (depth, mean2d, quad, opac, in_front_s, colors), n_pad = _pad_splats(
        [depth, mean2d, quad, opac, in_front_s, colors], cloud.n, chunk)
    n_chunks = n_pad // chunk

    pix = _pixel_grid(camera.width, camera.height)
    P = pix.shape[0]

    def body(c, carry):
        trans, color, hits, dacc = carry
        ds = jax.lax.dynamic_slice_in_dim(depth, c * chunk, chunk)
        m2 = jax.lax.dynamic_slice_in_dim(mean2d, c * chunk, chunk)
        qd = jax.lax.dynamic_slice_in_dim(quad, c * chunk, chunk)
        op = jax.lax.dynamic_slice_in_dim(opac, c * chunk, chunk)
        inf = jax.lax.dynamic_slice_in_dim(in_front_s, c * chunk, chunk)
        col = jax.lax.dynamic_slice_in_dim(colors, c * chunk, chunk)
        alpha, accept = _chunk_alphas(pix, m2, qd, ds, op, inf, cfg, lut)
        # front-to-back within the chunk via exclusive cumprod (splats are
        # depth-sorted, so chunk order == blend order)
        one_minus = 1.0 - alpha
        cum = jnp.cumprod(one_minus, axis=-1)
        excl = jnp.concatenate([jnp.ones_like(cum[:, :1]), cum[:, :-1]], -1)
        w = alpha * excl * trans[:, None]                       # [P, C]
        # [P,C]@[C,3] on the MXU; HIGHEST avoids the bf16 default-precision path
        color = color + jnp.dot(w, col, precision=jax.lax.Precision.HIGHEST)
        if with_depth:
            dacc = dacc + jnp.dot(w, jnp.where(jnp.isfinite(ds), ds, 0.0),
                                  precision=jax.lax.Precision.HIGHEST)
        trans = trans * cum[:, -1]
        hits = hits + jnp.sum(accept, axis=-1).astype(jnp.int32)
        return trans, color, hits, dacc

    trans, color, hits, dacc = jax.lax.fori_loop(
        0, n_chunks, body,
        (jnp.ones(P), jnp.zeros((P, 3)), jnp.zeros(P, jnp.int32),
         jnp.zeros(P)))

    if cfg.white_background:
        color = color + trans[:, None]

    H, W = camera.height, camera.width
    passes = -(-hits // cfg.k)  # equivalent pass count
    return RenderOutput(trans=trans.reshape(H, W),
                        color=color.reshape(H, W, 3),
                        passes=passes.reshape(H, W),
                        hits=hits.reshape(H, W),
                        depth=dacc.reshape(H, W) if with_depth else None)


class ServingAux(NamedTuple):
    """Per-frame feedback the temporal-reuse serving loop consumes
    (gsrt.serving). Raw kernel/binning outputs; the cutoff-map update
    lives in serving.update_cutoff_map."""
    tile_start: jnp.ndarray   # [T + 1] int32 pair offsets
    tile_count: jnp.ndarray   # [T] int32 pairs per tile (culled stream)
    pair_depth: jnp.ndarray   # [MP] f32 camera depth per sorted pair
    consumed: jnp.ndarray     # [G, bs] int32 first saturated chunk index
                              # (== group chunk count when never saturated)


def render_tiled(cloud: GaussianCloud, camera: Camera, cfg: RenderConfig,
                 max_pairs: int = 1 << 20, max_rows: int | None = None,
                 interpret: bool = False, cutoff_map=None,
                 serving: bool = False) -> RenderOutput:
    """Tile-binned splatting — the performance path (SURVEY.md §7.3 steps 4-6).

    Projects all splats, bins their footprints to cfg.tile_w x cfg.tile_h
    pixel tiles with one global (tile, depth) sort (gsrt.ops.tile_binning),
    then blends each tile's chunk-aligned pair list front-to-back in a
    Pallas kernel. Work scales with Σ per-tile pairs instead of pixels ×
    splats. Two kernels share the math:

      * (128, 8) tiles → gsrt.ops.splat_pallas (round-1 kernel, one VPU
        register per tile);
      * smaller tiles (e.g. 16x16, the default) → gsrt.ops.splat_subtile,
        which evaluates each pair against only the tile_w*tile_h pixels its
        footprint can cover (~4-8x less VPU work per pair).

    cfg.use_exp_lut=True evaluates alpha through the reference's
    256-segment piecewise-linear exp (ExpLUT.hpp semantics) inside the
    kernel, enabling exact LUT-vs-LUT comparison with render_fast /
    render_reference.
    """
    from gsrt.ops.gaussian import screen_extents_abc
    from gsrt.ops.tile_binning import build_tile_binning, tile_extent

    if cloud.n == 0:
        out = _empty_output(camera, cfg)
        if serving:
            ntx0, nty0 = tile_extent(camera.width, camera.height,
                                     cfg.tile_w, cfg.tile_h)
            T0 = ntx0 * nty0
            return out, ServingAux(
                tile_start=jnp.zeros((T0 + 1,), jnp.int32),
                tile_count=jnp.zeros((T0,), jnp.int32),
                pair_depth=jnp.zeros((max_pairs,), jnp.float32),
                consumed=jnp.zeros((1, cfg.blend_bs), jnp.int32))
        return out
    fm = cloud if isinstance(cloud, FMCloud) else fm_from_cloud(cloud)
    depth, m2x, m2y, qa, qb, qc, in_front, cr, cg, cb = _precompute_fm(
        fm, camera, cfg)
    rx, ry = screen_extents_abc(qa, qb, qc, cfg.conic_mode, cfg.g_cutoff,
                                opacity=fm.opacity,
                                alpha_threshold=cfg.alpha_threshold)
    alive = (in_front & (fm.opacity > cfg.alpha_threshold)
             & (depth > cfg.t_min)
             & (depth < min(cfg.t_max, cfg.init_depth)))

    tw, th = cfg.tile_w, cfg.tile_h

    if serving:
        assert cfg.blend_impl == "packed" and (tw, th) != (128, 8), \
            "serving mode requires the packed blend kernel"
    compact = cfg.payload == "compact"
    if compact:
        if cfg.blend_impl != "packed":
            # only the packed kernel decodes the int32 payload — fall back
            # to the bit-parity f32 tier rather than rejecting the config
            # (compact is the DEFAULT, so subtile users must not assert)
            compact = False
        ntx = -(-camera.width // tw)
        if ntx > 127:       # 7-bit x-span budget (ok through 2K at 16 px)
            compact = False
        if (tw, th) == (128, 8):
            # this tile shape dispatches the round-1 blend_tiles kernel,
            # which only reads the f32 payload — fall back like ntx > 127
            compact = False
    span_mode = cfg.span_mode
    if span_mode == "ellipse" and -(-camera.height // th) > 255:
        span_mode = "rect"  # 8-bit row-count budget (ok through 4K at 16px)
    # group-contiguous stream (no pair-level sort): needs the compact
    # payload + packed blend + logmm scan + rect spans, a qualifying tile
    # grid, and the tile-sorted layout's per-tile offsets nowhere —
    # serving's cutoff feedback reads per-tile pair positions, so serving
    # stays on the tile stream
    from gsrt.ops.tile_binning import group_rows_k
    ntx_g = -(-camera.width // tw)
    group_k = group_rows_k(ntx_g)
    stream = cfg.stream
    if stream == "group" and not (
            compact and cfg.blend_impl == "packed" and not serving
            and cfg.scan_impl == "logmm" and span_mode == "rect"
            and (tw, th) != (128, 8) and group_k is not None):
        stream = "tile"
    binning = build_tile_binning(
        depth, m2x, m2y, qa, qb, qc, fm.opacity, cr, cg, cb, rx, ry, alive,
        width=camera.width, height=camera.height,
        tile_w=tw, tile_h=th,
        chunk=cfg.pair_chunk, max_pairs=max_pairs,
        expand_impl=cfg.expand_impl, interpret=interpret,
        cutoff_map=cutoff_map, carry_depth=serving,
        cull_super=cfg.serving_super, compact=compact,
        span_mode=span_mode, max_rows=max_rows,
        g_cutoff=cfg.g_cutoff, alpha_threshold=cfg.alpha_threshold,
        stream=stream)
    # Materialize binning outputs before the Pallas call: fusing XLA ops
    # into the kernel's operands produced wrong layouts/garbage reads on
    # the TPU backend (kernel verified correct on materialized inputs).
    binning = jax.lax.optimization_barrier(binning)

    alpha_clamp = 0.99 if cfg.conic_mode == "standard" else 0.999999
    # in standard mode with opacity ≤ 1, alpha > 1/255 implies g < ln(255)
    # < 5.6 = g_cutoff — the kernel can skip the g-range test (exact exp
    # only: the LUT chord sits above exp, so the implication can leak)
    skip_range = (cfg.conic_mode == "standard"
                  and cfg.alpha_threshold >= 1.0 / 255.0
                  and cfg.g_cutoff >= 5.55
                  and not cfg.use_exp_lut)
    if (tw, th) == (128, 8):
        from gsrt.ops.splat_pallas import blend_tiles
        color, trans = blend_tiles(
            binning, width=camera.width, height=camera.height,
            chunk=min(cfg.pair_chunk, 128),  # this kernel wants 128
            g_cutoff=cfg.g_cutoff, alpha_threshold=cfg.alpha_threshold,
            alpha_clamp=alpha_clamp, interpret=interpret,
            skip_range_check=skip_range, use_exp_lut=cfg.use_exp_lut)
    elif cfg.blend_impl == "subtile":
        from gsrt.ops.splat_subtile import blend_subtiles
        color, trans = blend_subtiles(
            binning, width=camera.width, height=camera.height,
            sub_w=tw, sub_h=th,
            chunk=min(cfg.pair_chunk, 128),  # this kernel wants 128
            g_cutoff=cfg.g_cutoff, alpha_threshold=cfg.alpha_threshold,
            alpha_clamp=alpha_clamp, interpret=interpret,
            skip_range_check=skip_range, use_exp_lut=cfg.use_exp_lut)
    else:
        from gsrt.ops.splat_packed import blend_packed
        res = blend_packed(
            binning, width=camera.width, height=camera.height,
            sub_w=tw, sub_h=th,
            bs=(group_k * ntx_g if stream == "group" else cfg.blend_bs),
            group_stream=(stream == "group"),
            g_cutoff=cfg.g_cutoff, alpha_threshold=cfg.alpha_threshold,
            alpha_clamp=alpha_clamp, interpret=interpret,
            skip_range_check=skip_range, use_exp_lut=cfg.use_exp_lut,
            track_consumed=serving, scan_impl=cfg.scan_impl,
            track_hits=cfg.exact_hits, math_dtype=cfg.blend_math,
            # serving reads saturation POSITIONS from the consumed map at
            # chunk granularity — large chunks round satpos up to the
            # chunk end and the cull never engages (found by
            # test_static_camera_converges_with_cull when the default
            # chunk went 128 -> 384)
            chunk=min(cfg.pair_chunk, 128) if serving else cfg.pair_chunk)
        res = list(res)
        color, trans = res[0], res[1]
        consumed = res[2] if serving else None
        exact_hit_map = res[-1] if cfg.exact_hits else None

    if cfg.white_background:
        color = color + trans[..., None]

    H, W = camera.height, camera.width
    if cfg.exact_hits and cfg.blend_impl != "subtile" and \
            (tw, th) != (128, 8):
        # exact per-pixel accepted-splat counts from the packed kernel
        hits = exact_hit_map
    else:
        # hit counts not tracked in this kernel; report the tile's pair
        # count for every pixel of the tile (metrics-grade, not exact)
        ntx = -(-W // tw)
        nty = -(-H // th)
        tile_hits = binning.tile_count.reshape(nty, ntx)
        hits = jnp.repeat(jnp.repeat(tile_hits, th, 0), tw, 1)[:H, :W]
    out = RenderOutput(trans=trans, color=color,
                       passes=-(-hits // cfg.k), hits=hits,
                       overflow=binning.overflow)
    if serving:
        return out, ServingAux(tile_start=binning.tile_start,
                               tile_count=binning.tile_count,
                               pair_depth=binning.pair_depth,
                               consumed=consumed)
    return out


def trace_gaussian_rays(cloud: GaussianCloud, origins, dirs,
                        cfg: RenderConfig, colors=None, t_max=None,
                        sh_origin=None):
    """Trace ARBITRARY ray bundles through a Gaussian scene — the k-buffer
    multi-pass algorithm generalized from camera rays to free rays via the
    ray-space response (ops.gaussian.ray_gaussian_response). This is the
    capability the reference's Vulkan RT pipeline has structurally (any ray
    can hit a splat BLAS, hit group 4 — Application.cpp:253-398) but never
    exercises beyond primary rays.

    origins/dirs: [R,3] (dirs need not be normalized — depth is the ray
    parameter t). t_max: optional per-ray [R] upper bound on t (e.g. the
    distance to the nearest surface hit when compositing splats into a
    path tracer's bounce segments); falls back to cfg.t_max.
    colors: per-splat RGB [N,3]; if None, evaluated from the cloud's SH
    with view directions taken from `sh_origin` (a [3] point, standard
    3DGS per-splat convention) or flat DC-only if sh_origin is also None.
    Returns (trans [R], color [R,3], hits [R]).

    Per pass: each ray gathers its k nearest (by t*) splats beyond its depth
    front with alpha above threshold, composites front-to-back, advances the
    front — exactly rgen:47-72 with t* as "depth". O(R·N) per pass, chunked;
    intended for shadow/secondary bundles or moderate N (a BVH-filtered
    version is a roadmap item).
    """
    from gsrt.ops.gaussian import invert_cov3d, ray_gaussian_response

    R = origins.shape[0]
    N = cloud.n
    cov_inv = invert_cov3d(cloud.cov3d)
    if colors is None:
        if sh_origin is not None:
            vdirs = cloud.means - jnp.asarray(sh_origin)[None, :]
            vdirs = vdirs / jnp.maximum(
                jnp.linalg.norm(vdirs, axis=-1, keepdims=True), 1e-9)
            colors = eval_sh(cloud.sh, vdirs,
                             min(cfg.sh_degree, cloud.sh_degree))
        else:
            colors = eval_sh(cloud.sh, jnp.zeros((N, 3)), 0)
    tmax_r = jnp.broadcast_to(
        jnp.asarray(cfg.t_max if t_max is None else t_max, jnp.float32),
        (R,))
    # the k-buffer uses init_depth as the empty-slot sentinel and counts
    # hits as kd < init_depth — depths past it would be silently dropped,
    # so clamp the window to it explicitly
    tmax_r = jnp.minimum(tmax_r, jnp.float32(cfg.init_depth))
    chunk = min(cfg.splat_chunk, max(N, 8))
    (means_p, cov_inv_p, opac_p, colors_p), n_pad = _pad_splats(
        [cloud.means, cov_inv,
         jnp.where(cloud.opacity > cfg.alpha_threshold, cloud.opacity, 0.0),
         colors], N, chunk)
    n_chunks = n_pad // chunk
    init_d = jnp.float32(cfg.init_depth)
    k = cfg.k

    def one_pass(front):
        def body(c, carry):
            kd, ka, kc = carry
            mu = jax.lax.dynamic_slice_in_dim(means_p, c * chunk, chunk)
            ci = jax.lax.dynamic_slice_in_dim(cov_inv_p, c * chunk, chunk)
            op = jax.lax.dynamic_slice_in_dim(opac_p, c * chunk, chunk)
            col = jax.lax.dynamic_slice_in_dim(colors_p, c * chunk, chunk)
            t_star, g = ray_gaussian_response(origins, dirs, mu, ci)
            alpha = op[None, :] * jnp.exp(-g)
            alpha = jnp.minimum(alpha, 0.99)
            valid = ((g <= cfg.g_cutoff) & (alpha > cfg.alpha_threshold)
                     & (t_star > jnp.maximum(front[:, None], cfg.t_min))
                     & (t_star < tmax_r[:, None]))
            cd = jnp.where(valid, t_star, init_d)
            md = jnp.concatenate([kd, cd], -1)
            ma = jnp.concatenate([ka, jnp.where(valid, alpha, 0.0)], -1)
            mc = jnp.concatenate(
                [kc, jnp.broadcast_to(col[None], (R, chunk, 3))], -2)
            neg, idx = jax.lax.top_k(-md, k)
            return (-neg, jnp.take_along_axis(ma, idx, -1),
                    jnp.take_along_axis(mc, idx[..., None], -2))

        kd0 = jnp.full((R, k), init_d)
        ka0 = jnp.zeros((R, k))
        kc0 = jnp.zeros((R, k, 3))
        kd, ka, kc = jax.lax.fori_loop(0, n_chunks, body, (kd0, ka0, kc0))
        count = jnp.sum(kd < init_d, -1).astype(jnp.int32)
        return kd, ka, kc, count

    def cond(state):
        return jnp.logical_not(jnp.all(state[4]))

    def step(state):
        front, trans, color, hits, done = state
        kd, ka, kc, count = one_pass(front)
        new_trans, new_color = composite_color(trans, color, ka, kc, count)
        new_front = advance_depth_front(front, kd, count)
        live = ~done
        trans = jnp.where(live, new_trans, trans)
        color = jnp.where(live[:, None], new_color, color)
        front = jnp.where(live, new_front, front)
        hits = hits + jnp.where(live, count, 0)
        done = done | (count == 0) | (hits >= cfg.max_passes * k)
        return front, trans, color, hits, done

    state = (jnp.zeros(R), jnp.ones(R), jnp.zeros((R, 3)),
             jnp.zeros(R, jnp.int32), jnp.zeros(R, bool))
    front, trans, color, hits, done = jax.lax.while_loop(cond, step, state)
    return trans, color, hits


def count_pairs(cloud: GaussianCloud, camera: Camera,
                cfg: RenderConfig) -> jnp.ndarray:
    """Total (tile, splat) pairs this view generates — used to right-size
    the static pair buffers (the analogue of the reference's fixed
    1000-entry per-warp tables, intersection_table.h:42)."""
    from gsrt.ops.tile_binning import compute_tile_spans
    depth, mean2d, quad, in_front, colors = _precompute(cloud, camera, cfg)
    rx, ry = screen_extents(quad, cfg.conic_mode, cfg.g_cutoff,
                            opacity=cloud.opacity,
                            alpha_threshold=cfg.alpha_threshold)
    alive = in_front & (cloud.opacity > cfg.alpha_threshold)
    *_, touched = compute_tile_spans(
        mean2d[:, 0], mean2d[:, 1], rx, ry, alive,
        camera.width, camera.height, cfg.tile_w, cfg.tile_h)
    return jnp.sum(touched)


def count_pairs_numpy(cloud: GaussianCloud, camera: Camera,
                      cfg: RenderConfig) -> int:
    """Host-side (pure NumPy) replica of `count_pairs` — used for pair-buffer
    sizing without compiling a second jax executable (see calibrate)."""
    import numpy as np
    s = _spans_numpy(cloud, camera, cfg)
    return int(s["touched"].sum())


def count_rows_pairs_numpy(cloud: GaussianCloud, camera: Camera,
                           cfg: RenderConfig) -> tuple[int, int]:
    """Host-side (pairs, tile-row units) under the ellipse span rule —
    sizes span_mode='ellipse' static buffers (tile_binning._build_ellipse;
    the span math mirrors it exactly, incl. the 1e-3 px dilation)."""
    import numpy as np
    s = _spans_numpy(cloud, camera, cfg)
    alive = s["touched"] > 0
    x0, x1, y0, y1 = s["x0"], s["x1"], s["y0"], s["y1"]
    rows = np.where(alive, y1 - y0 + 1, 0).astype(np.int64)
    idx = np.repeat(np.arange(rows.shape[0]), rows)
    off = np.cumsum(rows) - rows
    ty = y0[idx] + (np.arange(idx.shape[0]) - off[idx])
    qa = np.maximum(s["qa"][idx], 1e-12)
    qb, qc = s["qb"][idx], s["qc"][idx]
    det = np.maximum(qa * s["qc"][idx] - qb * qb, 1e-18)
    g = s["g"][idx]
    my, mx = s["py"][idx], s["px"][idx]
    th, tw = cfg.tile_h, cfg.tile_w
    dy_lo = ty * th - my
    dy_hi = dy_lo + (th - 1)
    dy0 = np.clip(0.0, dy_lo, dy_hi)
    wmax = np.sqrt(np.maximum(2.0 * g * qa - det * dy0 * dy0, 0.0)) / qa \
        + 1e-3
    slope = qb / qa
    xc_lo = mx - slope * dy_lo
    xc_hi = mx - slope * dy_hi
    dxmin = np.minimum(xc_lo, xc_hi) - wmax
    dxmax = np.maximum(xc_lo, xc_hi) + wmax
    tx0 = np.clip(np.floor(dxmin / tw), x0[idx], x1[idx])
    tx1 = np.clip(np.floor(dxmax / tw), tx0, x1[idx])
    return int((tx1 - tx0 + 1).sum()), int(rows.sum())


def count_units_numpy(cloud: GaussianCloud, camera: Camera,
                      cfg: RenderConfig, k: int) -> tuple[int, int]:
    """Host-side (pairs, row-group units) for the group-contiguous stream
    (tile_binning._build_group_stream): a unit per k-tile-row band the
    footprint bbox crosses."""
    import numpy as np
    s = _spans_numpy(cloud, camera, cfg)
    alive = s["touched"] > 0
    units = np.where(alive, s["y1"] // k - s["y0"] // k + 1, 0)
    return int(s["touched"].sum()), int(units.sum())


def _spans_numpy(cloud: GaussianCloud, camera: Camera,
                 cfg: RenderConfig) -> dict:
    """Shared NumPy projection + rect tile spans for the host-side pair
    counters (mirrors _precompute + screen_extents + compute_tile_spans)."""
    import numpy as np

    TILE_W, TILE_H = cfg.tile_w, cfg.tile_h
    means = np.asarray(cloud.means)
    cov = np.asarray(cloud.cov3d)
    opacity = np.asarray(cloud.opacity)
    view = np.asarray(camera.view)
    fx, fy = float(camera.fx), float(camera.fy)
    R, t = view[:3, :3], view[:3, 3]
    p = means @ R.T + t
    z = p[:, 2]
    in_front = z > 1e-4
    zs = np.where(in_front, z, 1.0)
    inv_z = 1.0 / zs
    px_c = fx * p[:, 0] * inv_z + float(camera.cx)
    py_c = fy * p[:, 1] * inv_z + float(camera.cy)
    j00 = fx * inv_z
    j02 = -fx * p[:, 0] * inv_z * inv_z
    j11 = fy * inv_z
    j12 = -fy * p[:, 1] * inv_z * inv_z
    t0 = np.stack([j00 * R[0, 0] + j02 * R[2, 0],
                   j00 * R[0, 1] + j02 * R[2, 1],
                   j00 * R[0, 2] + j02 * R[2, 2]], -1)
    t1 = np.stack([j11 * R[1, 0] + j12 * R[2, 0],
                   j11 * R[1, 1] + j12 * R[2, 1],
                   j11 * R[1, 2] + j12 * R[2, 2]], -1)
    sig = np.zeros((means.shape[0], 3, 3), np.float32)
    sig[:, 0, 0], sig[:, 0, 1], sig[:, 0, 2] = cov[:, 0], cov[:, 1], cov[:, 2]
    sig[:, 1, 0], sig[:, 1, 1], sig[:, 1, 2] = cov[:, 1], cov[:, 3], cov[:, 4]
    sig[:, 2, 0], sig[:, 2, 1], sig[:, 2, 2] = cov[:, 2], cov[:, 4], cov[:, 5]
    u = np.einsum("nij,nj->ni", sig, t0)
    v = np.einsum("nij,nj->ni", sig, t1)
    a = np.sum(t0 * u, -1) + cfg.cov2d_dilation
    b = np.sum(t1 * u, -1)
    c = np.sum(t1 * v, -1) + cfg.cov2d_dilation
    det = a * c - b * b
    if cfg.conic_mode == "standard":
        in_front &= det > 1e-12
        dq = np.maximum(det, 1e-12)
        qa, qb, qc = c / dq, -b / dq, a / dq
    else:
        qa, qb, qc = a, b, c
    qdet = np.maximum(qa * qc - qb * qb, 1e-18)
    g = np.minimum(cfg.g_cutoff,
                   np.maximum(np.log(np.maximum(
                       opacity / cfg.alpha_threshold, 1e-6)), 0.0))
    rx = np.sqrt(np.maximum(2.0 * g * qc / qdet, 0.0))
    ry = np.sqrt(np.maximum(2.0 * g * qa / qdet, 0.0))
    alive = in_front & (opacity > cfg.alpha_threshold) & (rx > 0) & (ry > 0)
    W, H = camera.width, camera.height
    ntx, nty = -(-W // TILE_W), -(-H // TILE_H)
    x0 = np.clip(np.floor((px_c - rx) / TILE_W), 0, ntx - 1)
    x1 = np.clip(np.floor((px_c + rx) / TILE_W), 0, ntx - 1)
    y0 = np.clip(np.floor((py_c - ry) / TILE_H), 0, nty - 1)
    y1 = np.clip(np.floor((py_c + ry) / TILE_H), 0, nty - 1)
    on = ((px_c + rx >= 0) & (px_c - rx < W) &
          (py_c + ry >= 0) & (py_c - ry < H))
    touched = np.where(alive & on, (x1 - x0 + 1) * (y1 - y0 + 1), 0)
    return dict(px=px_c, py=py_c, qa=qa, qb=qb, qc=qc, g=g,
                x0=x0.astype(np.int64), x1=x1.astype(np.int64),
                y0=y0.astype(np.int64), y1=y1.astype(np.int64),
                touched=touched.astype(np.int64))


def pair_bucket(need: int) -> int:
    """Round a pair count up to a (k/8)·2^j bucket (≤12.5% slack), then to
    the 128-lane chunk grid. Every binning stage scales with the STATIC
    buffer size, so loose buckets directly cost frame time; pow-2-ish
    bucketing keeps recompiles rare under camera motion."""
    need = max(1 << 14, need)
    p = 1 << (need - 1).bit_length()
    step = max(p // 8, 128)
    mp = -(-need // step) * step
    return -(-mp // 128) * 128


class GaussianRayTracer:
    """Convenience wrapper choosing the execution path and jitting it.

    In "tiled" mode the static pair-buffer size is auto-calibrated on the
    first call (and re-calibrated if a later frame overflows the bucket):
    max_pairs = next power of two ≥ 1.2 × the view's true pair count.
    Pow-2 bucketing keeps recompiles rare under camera motion.
    """

    def __init__(self, cfg: RenderConfig, mode: str = "fast",
                 max_pairs: Optional[int] = None, interpret: bool = False,
                 defer_overflow: int = 0):
        self.cfg = cfg
        self.mode = mode
        self.max_pairs = max_pairs
        self.max_rows = None       # sized by calibrate() in ellipse mode
        self.interpret = interpret  # run the Pallas kernel interpreted (CPU)
        # defer_overflow=N>0: check frame i's overflow flag at frame i+N
        # instead of synchronously — keeps N frames in flight (the sync
        # read costs a ~30 ms tunnel round-trip per frame on axon). An
        # overflowing frame is then served truncated and the buffer
        # re-buckets up to N frames late; use 0 (sync re-render) when
        # every frame must be exact.
        self.defer_overflow = defer_overflow
        self._overflow_pending: list = []
        self._tiled_cache: dict[int, callable] = {}
        self._fm_src = None        # cloud object the cached FMCloud mirrors
        self._fm: Optional[FMCloud] = None
        if mode != "tiled":
            fn = functools.partial(
                {"fast": render_fast, "reference": render_reference}[mode],
                cfg=cfg)
            self._render = jax.jit(fn)

    def _tiled_fn(self, mp: int):
        key = (mp, self.max_rows)
        if key not in self._tiled_cache:
            self._tiled_cache[key] = jax.jit(functools.partial(
                render_tiled, cfg=self.cfg, max_pairs=mp,
                max_rows=self.max_rows, interpret=self.interpret))
        return self._tiled_cache[key]

    def calibrate(self, cloud: GaussianCloud, camera: Camera) -> int:
        # Pure-NumPy pair count: running ANY other sizable jax executable
        # (TPU or CPU backend) in the same process makes re-execution of the
        # render program fail with InvalidArgument on the axon TPU runtime,
        # so sizing must not go through jax at all.
        ellipse = (self.cfg.span_mode == "ellipse"
                   and -(-camera.height // self.cfg.tile_h) <= 255)
        # group-stream eligibility must mirror render_tiled's gating, or
        # the unit buffer would stay unsized (falling back to a fat
        # max_pairs-sized level-1 buffer)
        from gsrt.ops.tile_binning import group_rows_k
        ntx = -(-camera.width // self.cfg.tile_w)
        group_k = group_rows_k(ntx)
        group = (self.cfg.stream == "group" and not ellipse
                 and self.cfg.payload == "compact"
                 and self.cfg.blend_impl == "packed"
                 and self.cfg.scan_impl == "logmm"
                 and self.cfg.span_mode == "rect"
                 and ntx <= 127 and group_k is not None
                 and (self.cfg.tile_w, self.cfg.tile_h) != (128, 8))
        if ellipse:   # must mirror render_tiled's rect fallback exactly,
                      # or rect-mode pair counts permanently overflow the
                      # ellipse-sized bucket
            total, rows = count_rows_pairs_numpy(cloud, camera, self.cfg)
            self.max_rows = pair_bucket(int(rows * 1.1))
        elif group:
            total, units = count_units_numpy(cloud, camera, self.cfg,
                                             group_k)
            self.max_rows = pair_bucket(int(units * 1.1))
        else:
            total = int(count_pairs_numpy(cloud, camera, self.cfg))
            self.max_rows = None
        # 10% slack + overflow re-render (below) beats fat safety margins
        self.max_pairs = pair_bucket(int(total * 1.1))
        return self.max_pairs

    def __call__(self, cloud: GaussianCloud, camera: Camera) -> RenderOutput:
        if self.mode != "tiled":
            return self._render(cloud, camera)
        if self.max_pairs is None:
            self.calibrate(cloud, camera)
        # relayout to feature-major ONCE per scene, outside the frame jit
        # (the [N,3]/[N,K,3] padded layouts cost ~65 ms/frame at 1M splats)
        if self._fm_src is not cloud:
            self._fm = fm_from_cloud(cloud)
            self._fm_src = cloud
        out = self._tiled_fn(self.max_pairs)(self._fm, camera)
        # a frame past the calibration slack (camera zoom, scene growth)
        # silently truncates the farthest pairs — re-calibrate and re-render
        # (or, with defer_overflow, re-calibrate a few frames late)
        if self.defer_overflow > 0:
            self._overflow_pending.append(out.overflow)
            # pop only when a flag is defer_overflow frames OLD — popping
            # at == depth would sync on the just-dispatched frame
            if len(self._overflow_pending) > self.defer_overflow:
                if bool(self._overflow_pending.pop(0)):
                    self.calibrate(cloud, camera)
                    out = self._tiled_fn(self.max_pairs)(self._fm, camera)
                    self._overflow_pending.clear()
        elif out.overflow is not None and bool(out.overflow):
            self.calibrate(cloud, camera)
            out = self._tiled_fn(self.max_pairs)(self._fm, camera)
        return out
