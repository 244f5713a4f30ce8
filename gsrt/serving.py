"""Temporal-reuse serving: frame-coherent 3DGS rendering for video/orbit.

The reference application is interactive — ModelViewController orbits and
flies a camera and re-renders every frame from scratch
(RayTracingInVulkan/src/ModelViewController.cpp, Application.cpp render
loop). gsrt's serving path exploits what that loop wastes: consecutive
frames see nearly the same splats, and a front-to-back blender only ever
*needs* pairs up to each tile's saturation depth.

Mechanism (all device-side, one jitted step per frame):

  1. The packed blend kernel tracks, per 16x16 tile, the first pair chunk
     at which the whole tile was saturated (transmittance < term_eps) —
     `track_consumed` in gsrt.ops.splat_packed.
  2. `update_cutoff_map` turns that into a per-tile DEPTH cutoff: the
     camera depth of the pair at `margin x consumed` (+ a small floor),
     read from the pair-depth row the tile sort carries in serving mode.
     Unsaturated tiles keep cutoff = +inf (cull nothing).
  3. The next frame's binning drops whole splats that lie beyond the
     cutoff of every tile their footprint touches — conservatively, via
     an 8x8-tile supertile max of the cutoff map (ops.tile_binning.
     cutoff_cull). Fewer pairs -> every pair-linear stage (expand, tile
     sort, blend) shrinks; `ServingRenderer` re-buckets the static pair
     buffer once the culled total settles.

Self-correction: a tile that had a finite cutoff but did NOT saturate
this frame may have lost content it needed — its cutoff resets to +inf
(full depth range next frame) and the frame is counted as a violation;
`strict=True` re-renders such frames uncull-ed so served output is never
degraded. A static camera therefore converges to exact images at the
culled cost; a moving camera pays margin-sized slack.

No reference-counterpart citation is possible for the reuse itself (the
reference re-traces every frame); the workload it accelerates is the
reference's interactive orbit (ModelViewController.cpp:60-120 orbit
state) rendered offline via gsrt.scene.campath.
"""

from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp

from gsrt.core.config import RenderConfig
from gsrt.core.types import Camera, GaussianCloud
from gsrt.models.gaussian_rt import (FMCloud, RenderOutput, ServingAux,
                                     count_pairs_numpy, fm_from_cloud,
                                     pair_bucket, render_tiled)
from gsrt.ops.tile_binning import tile_extent


def update_cutoff_map(aux: ServingAux, trans: jnp.ndarray,
                      old_map: jnp.ndarray, *, width: int, height: int,
                      tile_w: int, tile_h: int, bs: int,
                      term_eps: float = 1e-4, margin: float = 1.5,
                      floor_pairs: int = 32, chunk: int = 128):
    """Fold one frame's saturation feedback into the per-tile depth-cutoff
    map. Returns (new_map [T] f32, violation [T] bool).

    Policy per tile:
      * saturated and the margin'd pair budget fits strictly inside the
        tile's (already culled) segment -> tighten to the budget's depth;
      * saturated otherwise -> keep the old cutoff (it was sufficient);
      * not saturated -> +inf; if the old cutoff was finite this frame
        may have been degraded -> violation flag.
    """
    ntx, nty = tile_extent(width, height, tile_w, tile_h)
    T = ntx * nty
    ts = aux.tile_start
    counts = aux.tile_count

    pad_y, pad_x = nty * tile_h - height, ntx * tile_w - width
    tr = jnp.pad(trans, ((0, pad_y), (0, pad_x)))
    tile_trans = tr.reshape(nty, tile_h, ntx, tile_w).max((1, 3)).reshape(-1)
    saturated = tile_trans < term_eps

    cw = chunk                                # kernel chunk width (lanes)
    sat = aux.consumed.reshape(-1)[:T]        # first saturated chunk index
    grp = jnp.arange(T, dtype=jnp.int32) // bs
    astart = (ts[grp * bs] // cw) * cw                    # group chunk base
    end_g = ts[jnp.minimum((grp + 1) * bs, T)]
    total_chunks = -(-(end_g - astart) // cw)
    sat_hit = sat < total_chunks              # == total_chunks -> never
    satpos = jnp.where(sat_hit, astart + sat * cw, ts[1:T + 1])
    n_used = jnp.clip(satpos - ts[:T], 0, counts)
    target = jnp.minimum(
        (margin * n_used).astype(jnp.int32) + floor_pairs, counts)
    tighten = saturated & sat_hit & (target < counts)
    idx = jnp.clip(ts[:T] + target - 1, 0, aux.pair_depth.shape[0] - 1)
    tight_depth = aux.pair_depth[idx]
    new_map = jnp.where(tighten, tight_depth,
                        jnp.where(saturated, old_map, jnp.inf))
    violation = (~saturated) & jnp.isfinite(old_map)
    return new_map, violation


def _serving_step(fm: FMCloud, camera: Camera, cutoff_map, cfg: RenderConfig,
                  max_pairs: int, margin: float, floor_pairs: int,
                  interpret: bool, use_cull: bool):
    """One serving frame. Returns (out, new_map, scalars[4]) where scalars
    = [violations, culled pair total, overflow, finite-cutoff tile count]
    — ONE int32 vector so the host pays a single fetch round-trip (the
    axon tunnel costs ~30 ms per device->host read; three separate scalar
    reads measured +90 ms/frame). use_cull=False still tracks saturation
    (serving=True) but skips the cutoff_cull pass — used while the map has
    no finite entries, where culling can't drop anything."""
    out, aux = render_tiled(fm, camera, cfg, max_pairs=max_pairs,
                            interpret=interpret,
                            cutoff_map=cutoff_map if use_cull else None,
                            serving=True)
    new_map, violation = update_cutoff_map(
        aux, out.trans, cutoff_map,
        width=camera.width, height=camera.height,
        tile_w=cfg.tile_w, tile_h=cfg.tile_h, bs=cfg.blend_bs,
        chunk=min(cfg.pair_chunk, 128),  # must match render_tiled's
                                         # serving-mode kernel chunk
        term_eps=1e-4, margin=margin, floor_pairs=floor_pairs)
    scalars = jnp.stack([
        # violations only mean "a culled frame degraded" — without the
        # cull pass nothing was dropped, so don't report drain-lag noise
        (jnp.sum(violation) if use_cull else jnp.zeros((), jnp.int32)
         ).astype(jnp.int32),
        jnp.sum(aux.tile_count),
        out.overflow.astype(jnp.int32),
        jnp.sum(jnp.isfinite(new_map)).astype(jnp.int32)])
    return out, new_map, scalars


class ServingRenderer:
    """Stateful frame-sequence renderer with temporal pair culling.

    Usage:
        srv = ServingRenderer(cfg)
        for camera in path:
            out = srv(cloud, camera)
        srv.finish()   # drain the dispatch pipeline
        srv.stats      # list of per-frame dicts (ms, pairs, violations, ...)

    The default mode PIPELINES: frames are dispatched asynchronously and
    each frame's stats scalars are fetched `pipeline_depth` frames later,
    so the per-frame tunnel round-trip (~30 ms on axon) overlaps with
    compute. The cutoff-map feedback chains device-side, so culling is
    never stale — only the host's *reactions* (overflow re-bucketing,
    buffer shrinking, cull enablement) lag by up to `pipeline_depth`
    frames, after which they self-correct.

    strict=True forces pipeline_depth=1 (full sync per frame) and
    re-renders any frame whose cull proved too aggressive (violations >
    0) with culling disabled — served images are then guaranteed
    un-degraded at the cost of an occasional double render.
    """

    SHRINK_PATIENCE = 3     # frames of consistently smaller pair totals
    SHRINK_HEADROOM = 1.35  # before the static buffer re-buckets

    def __init__(self, cfg: RenderConfig, max_pairs: Optional[int] = None,
                 margin: float = 1.5, floor_pairs: int = 32,
                 strict: bool = False, interpret: bool = False,
                 pipeline_depth: int = 4):
        self.cfg = cfg
        self.max_pairs = max_pairs
        self.margin = margin
        self.floor_pairs = floor_pairs
        self.strict = strict
        self.interpret = interpret
        self.pipeline_depth = 1 if strict else max(1, pipeline_depth)
        self.cutoff_map: Optional[jnp.ndarray] = None
        self.stats: list[dict] = []
        self._cache: dict = {}
        self._fm_src = None
        self._fm: Optional[FMCloud] = None
        self._shrink_run = 0
        self._use_cull = False      # no finite cutoffs yet -> skip the cull
        self._pending: list = []    # (stats dict, scalars device array)

    def _fn(self, mp: int, use_cull: bool):
        key = (mp, use_cull)
        if key not in self._cache:
            self._cache[key] = jax.jit(functools.partial(
                _serving_step, cfg=self.cfg, max_pairs=mp,
                margin=self.margin, floor_pairs=self.floor_pairs,
                interpret=self.interpret, use_cull=use_cull))
        return self._cache[key]

    def _tiles(self, camera: Camera) -> int:
        ntx, nty = tile_extent(camera.width, camera.height,
                               self.cfg.tile_w, self.cfg.tile_h)
        return ntx * nty

    def reset(self):
        """Drop temporal state (scene cut / teleport)."""
        self.finish()
        self.cutoff_map = None
        self._shrink_run = 0
        self._use_cull = False

    def calibrate(self, cloud: GaussianCloud, camera: Camera) -> int:
        total = int(count_pairs_numpy(cloud, camera, self.cfg))
        self.max_pairs = pair_bucket(int(total * 1.1))
        return self.max_pairs

    def _drain_one(self):
        rec, scalars = self._pending.pop(0)
        # ONE transfer: iterating a device array would issue a sliced
        # device->host read per element (~30 ms each through the tunnel)
        nviol, total, overflow, n_finite = map(int, jax.device_get(scalars))
        rec.update(violations=nviol, pairs=total, overflow=bool(overflow))
        self._use_cull = n_finite > 0
        if overflow:
            # the camera outgrew the pair bucket up to pipeline_depth
            # frames ago; re-bucket for future frames (strict mode, depth
            # 1, re-renders the current frame below)
            self.max_pairs = pair_bucket(int(total * 1.3))
            self._shrink_run = 0
        elif total * self.SHRINK_HEADROOM < self.max_pairs:
            # re-bucket the static buffer once the culled total settles
            self._shrink_run += 1
            if self._shrink_run >= self.SHRINK_PATIENCE:
                self.max_pairs = pair_bucket(int(total * 1.15))
                self._shrink_run = 0
        else:
            self._shrink_run = 0
        return rec

    def finish(self):
        """Drain pending frames' stats (end of a path / before reading
        self.stats)."""
        while self._pending:
            self._drain_one()

    def __call__(self, cloud: GaussianCloud, camera: Camera) -> RenderOutput:
        if self.max_pairs is None:
            self.calibrate(cloud, camera)
        if self._fm_src is not cloud:
            self._fm = fm_from_cloud(cloud)
            self._fm_src = cloud
            self.reset()
        T = self._tiles(camera)
        if self.cutoff_map is None or self.cutoff_map.shape[0] != T:
            self.finish()
            self.cutoff_map = jnp.full((T,), jnp.inf, jnp.float32)
            # all-inf map can cull nothing — don't pay the cull pass (or
            # compile the use_cull variant) until cutoffs turn finite
            self._use_cull = False

        t0 = time.perf_counter()
        used_cull = self._use_cull
        out, new_map, scalars = self._fn(self.max_pairs, used_cull)(
            self._fm, camera, self.cutoff_map)
        self.cutoff_map = new_map
        rec = dict(max_pairs=self.max_pairs, cull=used_cull,
                   full_renders=0)
        self._pending.append((rec, scalars))
        self.stats.append(rec)
        if len(self._pending) >= self.pipeline_depth:
            drained = self._drain_one()
            if self.strict and drained is rec:        # depth 1: this frame
                if drained["overflow"] or (used_cull
                                           and drained["violations"] > 0):
                    # serve an exact, cull-free frame at the (possibly
                    # re-bucketed) buffer size; keep the self-corrected
                    # map for the next frame
                    nocull = jnp.full((T,), jnp.inf, jnp.float32)
                    out, _, s2 = self._fn(self.max_pairs, False)(
                        self._fm, camera, nocull)
                    s2h = jax.device_get(s2)          # one transfer
                    if bool(s2h[2]):                  # still overflowing
                        self.max_pairs = pair_bucket(int(s2h[1]) * 2)
                        out, _, _ = self._fn(self.max_pairs, False)(
                            self._fm, camera, nocull)
                    rec["full_renders"] += 1
        rec["ms"] = (time.perf_counter() - t0) * 1e3
        return out
