"""Screen-tile binned PRIMARY-ray triangle casting.

The splat path's thesis (tile_binning.py) applied to triangle meshes: a
camera ray's candidate set is exactly the triangles whose projected AABB
covers its pixel, so instead of per-ray BVH traversal (the reference's
traceRay stack machine, vulkan_ray_tracing.cc:422-1171) we bin projected
triangle rects to screen tiles with one global sort and run a dense
closest-hit Pallas kernel per tile segment. Closest-hit is EASIER than
splat blending: min-folding is order-free (no transmittance scan), and
depth-sorting the pairs (by nearest-vertex camera z) restores the
early-exit a BVH gets from t-ordering — once every pixel of a tile has a
hit nearer than a chunk's minimum possible t, the remaining chunks are
skipped (the rasterizer-with-z-prepass shape, TPU-native).

Scope: PRIMARY bundles (one ray per pixel, shared origin — aperture-free
camera rays). Secondary bounces keep the packed-cluster traversal
(ops.tri_kernel); any-hit alpha cutout stays on the brute path.

Payload (f32 rows, depth-grouped by tile like the splat payload):
  0-2 v0.xyz  3-5 e1.xyz  6-8 e2.xyz  9 triangle id (int32 bitcast)
  10 zmin (nearest-vertex camera z — the early-exit key)  11-15 pad
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsrt.ops.tile_binning import TileBinning, tile_extent

TRI_PAY = 16   # payload rows (11 used, padded to two sublane tiles)
_MAX_CAST_CHUNK = 512  # cast_primary chunk ceiling the payload pad covers
_INF = 3.4e38            # python literals: jnp scalars would be
_ID_SENTINEL = 0x7FFFFFFF  # captured as consts by pallas_call


def build_tri_binning(v0, v1, v2, camera, *, tile_w: int, tile_h: int,
                      max_pairs: int, chunk: int = 128,
                      jitter_pad: float = 1.0, span_exact: bool = False,
                      max_rows: int | None = None) -> TileBinning:
    """Bin triangles into per-tile pair lists, near-depth-sorted.

    v0/v1/v2: [N, 3] world-space vertices. Returns a TileBinning whose
    payload follows the TRI_PAY layout (tile_start/tile_count as usual).
    Triangles crossing the near plane get a full-screen rect
    (conservative; rare for closed scenes). jitter_pad widens rects so
    sub-pixel jittered rays stay covered.

    span_exact=True: two-level expansion with EXACT per-tile-row x-spans
    (the rasterizer's scanline clip — projected triangle edges are
    straight lines, so the x-extent over a row's y-band is attained at
    in-band vertices or edge/band intersections, in closed form). Large
    diagonal triangles cover ~half their AABB rect; the exact spans drop
    those pairs with a bit-identical image (skipped tiles contain no
    covered sample). Requires nty <= 255; max_rows sizes the row table
    (defaults to max_pairs — rows <= pairs always).
    """
    W, H = camera.width, camera.height
    ntx, nty = tile_extent(W, H, tile_w, tile_h)
    T = ntx * nty
    N = v0.shape[0]
    R = camera.view[:3, :3]
    tr = camera.view[:3, 3]

    def proj(v):
        p = v @ R.T + tr
        z = p[:, 2]
        zs = jnp.where(z > 1e-4, z, 1.0)
        px = camera.fx * p[:, 0] / zs + camera.cx
        py = camera.fy * p[:, 1] / zs + camera.cy
        return px, py, z

    x_a, y_a, z_a = proj(v0)
    x_b, y_b, z_b = proj(v1)
    x_c, y_c, z_c = proj(v2)
    zmin = jnp.minimum(jnp.minimum(z_a, z_b), z_c)
    zmax = jnp.maximum(jnp.maximum(z_a, z_b), z_c)
    behind = zmin <= 1e-4                      # crosses/behind near plane
    alive = zmax > 1e-4                        # fully-behind triangles die

    xmin = jnp.minimum(jnp.minimum(x_a, x_b), x_c) - jitter_pad
    xmax = jnp.maximum(jnp.maximum(x_a, x_b), x_c) + jitter_pad
    ymin = jnp.minimum(jnp.minimum(y_a, y_b), y_c) - jitter_pad
    ymax = jnp.maximum(jnp.maximum(y_a, y_b), y_c) + jitter_pad
    # near-plane crossers cover everything their visible part might
    xmin = jnp.where(behind, 0.0, xmin)
    xmax = jnp.where(behind, jnp.float32(W), xmax)
    ymin = jnp.where(behind, 0.0, ymin)
    ymax = jnp.where(behind, jnp.float32(H), ymax)

    on_screen = (xmax >= 0) & (xmin < W) & (ymax >= 0) & (ymin < H)
    alive = alive & on_screen
    x0 = jnp.clip(jnp.floor(xmin / tile_w), 0, ntx - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor(xmax / tile_w), 0, ntx - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(ymin / tile_h), 0, nty - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor(ymax / tile_h), 0, nty - 1).astype(jnp.int32)
    touched = jnp.where(alive, (x1 - x0 + 1) * (y1 - y0 + 1), 0)

    from gsrt.ops.tile_binning import tile_histogram

    # near-depth carry-sort: the early-exit needs chunks in ascending zmin
    key = jnp.where(touched > 0, zmin, jnp.inf)
    rows_n = jnp.where(touched > 0, y1 - y0 + 1, 0) if span_exact else 0
    if span_exact:
        assert nty <= 255, "exact spans pack the tile-row count in 8 bits"
    xy0 = x0 | (y0 << 12) | (rows_n << 24)
    wspan_touch = ((x1 - x0 + 1) << 20) | touched
    e1 = v1 - v0
    e2 = v2 - v0
    carry = jax.lax.sort(
        (key, xy0, wspan_touch,
         v0[:, 0], v0[:, 1], v0[:, 2],
         e1[:, 0], e1[:, 1], e1[:, 2],
         e2[:, 0], e2[:, 1], e2[:, 2],
         jnp.arange(N, dtype=jnp.int32)),
        num_keys=1, is_stable=False)
    (zmin_s, xy0, wspan_touch, p0x, p0y, p0z, e1x, e1y, e1z,
     e2x, e2y, e2z, tid) = carry
    x0s = xy0 & 0xFFF
    y0s = (xy0 >> 12) & 0xFFF
    w_span = jnp.maximum(wspan_touch >> 20, 1)
    touched_s = wspan_touch & 0xFFFFF
    from gsrt.ops.pair_expand import _DEAD_BASE
    bi = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
    zmin_f = jnp.where(jnp.isfinite(zmin_s), zmin_s, _INF)

    if span_exact:
        # --- level 1: expand triangles -> tile-row units, exact x-spans ---
        if max_rows is None:
            max_rows = max_pairs
        rows_s = jnp.where(touched_s > 0, (xy0 >> 24) & 0xFF, 0)
        x1s = x0s + w_span - 1
        row_off = jnp.cumsum(rows_s)
        rows_total = row_off[-1]
        row_base = jnp.where(rows_s > 0, row_off - rows_s, _DEAD_BASE)
        xgeo = x0s | (x1s << 12) | (y0s << 24)
        tab1 = jnp.stack(
            [bi(xgeo), bi(row_base), p0x, p0y, p0z, e1x, e1y, e1z,
             e2x, e2y, e2z, bi(tid), zmin_f], axis=-1)     # [N, 13]
        rr = jnp.repeat(tab1, rows_s, axis=0,
                        total_repeat_length=max_rows)      # [MR, 13]
        rgeo = jax.lax.bitcast_convert_type(rr[:, 0], jnp.int32)
        rbase = jax.lax.bitcast_convert_type(rr[:, 1], jnp.int32)
        rx0, rx1 = rgeo & 0xFFF, (rgeo >> 12) & 0xFFF
        ry0 = (rgeo >> 24) & 0xFF
        rslot = jnp.arange(max_rows, dtype=jnp.int32)
        rvalid = rslot < jnp.minimum(rows_total, max_rows)
        ty_r = ry0 + (rslot - rbase)

        # re-project the verts (cheap f32; avoids 6 extra sort operands)
        pv0 = rr[:, 2:5]
        pv1 = pv0 + rr[:, 5:8]
        pv2 = pv0 + rr[:, 8:11]
        xa_r, ya_r, za_r = proj(pv0)
        xb_r, yb_r, zb_r = proj(pv1)
        xc_r, yc_r, zc_r = proj(pv2)
        behind_r = jnp.minimum(jnp.minimum(za_r, zb_r), zc_r) <= 1e-4

        yb0 = ty_r.astype(jnp.float32) * tile_h - jitter_pad
        yb1 = yb0 + (tile_h - 1) + 2 * jitter_pad
        big = jnp.float32(1e30)
        xmn = jnp.full((max_rows,), big)
        xmx = jnp.full((max_rows,), -big)
        verts = [(xa_r, ya_r), (xb_r, yb_r), (xc_r, yc_r)]
        for xv, yv in verts:
            inb = (yv >= yb0) & (yv <= yb1)
            xmn = jnp.minimum(xmn, jnp.where(inb, xv, big))
            xmx = jnp.maximum(xmx, jnp.where(inb, xv, -big))
        for (xA, yA), (xB, yB) in ((verts[0], verts[1]),
                                   (verts[1], verts[2]),
                                   (verts[2], verts[0])):
            dy = yB - yA
            dy_s = jnp.where(jnp.abs(dy) > 1e-12, dy, 1e-12)
            for yb in (yb0, yb1):
                t = (yb - yA) / dy_s
                ok = (jnp.abs(dy) > 1e-12) & (t >= 0.0) & (t <= 1.0)
                xi = xA + t * (xB - xA)
                xmn = jnp.minimum(xmn, jnp.where(ok, xi, big))
                xmx = jnp.maximum(xmx, jnp.where(ok, xi, -big))
        # behind-camera / empty-band rows fall back to the (conservative)
        # rect span; the clip below also guarantees span >= 1
        usable = rvalid & ~behind_r & (xmn <= xmx)
        tx0 = jnp.clip(jnp.floor((xmn - jitter_pad) / tile_w
                                 ).astype(jnp.int32), rx0, rx1)
        tx1 = jnp.clip(jnp.floor((xmx + jitter_pad) / tile_w
                                 ).astype(jnp.int32), tx0, rx1)
        tx0 = jnp.where(usable, tx0, rx0)
        tx1 = jnp.where(usable, tx1, rx1)
        span = jnp.where(rvalid, tx1 - tx0 + 1, 0)

        counts = tile_histogram(tx0, tx1, ty_r, ty_r, span > 0,
                                ntx, nty).reshape(T)
        total = jnp.sum(span)
        overflow = (rows_total > max_rows) | (total > max_pairs)
        tile_start = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)])
        tile_start = jnp.minimum(tile_start,
                                 jnp.minimum(total, max_pairs))
        pair_off = jnp.cumsum(span)
        base = jnp.where(span > 0, pair_off - span, _DEAD_BASE)
        # rebind UNITS = rows for the shared level-2 section
        x0s, y0s, w_span, touched_s = (tx0, ty_r, jnp.maximum(span, 1),
                                       span)
        p0x, p0y, p0z = rr[:, 2], rr[:, 3], rr[:, 4]
        e1x, e1y, e1z = rr[:, 5], rr[:, 6], rr[:, 7]
        e2x, e2y, e2z = rr[:, 8], rr[:, 9], rr[:, 10]
        tidf, zmin_f = rr[:, 11], jnp.where(rvalid, rr[:, 12], _INF)
    else:
        counts = tile_histogram(x0, x1, y0, y1, touched > 0,
                                ntx, nty).reshape(T)
        total = jnp.sum(touched)
        overflow = total > max_pairs
        tile_start = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)])
        tile_start = jnp.minimum(tile_start,
                                 jnp.minimum(total, max_pairs))
        offsets = jnp.cumsum(touched_s)
        base = jnp.where(touched_s > 0, offsets - touched_s, _DEAD_BASE)
        tidf = bi(tid)

    tab = jnp.stack(
        [bi(jnp.stack([x0s, y0s, w_span, base], -1))[:, i]
         for i in range(4)]
        + [p0x, p0y, p0z, e1x, e1y, e1z, e2x, e2y, e2z, tidf,
           zmin_f], axis=-1)
    rows = jnp.repeat(tab, touched_s, axis=0,
                      total_repeat_length=max_pairs)       # [MP, 15]
    geom = jax.lax.bitcast_convert_type(rows[:, :4], jnp.int32)
    gx0, gy0, gw, gbase = geom[:, 0], geom[:, 1], geom[:, 2], geom[:, 3]

    slots = jnp.arange(max_pairs, dtype=jnp.int32)
    valid = slots < jnp.minimum(total, max_pairs)
    rank = slots - gbase
    tx = gx0 + rank % gw
    ty = gy0 + rank // gw
    tile = jnp.where(valid, ty * ntx + tx, T).astype(jnp.int32)

    feats = [rows[:, 4 + i] for i in range(11)]            # 9 geom, id, zmin
    sorted_ops = jax.lax.sort((tile,) + tuple(feats), num_keys=1,
                              is_stable=True)
    tile_s = sorted_ops[0]
    feats_s = list(sorted_ops[1:])

    dead = tile_s >= T
    # pad for the cast kernel's aligned over-fetch window: support any
    # cast-side chunk up to _MAX_CAST_CHUNK regardless of the build-side
    # chunk (the two are otherwise uncoupled; a larger cast window than
    # this pad would DMA past the payload end)
    pad = max(chunk, _MAX_CAST_CHUNK) + 128
    # dead lanes: id = sentinel, zmin = +INF (inert in min folds), geometry
    # degenerate (zero edges -> det 0 -> rejected)
    feats_s = [jnp.where(dead, 0.0, f) for f in feats_s[:9]] + \
        [jnp.where(dead, jax.lax.bitcast_convert_type(
            jnp.int32(_ID_SENTINEL), jnp.float32),
                   feats_s[9]),
         jnp.where(dead, _INF, feats_s[10])]
    payload = jnp.stack(
        feats_s + [jnp.zeros_like(tile_s, jnp.float32)] * (TRI_PAY - 11),
        axis=0)
    tail = jnp.concatenate([
        jnp.zeros((9, pad), jnp.float32),
        jnp.broadcast_to(jax.lax.bitcast_convert_type(
            jnp.int32(_ID_SENTINEL), jnp.float32), (1, pad)),
        jnp.full((1, pad), _INF),
        jnp.zeros((TRI_PAY - 11, pad), jnp.float32)], axis=0)
    payload = jnp.concatenate([payload, tail], axis=1)

    return TileBinning(payload=payload, tile_start=tile_start,
                       tile_count=counts,
                       total_pairs=total.astype(jnp.int32),
                       overflow=overflow)


def count_tri_pairs_numpy(v0, v1, v2, camera, *, tile_w: int, tile_h: int,
                          jitter_pad: float = 1.0,
                          span_exact: bool = False) -> int:
    """Host-side (pure NumPy) replica of build_tri_binning's pair count —
    sizes the static pair buffer without compiling a second jax
    executable (the count_pairs_numpy pattern, gaussian_rt.py).
    span_exact mirrors the scanline-clip row spans (same math, f64 —
    counts may differ by the odd floor at a tile boundary; size with
    slack)."""
    import numpy as np
    W, H = camera.width, camera.height
    ntx, nty = tile_extent(W, H, tile_w, tile_h)
    view = np.asarray(camera.view)
    R, tr = view[:3, :3], view[:3, 3]
    fx, fy = float(camera.fx), float(camera.fy)
    cx, cy = float(camera.cx), float(camera.cy)

    def proj(v):
        p = np.asarray(v) @ R.T + tr
        z = p[:, 2]
        zs = np.where(z > 1e-4, z, 1.0)
        return (fx * p[:, 0] / zs + cx, fy * p[:, 1] / zs + cy, z)

    xa, ya, za = proj(v0)
    xb, yb, zb = proj(v1)
    xc, yc, zc = proj(v2)
    zmin = np.minimum(np.minimum(za, zb), zc)
    zmax = np.maximum(np.maximum(za, zb), zc)
    behind = zmin <= 1e-4
    alive = zmax > 1e-4
    xmin = np.minimum(np.minimum(xa, xb), xc) - jitter_pad
    xmax = np.maximum(np.maximum(xa, xb), xc) + jitter_pad
    ymin = np.minimum(np.minimum(ya, yb), yc) - jitter_pad
    ymax = np.maximum(np.maximum(ya, yb), yc) + jitter_pad
    xmin = np.where(behind, 0.0, xmin)
    xmax = np.where(behind, float(W), xmax)
    ymin = np.where(behind, 0.0, ymin)
    ymax = np.where(behind, float(H), ymax)
    alive &= (xmax >= 0) & (xmin < W) & (ymax >= 0) & (ymin < H)
    x0 = np.clip(np.floor(xmin / tile_w), 0, ntx - 1).astype(np.int64)
    x1 = np.clip(np.floor(xmax / tile_w), 0, ntx - 1).astype(np.int64)
    y0 = np.clip(np.floor(ymin / tile_h), 0, nty - 1).astype(np.int64)
    y1 = np.clip(np.floor(ymax / tile_h), 0, nty - 1).astype(np.int64)
    if not span_exact:
        return int(np.where(alive,
                            (x1 - x0 + 1) * (y1 - y0 + 1), 0).sum())

    rows = np.where(alive, y1 - y0 + 1, 0)
    idx = np.repeat(np.arange(rows.shape[0]), rows)
    off = np.cumsum(rows) - rows
    ty = y0[idx] + (np.arange(idx.shape[0]) - off[idx])
    yb0 = ty * tile_h - jitter_pad
    yb1 = yb0 + (tile_h - 1) + 2 * jitter_pad
    big = 1e30
    xmn = np.full(idx.shape[0], big)
    xmx = np.full(idx.shape[0], -big)
    verts = [(xa[idx], ya[idx]), (xb[idx], yb[idx]), (xc[idx], yc[idx])]
    for xv, yv in verts:
        inb = (yv >= yb0) & (yv <= yb1)
        xmn = np.minimum(xmn, np.where(inb, xv, big))
        xmx = np.maximum(xmx, np.where(inb, xv, -big))
    for (xA, yA), (xB, yB) in ((verts[0], verts[1]), (verts[1], verts[2]),
                               (verts[2], verts[0])):
        dy = yB - yA
        dys = np.where(np.abs(dy) > 1e-12, dy, 1e-12)
        for ybnd in (yb0, yb1):
            t = (ybnd - yA) / dys
            ok = (np.abs(dy) > 1e-12) & (t >= 0.0) & (t <= 1.0)
            xi = xA + t * (xB - xA)
            xmn = np.minimum(xmn, np.where(ok, xi, big))
            xmx = np.maximum(xmx, np.where(ok, xi, -big))
    usable = ~behind[idx] & (xmn <= xmx)
    tx0 = np.clip(np.floor((xmn - jitter_pad) / tile_w), x0[idx], x1[idx])
    tx1 = np.clip(np.floor((xmx + jitter_pad) / tile_w), tx0, x1[idx])
    tx0 = np.where(usable, tx0, x0[idx])
    tx1 = np.where(usable, tx1, x1[idx])
    return int((tx1 - tx0 + 1).sum())


def _tri_cast_kernel(
    # scalar prefetch
    tile_start_ref,        # [T_pad + 1] int32 SMEM
    # inputs
    payload_hbm,           # [TRI_PAY, MP + chunk + 128] HBM; v0 rows are
                           # ORIGIN-RELATIVE (cast_primary subtracts the
                           # shared ray origin host-side, so tvec = -v0)
    rays_ref,              # [3, bs, win] VMEM (auto-pipelined block):
                           # world-space ray dirs, component-major. A
                           # sublane-major [pixels, 8] HBM layout would
                           # avoid the in-kernel transpose but its 8-lane
                           # DMA slice is Mosaic-unalignable (slices along
                           # lanes must be 128-multiples — found on
                           # hardware, round-2 measurement)
    # outputs
    t_ref,                 # [bs, win] f32
    id_ref,                # [bs, win] int32
    # scratch
    buf,                   # [2, TRI_PAY, window] VMEM
    sem,                   # DMA semaphores (2,)
    *,
    win: int, bs: int, chunk: int, t_min: float, t_max: float,
):
    grp = pl.program_id(0)
    t0 = grp * bs
    window = chunk + 128

    starts = [tile_start_ref[t0 + s] for s in range(bs + 1)]
    ns = [starts[s + 1] - starts[s] for s in range(bs)]
    ncs = [pl.cdiv(ns[s], chunk) for s in range(bs)]
    pfx = [jnp.int32(0)]
    for s in range(bs):
        pfx.append(pfx[-1] + ncs[s])
    total_chunks = pfx[-1]

    def locate(j):
        s = jnp.int32(0)
        for k in range(1, bs):
            s = s + (j >= pfx[k]).astype(jnp.int32)
        b = jnp.int32(starts[0])
        n = jnp.int32(ns[0])
        p = jnp.int32(0)
        for k in range(bs):
            hit = s == k
            b = jnp.where(hit, starts[k], b)
            n = jnp.where(hit, ns[k], n)
            p = jnp.where(hit, pfx[k], p)
        return s, j - p, b, n

    def dma(slot, j):
        _, c, b, _ = locate(j)
        col = pl.multiple_of(((b + c * chunk) // 128) * 128, 128)
        return pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(col, window)], buf.at[slot],
            sem.at[slot])

    @pl.when(total_chunks > 0)
    def _():
        dma(0, 0).start()

    # per-subtile dir columns: (bs, win) block rows -> (win, bs) matrices;
    # Mosaic lowers these (8k, 128m)-shaped transposes natively (the splat
    # kernel's trans.T is the existing precedent). Column s is pulled per
    # chunk by the same masked-sum trick used for best_t.
    dx_all = rays_ref[0].T                     # (win, bs)
    dy_all = rays_ref[1].T
    dz_all = rays_ref[2].T

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, window), 1)
    col_sel = jax.lax.broadcasted_iota(jnp.int32, (win, bs), 1)

    def body(state):
        j, best_t, best_id = state
        s, c, b, n = locate(j)
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < total_chunks)
        def _():
            dma(1 - slot, j + 1).start()

        dma(slot, j).wait()

        colmask = col_sel == s                         # (win, bs)
        bt_s = jnp.sum(jnp.where(colmask, best_t, 0.0), axis=1,
                       keepdims=True)                  # (win, 1)

        pay = buf[slot]                                # (TRI_PAY, window)
        seg = b + c * chunk
        off = seg - (seg // 128) * 128
        pair_idx = c * chunk + (lane - off)
        live = (lane >= off) & (pair_idx < n) & (lane < off + chunk)
        zmin_row = jnp.where(live, pay[10:11, :], _INF)

        def cast(args):
            best_t, best_id = args
            # this subtile's ray dirs as (win, 1) columns
            dx = jnp.sum(jnp.where(colmask, dx_all, 0.0), axis=1,
                         keepdims=True)
            dy = jnp.sum(jnp.where(colmask, dy_all, 0.0), axis=1,
                         keepdims=True)
            dz = jnp.sum(jnp.where(colmask, dz_all, 0.0), axis=1,
                         keepdims=True)
            v0x, v0y, v0z = pay[0:1, :], pay[1:2, :], pay[2:3, :]
            e1x, e1y, e1z = pay[3:4, :], pay[4:5, :], pay[5:6, :]
            e2x, e2y, e2z = pay[6:7, :], pay[7:8, :], pay[8:9, :]
            ids = pltpu.bitcast(pay[9:10, :], jnp.int32)

            # Möller–Trumbore, shared-origin form: tvec and qvec are
            # per-TRIANGLE rows (1, window); only pvec/det/u/v/t are
            # (win, window)
            pvx = dy * e2z - dz * e2y                  # (win, window)
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            tvx = -v0x                 # (1, window); v0 is origin-relative
            tvy = -v0y
            tvz = -v0z
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z - tvz * e1y                # (1, window)
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            vv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
            ok = ((jnp.abs(det) > 1e-12) & (u >= 0) & (vv >= 0)
                  & (u + vv <= 1) & (tt > t_min) & (tt < t_max)
                  & live & (ids != _ID_SENTINEL))
            tc = jnp.where(ok, tt, _INF)               # (win, window)
            m = jnp.min(tc, axis=1, keepdims=True)     # (win, 1)
            idc = jnp.where(tc <= m, ids, _ID_SENTINEL)
            im = jnp.min(idc, axis=1, keepdims=True)   # (win, 1)

            upd = colmask & ((m < bt_s) & (m < _INF))
            best_t = jnp.where(upd, m, best_t)
            best_id = jnp.where(upd, im, best_id)
            return best_t, best_id

        # early exit: chunks arrive in ascending zmin; once the nearest
        # possible t (>= camera z for +z-forward unit-ish rays... zmin is
        # a conservative near bound on t because t >= z/|d_cam_z| >= z
        # for |d| = 1 rays) exceeds every pixel's best, skip the math
        best_t, best_id = jax.lax.cond(
            jnp.min(zmin_row) < jnp.max(bt_s), cast, lambda a: a,
            (best_t, best_id))
        return j + 1, best_t, best_id

    def cond(state):
        return state[0] < total_chunks

    big = jnp.full((win, bs), _INF)
    ids0 = jnp.full((win, bs), _ID_SENTINEL)
    _, best_t, best_id = jax.lax.while_loop(
        cond, body, (jnp.int32(0), big, ids0))
    t_ref[...] = best_t.T
    id_ref[...] = best_id.T


def cast_primary(binning: TileBinning, dirs, origin, *, width: int,
                 height: int, tile_w: int, tile_h: int, bs: int = 8,
                 chunk: int = 128, t_min: float = 1e-3, t_max: float = 1e4,
                 interpret: bool | None = None):
    """Run the binned primary cast.

    dirs: [H*W, 3] world-space ray directions in framebuffer (row-major)
    order, |d| ~ 1 (the zmin early-exit bound assumes t >= camera z, true
    for unit dirs with the +z-forward convention). origin: [3] shared ray
    origin. Returns (t [H, W] f32 — +inf on miss, tri_id [H, W] int32 —
    _ID_SENTINEL on miss).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert chunk <= _MAX_CAST_CHUNK, \
        "cast chunk exceeds the payload pad built by build_tri_binning"
    ntx, nty = tile_extent(width, height, tile_w, tile_h)
    T = ntx * nty
    win = tile_w * tile_h
    assert win % 128 == 0 and win * bs >= 1024
    t_pad = (-T) % bs
    G = (T + t_pad) // bs

    # tile-major component-major ray dirs [3, T_pad, win]; the shared
    # origin folds into the payload (v0 -> v0 - origin => tvec = -v0), so
    # the kernel sees dirs only
    d = dirs.reshape(height, width, 3)
    pad_h, pad_w = nty * tile_h - height, ntx * tile_w - width
    if pad_h or pad_w:
        d = jnp.pad(d, ((0, pad_h), (0, pad_w), (0, 0)))
    d = d.reshape(nty, tile_h, ntx, tile_w, 3).transpose(0, 2, 1, 3, 4)
    d = d.reshape(T, win, 3)
    if t_pad:
        d = jnp.concatenate(
            [d, jnp.zeros((t_pad, win, 3), d.dtype)], axis=0)
    rays = jnp.transpose(d, (2, 0, 1))                # [3, T_pad, win]

    payload = jnp.concatenate(
        [binning.payload[0:3] - origin.astype(jnp.float32)[:, None],
         binning.payload[3:]], axis=0)

    tile_start = binning.tile_start
    if t_pad:
        tile_start = jnp.concatenate(
            [tile_start,
             jnp.broadcast_to(tile_start[-1:], (t_pad,))])
    payload, rays, tile_start = jax.lax.optimization_barrier(
        (payload, rays, tile_start))

    kernel = functools.partial(_tri_cast_kernel, win=win, bs=bs,
                               chunk=chunk, t_min=t_min, t_max=t_max)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((3, bs, win), index_map=lambda g, ss: (0, g, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bs, win), index_map=lambda g, ss: (g, 0)),
            pl.BlockSpec((bs, win), index_map=lambda g, ss: (g, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, TRI_PAY, chunk + 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    t_out, id_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((G * bs, win), jnp.float32),
                   jax.ShapeDtypeStruct((G * bs, win), jnp.int32)],
        interpret=interpret,
    )(tile_start, payload, rays)

    def unshuffle(a):
        a = a[:T].reshape(nty, ntx, tile_h, tile_w)
        a = a.transpose(0, 2, 1, 3).reshape(nty * tile_h, ntx * tile_w)
        return a[:height, :width]

    return unshuffle(t_out), unshuffle(id_out)
