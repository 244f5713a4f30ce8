"""Multi-chip rendering via jax.sharding + shard_map.

The reference is a single-GPU stack (SURVEY.md §2.5 — no NCCL/MPI anywhere);
its only parallel axes are the SIMT launch grid and the simulated NoC. This
module supplies the missing distributed layer TPU-natively:

* **Image-tile data parallelism** (`render_data_parallel`): the image plane
  is sharded in row slabs across the `tiles` mesh axis; the Gaussian cloud is
  replicated. Each chip renders its slab with a cy-shifted camera — a pure
  output shard, zero collectives on the hot path (framebuffer assembly is
  the output sharding itself, riding ICI only on host gather).

* **Splat sharding** (`render_splat_sharded`): for scenes exceeding one
  chip's HBM, splats are sharded in contiguous **depth slabs** along the
  `splats` axis (pre-sorted by camera depth). Each chip blends its slab for
  its row slab, then an `all_gather` of per-slab (color, transmittance)
  composites across shards in slab order:
      C = Σ_d C_d · Π_{d'<d} T_d'   ,   T = Π_d T_d
  — front-to-back compositing is associative over depth-contiguous groups,
  the same identity the k-buffer multi-pass scheme exploits
  (GaussTracing.rgen:47-72).

All functions are jit-compatible and run on a CPU mesh
(`--xla_force_host_platform_device_count`) for testing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gsrt.core.config import RenderConfig
from gsrt.core.types import Camera, GaussianCloud


def make_render_mesh(n_tiles: int, n_splats: int = 1,
                     devices=None) -> Mesh:
    """Mesh over ('tiles', 'splats'): image-slab DP × depth-slab splat
    sharding. Lay the splat axis innermost so its all_gather rides
    neighboring ICI links."""
    devices = devices if devices is not None else jax.devices()
    n = n_tiles * n_splats
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    dev = np.asarray(devices[:n]).reshape(n_tiles, n_splats)
    return Mesh(dev, ("tiles", "splats"))


def _slab_camera(camera: Camera, y0, slab_h: int) -> Camera:
    """Camera for image rows [y0, y0+slab_h): shift the principal point."""
    return Camera(view=camera.view, fx=camera.fx, fy=camera.fy,
                  cx=camera.cx, cy=camera.cy - y0,
                  width=camera.width, height=slab_h)


def tiled_render_fn(max_pairs: int, max_rows: int | None = None,
                    interpret: bool = False):
    """render_fn adapter running the PRODUCTION tile-binned pipeline
    (projection → tile binning → packed Pallas blend, render_tiled) inside
    shard_map shards — the same code path the single-chip benchmark runs,
    not the brute-force render_fast sweep.

    `max_pairs`/`max_rows` are the per-shard static pair-buffer sizes and
    must bound every shard's slab (use `calibrate_sharded`); shard_map
    requires identical static shapes on every device anyway, so one global
    bucket is the natural sizing. Per-pixel output is identical to the
    full-image render: a footprint rect is binned conservatively, and any
    pair reaching a tile it cannot actually cover fails the in-kernel
    alpha test at every pixel (alpha ≤ threshold ⇒ rejected), so slab-local
    tile membership differences never change the blend.

    Reference mapping: SURVEY §2.5 row 1 — the launch grid
    (vulkan_ray_tracing.cc:1595-1615) sharded over devices instead of SMs.
    """
    from gsrt.models.gaussian_rt import render_tiled

    def fn(cloud, camera, cfg):
        return render_tiled(cloud, camera, cfg, max_pairs=max_pairs,
                            max_rows=max_rows, interpret=interpret)

    return fn


def calibrate_sharded(cloud: GaussianCloud, camera: Camera,
                      cfg: RenderConfig, n_tiles: int,
                      n_splats: int = 1) -> int:
    """Static pair-buffer size for the sharded tiled path: the max pair
    count over every (row-slab camera × depth-slab cloud shard), bucketed
    with the single-chip slack rule (pure NumPy — see
    GaussianRayTracer.calibrate for why sizing must not run jax)."""
    from gsrt.models.gaussian_rt import count_pairs_numpy, pair_bucket

    slab_h = camera.height // n_tiles
    per = cloud.n // n_splats
    worst = 0
    for i in range(n_tiles):
        cam = _slab_camera(camera, float(i * slab_h), slab_h)
        for j in range(n_splats):
            if n_splats == 1:
                sub = cloud
            else:
                sl = slice(j * per, (j + 1) * per)
                sub = GaussianCloud(means=cloud.means[sl],
                                    cov3d=cloud.cov3d[sl],
                                    opacity=cloud.opacity[sl],
                                    sh=cloud.sh[sl])
            worst = max(worst, int(count_pairs_numpy(sub, cam, cfg)))
    return pair_bucket(int(worst * 1.1))


def render_data_parallel(cloud: GaussianCloud, camera: Camera,
                         cfg: RenderConfig, mesh: Mesh,
                         render_fn=None):
    """Replicated scene, row-slab-sharded framebuffer.

    Returns RenderOutput with arrays sharded P('tiles') on the row axis.
    """
    from gsrt.models.gaussian_rt import render_fast
    render_fn = render_fn or render_fast
    n_tiles = mesh.shape["tiles"]
    assert camera.height % n_tiles == 0, "image height must divide tile axis"
    slab_h = camera.height // n_tiles
    slab_cfg = cfg.replace(height=slab_h)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P("tiles"),
        check_vma=False,
    )
    def shard_fn(cloud, camera):
        y0 = jax.lax.axis_index("tiles") * slab_h
        cam = _slab_camera(camera, y0.astype(jnp.float32), slab_h)
        out = render_fn(cloud, cam, slab_cfg)
        return jnp.concatenate(
            [out.trans[..., None], out.color], axis=-1)  # [slab_h, W, 4]

    packed = shard_fn(cloud, camera)
    return packed[..., 0], packed[..., 1:]   # trans [H,W], color [H,W,3]


def shard_cloud_by_depth(cloud: GaussianCloud, camera: Camera,
                         n_shards: int) -> GaussianCloud:
    """Host-side prep for splat sharding: sort splats by camera depth and
    pad so N divides the shard count. Shard i then owns depth slab i."""
    R = camera.view[:3, :3]
    t = camera.view[:3, 3]
    depth = cloud.means @ np.asarray(R.T) + np.asarray(t)
    order = jnp.argsort(jnp.asarray(depth)[:, 2])
    n = cloud.n
    pad = (-n) % n_shards
    def prep(x):
        x = x[order]
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
        return x
    return GaussianCloud(means=prep(cloud.means), cov3d=prep(cloud.cov3d),
                         opacity=prep(cloud.opacity), sh=prep(cloud.sh))


def _composite_butterfly(trans, color, axis_name: str, n_sh: int):
    """Ordered depth composite in O(log D) pairwise exchanges.

    Front-to-back compositing over depth slabs is ASSOCIATIVE but not
    commutative: (C, T) ∘ (C', T') = (C + T·C', T·T') with the nearer
    slab on the left. Recursive doubling with XOR partners keeps each
    chip's running value covering an aligned contiguous block of slab
    indices, so order is preserved by combining lower-block ∘
    upper-block. Per-chip ICI traffic is log2(D) framebuffers instead of
    the all_gather's D-1 (SURVEY §5's per-ray-state exchange row) and
    peak memory is O(1) framebuffers instead of O(D)."""
    idx = jax.lax.axis_index(axis_name)
    d = 1
    while d < n_sh:
        perm = [(i, i ^ d) for i in range(n_sh)]
        pt = jax.lax.ppermute(trans, axis_name, perm)
        pc = jax.lax.ppermute(color, axis_name, perm)
        lower = ((idx & d) == 0)          # my block is nearer the camera
        color = jnp.where(lower,
                          color + trans[..., None] * pc,
                          pc + pt[..., None] * color)
        trans = trans * pt
        d *= 2
    return trans, color


def render_splat_sharded(cloud: GaussianCloud, camera: Camera,
                         cfg: RenderConfig, mesh: Mesh,
                         render_fn=None, composite: str = "gather"):
    """Depth-slab splat sharding × row-slab image sharding.

    `cloud` must be depth-sorted and N divisible by the splat axis (use
    `shard_cloud_by_depth`). Returns (trans [H,W], color [H,W,3]) sharded
    P('tiles') on rows, replicated over 'splats'.

    composite: "gather" all_gathers every shard's (trans, color) slab and
    composites locally (O(D) ICI traffic + memory per chip); "butterfly"
    combines them in-place through log2(D) ppermute exchanges (O(log D)
    traffic, O(1) memory) — same image, better scaling for deep splat
    axes. Butterfly requires a power-of-two splat axis.
    """
    from gsrt.models.gaussian_rt import render_fast
    render_fn = render_fn or render_fast
    n_tiles = mesh.shape["tiles"]
    n_sh = mesh.shape["splats"]
    assert camera.height % n_tiles == 0
    assert cloud.n % n_sh == 0
    assert composite in ("gather", "butterfly"), composite
    if composite == "butterfly":
        assert n_sh & (n_sh - 1) == 0, \
            "butterfly composite needs a power-of-two splat axis"
    slab_h = camera.height // n_tiles
    # each shard blends only its depth slab — the background term belongs
    # to the FINAL transmittance, added once after the composite (adding it
    # per shard would count it once per slab, weighted by prefix trans)
    slab_cfg = cfg.replace(height=slab_h, white_background=False)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("splats"), P()),
        out_specs=P("tiles", None, None),
        check_vma=False,
    )
    def shard_fn(cloud, camera):
        y0 = jax.lax.axis_index("tiles") * slab_h
        cam = _slab_camera(camera, y0.astype(jnp.float32), slab_h)
        out = render_fn(cloud, cam, slab_cfg)      # my depth slab only
        if composite == "butterfly":
            trans, color = _composite_butterfly(out.trans, out.color,
                                                "splats", n_sh)
        else:
            packed = jnp.concatenate(
                [out.trans[..., None], out.color], axis=-1)[None]
            all_slabs = jax.lax.all_gather(
                packed, "splats", axis=0, tiled=True)  # [n_sh, h, W, 4]
            ts = all_slabs[..., 0]                     # [n_sh, h, W]
            cs = all_slabs[..., 1:]                    # [n_sh, h, W, 3]
            # ordered composite over depth slabs: prefix transmittances
            excl = jnp.concatenate(
                [jnp.ones_like(ts[:1]),
                 jnp.cumprod(ts, axis=0)[:-1]], axis=0)
            color = jnp.sum(cs * excl[..., None], axis=0)
            trans = jnp.prod(ts, axis=0)
        if cfg.white_background:
            color = color + trans[..., None]
        return jnp.concatenate([trans[..., None], color], axis=-1)

    packed = shard_fn(cloud, camera)
    return packed[..., 0], packed[..., 1:]
