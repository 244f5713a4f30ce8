"""Multi-view 3DGS fitting: the full INRIA-style optimization loop.

Completes the training story: `gsrt.models.trainer` fits a single target
image; real captures (the north-star Mip-NeRF360 garden, BASELINE.md) are
dozens-to-hundreds of posed views. This module holds the posed views as
ONE stacked device array and jits ONE train step that selects its view by
a traced index — poses/intrinsics are Camera pytree leaves
(gsrt.core.types.Camera: only width/height are static), so every view
shares a single XLA executable instead of compiling per camera.

Composes with:
  * gsrt.models.densify — adaptive density control between steps (the
    jitted step folds the positional-gradient statistics);
  * gsrt.scene.colmap — COLMAP model loading + SfM-point initialization;
  * render_loss / render_loss_tiled — AD path for small fits, custom-VJP
    tiled Pallas path for production resolutions.

Evaluation follows the INRIA/LLFF convention: every `holdout`-th view (by
sorted file name) is excluded from training and scored by PSNR.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gsrt.core.config import RenderConfig
from gsrt.core.types import Camera
from gsrt.models.densify import (DensifyStats, accumulate_stats,
                                 densify_and_prune, init_stats,
                                 reset_opacity)
from gsrt.models.trainer import (GaussianParams, make_optimizer,
                                 render_loss, render_loss_tiled)


class ViewSet(NamedTuple):
    """A posed multi-view capture as stacked device arrays. width/height
    ride as Python ints via the Cameras' static fields when sliced."""

    views: jnp.ndarray    # [V, 4, 4] world→camera
    fx: jnp.ndarray       # [V]
    fy: jnp.ndarray       # [V]
    cx: jnp.ndarray       # [V]
    cy: jnp.ndarray       # [V]
    images: jnp.ndarray   # [V, H, W, 3] f32 targets

    @property
    def n_views(self) -> int:
        return self.images.shape[0]

    @property
    def height(self) -> int:
        return self.images.shape[1]

    @property
    def width(self) -> int:
        return self.images.shape[2]

    def camera_at(self, i) -> Camera:
        """Camera for view `i` — `i` may be traced (jnp scalar)."""
        return Camera(view=self.views[i], fx=self.fx[i], fy=self.fy[i],
                      cx=self.cx[i], cy=self.cy[i],
                      width=self.width, height=self.height)

    def select(self, idx: Sequence[int]) -> "ViewSet":
        idx = jnp.asarray(list(idx), jnp.int32)
        return ViewSet(views=self.views[idx], fx=self.fx[idx],
                       fy=self.fy[idx], cx=self.cx[idx], cy=self.cy[idx],
                       images=self.images[idx])


def viewset_from_cameras(cameras: Sequence[Camera], images) -> ViewSet:
    """Stack per-view Cameras (all same resolution) + target images."""
    assert len(cameras) == len(images) and len(cameras) > 0
    w, h = cameras[0].width, cameras[0].height
    assert all(c.width == w and c.height == h for c in cameras), \
        "all views in a ViewSet share one resolution"
    return ViewSet(
        views=jnp.stack([c.view for c in cameras]),
        fx=jnp.stack([jnp.asarray(c.fx) for c in cameras]),
        fy=jnp.stack([jnp.asarray(c.fy) for c in cameras]),
        cx=jnp.stack([jnp.asarray(c.cx) for c in cameras]),
        cy=jnp.stack([jnp.asarray(c.cy) for c in cameras]),
        images=jnp.asarray(np.stack([np.asarray(im) for im in images],
                                    axis=0), jnp.float32))


def viewset_from_colmap(sparse_dir: str, images_dir: str,
                        downscale: int = 1,
                        limit: Optional[int] = None):
    """COLMAP capture → (ViewSet, init GaussianParams, scene extent)."""
    from gsrt.scene.colmap import (init_params_from_points,
                                   load_colmap_model, load_image_dir,
                                   scene_extent)
    model = load_colmap_model(sparse_dir)
    imgs, w, h = load_image_dir(model, images_dir, downscale=downscale,
                                limit=limit)
    ims = model.images[:limit] if limit else model.images
    s = 1.0 / downscale
    vs = ViewSet(
        views=jnp.asarray(np.stack([im.view for im in ims])),
        fx=jnp.asarray([model.cameras[im.camera_id].fx * s for im in ims],
                       jnp.float32),
        fy=jnp.asarray([model.cameras[im.camera_id].fy * s for im in ims],
                       jnp.float32),
        cx=jnp.asarray([model.cameras[im.camera_id].cx * s for im in ims],
                       jnp.float32),
        cy=jnp.asarray([model.cameras[im.camera_id].cy * s for im in ims],
                       jnp.float32),
        images=jnp.asarray(imgs))
    params = init_params_from_points(model.points, model.colors)
    return vs, params, scene_extent(model)


def holdout_split(n_views: int, holdout: int = 8):
    """(train_idx, test_idx): every `holdout`-th view is test (the
    INRIA/LLFF llffhold convention). holdout=0 → train on everything."""
    if holdout <= 0 or n_views < 2:
        return list(range(n_views)), []
    test = list(range(0, n_views, holdout))
    train = [i for i in range(n_views) if i % holdout != 0]
    return train, test


def make_train_step_mv(cfg: RenderConfig, optimizer,
                       lambda_ssim: float = 0.2,
                       max_pairs: Optional[int] = None,
                       interpret: bool = False):
    """One jitted multi-view step: (params, opt_state, stats, viewset,
    view_index) → (params, opt_state, stats, loss). The view index is
    traced, so one executable serves every view (per splat-count bucket).
    max_pairs switches to the tiled custom-VJP loss (production scale)."""
    import optax

    @jax.jit
    def step(params, opt_state, stats, vs: ViewSet, i):
        camera = vs.camera_at(i)
        target = vs.images[i]
        if max_pairs is not None:
            lfn = functools.partial(render_loss_tiled, max_pairs=max_pairs,
                                    lambda_ssim=lambda_ssim,
                                    interpret=interpret)
        else:
            lfn = functools.partial(render_loss, lambda_ssim=lambda_ssim)
        loss, grads = jax.value_and_grad(lfn)(params, target, camera, cfg)
        stats = accumulate_stats(stats, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, stats, loss

    return step


def eval_psnr(params: GaussianParams, vs: ViewSet, idx: Sequence[int],
              cfg: RenderConfig) -> float:
    """Mean PSNR of the fitted model over views `idx` (render_fast)."""
    from gsrt.models.gaussian_rt import render_fast
    from gsrt.utils.image import psnr
    if not idx:
        return float("nan")
    cloud = params.to_cloud()
    vals = []
    for i in idx:
        cam = Camera(view=vs.views[i], fx=vs.fx[i], fy=vs.fy[i],
                     cx=vs.cx[i], cy=vs.cy[i],
                     width=vs.width, height=vs.height)
        img = render_fast(cloud, cam, cfg).color
        vals.append(psnr(np.asarray(img), np.asarray(vs.images[i])))
    return float(np.mean(vals))


class FitReport(NamedTuple):
    losses: list
    n_splats: int
    train_psnr: float
    test_psnr: float


def fit_views(
    vs: ViewSet,
    params: GaussianParams,
    cfg: RenderConfig,
    *,
    iters: int = 2000,
    lambda_ssim: float = 0.2,
    holdout: int = 8,
    densify_every: int = 0,
    densify_grad: float = 2e-4,
    densify_until: float = 0.75,
    scene_scale: float = 1.0,
    opacity_reset_every: int = 0,
    max_splats: Optional[int] = None,
    bucket: int = 4096,
    seed: int = 0,
    log_every: int = 0,
    optimizer=None,
    max_pairs: Optional[int] = None,
    interpret: bool = False,
):
    """Host-side fit loop over a posed capture (the INRIA schedule shape).

    Views are visited in epoch-shuffled order over the train split;
    densification events run every `densify_every` steps up to
    `densify_until`·iters; `opacity_reset_every` applies the periodic
    opacity clamp (densify.reset_opacity). Densify thresholds scale with
    `scene_scale` (pass gsrt.scene.colmap.scene_extent for captures).
    Returns (params, FitReport).
    """
    rng = np.random.default_rng(seed)
    train_idx, test_idx = holdout_split(vs.n_views, holdout)
    if optimizer is None:
        optimizer = make_optimizer(lr_means=1.6e-4 * scene_scale)
    opt_state = optimizer.init(params)
    stats = init_stats(params.means.shape[0])
    step = make_train_step_mv(cfg, optimizer, lambda_ssim,
                              max_pairs=max_pairs, interpret=interpret)
    order: list = []
    losses = []
    for it in range(iters):
        if not order:
            order = list(rng.permutation(train_idx))
        v = int(order.pop())
        params, opt_state, stats, loss = step(
            params, opt_state, stats, vs, jnp.int32(v))
        losses.append(float(loss))
        if (densify_every and (it + 1) % densify_every == 0
                and it < iters * densify_until):
            params, opt_state, stats, rep = densify_and_prune(
                params, opt_state, stats, grad_threshold=densify_grad,
                scale_threshold=0.01 * scene_scale, max_splats=max_splats,
                bucket=bucket, seed=seed + it)
            if log_every:
                print(f"iter {it:5d}  densify {rep.n_before}->{rep.n_after}"
                      f" (+{rep.n_cloned}c +{rep.n_split}s -{rep.n_pruned}p)")
        if (opacity_reset_every and (it + 1) % opacity_reset_every == 0
                and it < iters * densify_until):
            params = reset_opacity(params)
        if log_every and it % log_every == 0:
            print(f"iter {it:5d}  view {v:3d}  loss {losses[-1]:.5f}")
    report = FitReport(
        losses=losses, n_splats=int(params.means.shape[0]),
        train_psnr=eval_psnr(params, vs, train_idx[:8], cfg),
        test_psnr=eval_psnr(params, vs, test_idx[:8], cfg))
    return params, report
