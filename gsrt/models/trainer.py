"""Differentiable 3DGS rendering + optimization (scene fitting).

The reference is a render-only benchmark; a complete 3DGS framework must
also *fit* scenes (the .ply files it would consume are produced by exactly
this optimization). The blend in render_fast is pure XLA (cumprod + masked
selects), so reverse-mode AD flows through alpha, color, and projection to
every Gaussian parameter; sort/cull indices are treated as constants per
step, as in the original CUDA trainer.

Multi-chip: data-parallel over image row slabs (`train_step_dp`): each chip
renders + differentiates its slab against its target shard, gradients are
`psum`'d over the 'tiles' mesh axis — gradient DP riding ICI.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from gsrt.core.config import RenderConfig
from gsrt.core.types import Camera, GaussianCloud
from gsrt.ops.gaussian import quat_scale_to_cov3d
from gsrt.models.gaussian_rt import render_fast


class GaussianParams(NamedTuple):
    """Trainable parameterization (the standard 3DGS activations:
    exp for scales, sigmoid for opacity, normalized quaternions)."""

    means: jnp.ndarray        # [N, 3]
    log_scales: jnp.ndarray   # [N, 3]
    quats: jnp.ndarray        # [N, 4]
    opacity_logit: jnp.ndarray  # [N]
    sh: jnp.ndarray           # [N, K, 3]

    def to_cloud(self) -> GaussianCloud:
        scales = jnp.exp(self.log_scales)
        cov3d = quat_scale_to_cov3d(self.quats, scales)
        return GaussianCloud(
            means=self.means, cov3d=cov3d,
            opacity=jax.nn.sigmoid(self.opacity_logit), sh=self.sh)


def init_params(cloud: GaussianCloud, key=None) -> GaussianParams:
    """Initialize from an existing cloud (isotropic scale estimate from the
    covariance trace; rotation reset to identity)."""
    n = cloud.n
    tr = (cloud.cov3d[:, 0] + cloud.cov3d[:, 3] + cloud.cov3d[:, 5]) / 3.0
    s = jnp.sqrt(jnp.maximum(tr, 1e-12))
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    op = jnp.clip(cloud.opacity, 1e-4, 1 - 1e-4)
    return GaussianParams(
        means=cloud.means,
        log_scales=jnp.log(jnp.stack([s, s, s], -1)),
        quats=quats,
        opacity_logit=jnp.log(op / (1 - op)),
        sh=cloud.sh)


def random_init(key, n: int, extent: float = 3.0, z_offset: float = 4.0,
                sh_degree: int = 0) -> GaussianParams:
    k1, k2 = jax.random.split(key)
    means = jax.random.uniform(k1, (n, 3), minval=-extent, maxval=extent)
    means = means.at[:, 2].add(z_offset)
    K = (sh_degree + 1) ** 2
    return GaussianParams(
        means=means,
        # explicit dtype: a weak-typed fill would retrace the first train
        # step when the optimizer output comes back strong-typed
        log_scales=jnp.full((n, 3), jnp.log(0.3), jnp.float32),
        quats=jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
        opacity_logit=jnp.zeros(n),
        sh=0.1 * jax.random.normal(k2, (n, K, 3)))


def _ssim(a, b, max_val=1.0):
    """11x11 mean-window SSIM over [H,W,3] images, differentiable."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    win = 11

    def filt(x):
        # [H,W,C] → mean filter via depthwise conv
        x = jnp.moveaxis(x, -1, 0)[None]           # [1,C,H,W]
        k = jnp.ones((x.shape[1], 1, win, win)) / (win * win)
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID", feature_group_count=x.shape[1])
        return jnp.moveaxis(y[0], 0, -1)

    mu_a, mu_b = filt(a), filt(b)
    var_a = filt(a * a) - mu_a ** 2
    var_b = filt(b * b) - mu_b ** 2
    cov = filt(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2))
    return jnp.mean(s)


def render_loss(params: GaussianParams, target, camera: Camera,
                cfg: RenderConfig, lambda_ssim: float = 0.2):
    """The standard 3DGS loss: (1-λ)·L1 + λ·(1−SSIM)."""
    out = render_fast(params.to_cloud(), camera, cfg)
    img = out.color  # white background (if any) already composited
    l1 = jnp.mean(jnp.abs(img - target))
    if lambda_ssim > 0 and min(camera.height, camera.width) >= 11:
        loss = (1 - lambda_ssim) * l1 + lambda_ssim * (1 - _ssim(img, target))
    else:
        loss = l1
    return loss


def render_loss_tiled(params: GaussianParams, target, camera: Camera,
                      cfg: RenderConfig, max_pairs: int,
                      lambda_ssim: float = 0.2, interpret: bool = False):
    """`render_loss` on the TILED perf path (custom-VJP Pallas backward,
    gsrt.models.tiled_diff) — scales to full resolutions/splat counts that
    render_fast AD cannot hold residuals for."""
    from gsrt.models.tiled_diff import render_tiled_diff
    img, _ = render_tiled_diff(params.to_cloud(), camera, cfg, max_pairs,
                               interpret=interpret)
    l1 = jnp.mean(jnp.abs(img - target))
    if lambda_ssim > 0 and min(camera.height, camera.width) >= 11:
        return (1 - lambda_ssim) * l1 + lambda_ssim * (1 - _ssim(img, target))
    return l1


def train_step_tiled(params, opt_state, target, camera, cfg, optimizer,
                     max_pairs: int, lambda_ssim=0.2, interpret=False):
    loss, grads = jax.value_and_grad(render_loss_tiled)(
        params, target, camera, cfg, max_pairs, lambda_ssim, interpret)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def make_optimizer(lr_means=1.6e-4, lr_scales=5e-3, lr_quats=1e-3,
                   lr_opacity=5e-2, lr_sh=2.5e-3):
    """Per-parameter-group Adam (the INRIA learning-rate split)."""
    labels = GaussianParams(means="means", log_scales="scales",
                            quats="quats", opacity_logit="opacity",
                            sh="sh")
    return optax.multi_transform(
        {"means": optax.adam(lr_means), "scales": optax.adam(lr_scales),
         "quats": optax.adam(lr_quats), "opacity": optax.adam(lr_opacity),
         "sh": optax.adam(lr_sh)},
        labels)


def train_step(params, opt_state, target, camera, cfg, optimizer,
               lambda_ssim=0.2):
    loss, grads = jax.value_and_grad(render_loss)(
        params, target, camera, cfg, lambda_ssim)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def make_train_step_dp(cfg: RenderConfig, optimizer, mesh,
                       lambda_ssim: float = 0.2):
    """Data-parallel training step over the 'tiles' mesh axis: each device
    renders/differentiates an image row slab; grads are psum'd.

    Returns step(params, opt_state, target [H,W,3], camera) with params and
    opt_state replicated, target sharded P('tiles') on rows.
    """
    from jax.sharding import PartitionSpec as P

    def loss_slab(params, target_slab, camera):
        slab_h = target_slab.shape[0]
        y0 = jax.lax.axis_index("tiles") * slab_h
        cam = Camera(view=camera.view, fx=camera.fx, fy=camera.fy,
                     cx=camera.cx, cy=camera.cy - y0.astype(jnp.float32),
                     width=camera.width, height=slab_h)
        slab_cfg = cfg.replace(height=slab_h)
        out = render_fast(params.to_cloud(), cam, slab_cfg)
        # SSIM windows do not cross slab borders (acceptable DP approximation)
        l1 = jnp.mean(jnp.abs(out.color - target_slab))
        if lambda_ssim > 0 and slab_h >= 11 and camera.width >= 11:
            loss = ((1 - lambda_ssim) * l1
                    + lambda_ssim * (1 - _ssim(out.color, target_slab)))
        else:
            loss = l1
        return loss

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P("tiles"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def grad_shard(params, target, camera):
        loss, grads = jax.value_and_grad(loss_slab)(params, target, camera)
        grads = jax.lax.pmean(grads, "tiles")
        loss = jax.lax.pmean(loss, "tiles")
        return loss, grads

    def step(params, opt_state, target, camera):
        loss, grads = grad_shard(params, target, camera)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
