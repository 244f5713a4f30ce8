"""Differentiable rendering + training tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsrt.core.config import RenderConfig
from gsrt.models.gaussian_rt import render_fast
from gsrt.models.trainer import (
    GaussianParams,
    init_params,
    make_optimizer,
    make_train_step_dp,
    random_init,
    render_loss,
    train_step,
)
from gsrt.scene.catalog import demo_gauss_splat, random_cloud


def test_gradients_exist_and_finite():
    cloud, camera = demo_gauss_splat(width=24, height=16)
    cfg = RenderConfig(width=24, height=16, conic_mode="standard")
    params = init_params(cloud)
    target = jnp.zeros((16, 24, 3))
    grads = jax.grad(render_loss)(params, target, camera, cfg,
                                  lambda_ssim=0.0)
    for name, g in grads._asdict().items():
        arr = np.asarray(g)
        assert np.isfinite(arr).all(), f"{name} grad has NaN/inf"
    # the visible splats must receive nonzero means/opacity gradients
    assert np.abs(np.asarray(grads.opacity_logit)).max() > 0
    assert np.abs(np.asarray(grads.sh)).max() > 0


def test_gradient_matches_finite_difference():
    """Spot-check dloss/d(opacity_logit) by central differences."""
    cloud, camera = demo_gauss_splat(width=16, height=12)
    cfg = RenderConfig(width=16, height=12, conic_mode="standard")
    params = init_params(cloud)
    target = jnp.full((12, 16, 3), 0.3)

    def f(logit0):
        p = params._replace(
            opacity_logit=params.opacity_logit.at[0].set(logit0))
        return render_loss(p, target, camera, cfg, lambda_ssim=0.0)

    x0 = params.opacity_logit[0]
    g_auto = jax.grad(f)(x0)
    eps = 1e-2
    g_fd = (f(x0 + eps) - f(x0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g_auto), float(g_fd),
                               rtol=5e-2, atol=1e-5)


@pytest.mark.slow
def test_training_reduces_loss():
    """Fit 32 random gaussians to a target render of the demo scene."""
    cloud, camera = demo_gauss_splat(width=24, height=16)
    cfg = RenderConfig(width=24, height=16, conic_mode="standard")
    target = render_fast(cloud, camera, cfg).color

    params = random_init(jax.random.PRNGKey(0), 32, extent=1.5, z_offset=4.0)
    optimizer = make_optimizer(lr_means=2e-3, lr_scales=5e-3,
                               lr_opacity=5e-2, lr_sh=1e-2)
    opt_state = optimizer.init(params)

    step = jax.jit(lambda p, s: train_step(p, s, target, camera, cfg,
                                           optimizer, lambda_ssim=0.0))
    losses = []
    for _ in range(60):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_train_step_dp_matches_single_device():
    """DP gradient step over the CPU mesh == single-device step (λ_ssim=0
    so slab borders don't matter)."""
    from gsrt.parallel.tiles import make_render_mesh
    cloud, camera = demo_gauss_splat(width=32, height=32)
    cfg = RenderConfig(width=32, height=32, conic_mode="standard")
    target = render_fast(cloud, camera, cfg).color * 0.5

    params = init_params(cloud)
    optimizer = make_optimizer()
    opt_state = optimizer.init(params)

    p1, _, loss1 = train_step(params, opt_state, target, camera, cfg,
                              optimizer, lambda_ssim=0.0)

    mesh = make_render_mesh(n_tiles=8)
    step_dp = make_train_step_dp(cfg, optimizer, mesh, lambda_ssim=0.0)
    p2, _, loss2 = step_dp(params, opt_state, target, camera)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p1.means), np.asarray(p2.means),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p1.sh), np.asarray(p2.sh),
                               rtol=1e-4, atol=1e-6)
