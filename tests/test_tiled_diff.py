"""Custom-VJP tiled renderer: gradients must match render_fast AD
(VERDICT round-1 item 7). Runs the Pallas kernels in interpret mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gsrt.core.config import RenderConfig
from gsrt.models.gaussian_rt import render_fast
from gsrt.models.tiled_diff import render_tiled_diff
from gsrt.scene import random_cloud


def _loss_weights(key, H, W):
    kc, kt = jax.random.split(key)
    wc = jax.random.normal(kc, (H, W, 3))
    wt = jax.random.normal(kt, (H, W))
    return wc, wt


def _grads(fn, cloud):
    def loss(c):
        color, trans = fn(c)
        return jnp.sum(color * WC) + jnp.sum(trans * WT)
    return jax.grad(lambda c: loss(c))(cloud)


W, H = 64, 48
WC = WT = None


def setup_module(module):
    global WC, WT
    WC, WT = _loss_weights(jax.random.PRNGKey(9), H, W)


@pytest.mark.parametrize("tile", [
    pytest.param((128, 8), marks=pytest.mark.slow), (16, 16)])
def test_grads_match_render_fast(tile):
    tw, th = tile
    cloud, camera = random_cloud(200, seed=5, width=W, height=H)
    cfg = RenderConfig(width=W, height=H, conic_mode="standard",
                       tile_w=tw, tile_h=th,
                       pair_chunk=384 if tw == 128 else 128)

    def fast_fn(c):
        out = render_fast(c, camera, cfg)
        return out.color, out.trans

    def tiled_fn(c):
        return render_tiled_diff(c, camera, cfg, max_pairs=1 << 13,
                                 interpret=True)

    # forward parity first
    cf, tf = fast_fn(cloud)
    ct, tt = tiled_fn(cloud)
    np.testing.assert_allclose(np.asarray(tf), np.asarray(tt), atol=5e-4)
    np.testing.assert_allclose(np.asarray(cf), np.asarray(ct), atol=1e-3)

    g_fast = _grads(fast_fn, cloud)
    g_tiled = _grads(tiled_fn, cloud)

    for name in ("means", "cov3d", "opacity", "sh"):
        a = np.asarray(getattr(g_fast, name))
        b = np.asarray(getattr(g_tiled, name))
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(
            b / scale, a / scale, atol=2e-3,
            err_msg=f"grad mismatch on {name} at tile {tile}")


@pytest.mark.slow
def test_training_step_decreases_loss():
    """One Adam step on the tiled-diff loss must reduce L1 to a target."""
    import optax
    from gsrt.models.trainer import GaussianParams, init_params

    cloud, camera = random_cloud(100, seed=3, width=32, height=32)
    cfg = RenderConfig(width=32, height=32, conic_mode="standard",
                       tile_w=16, tile_h=16, pair_chunk=128)
    target, _ = render_tiled_diff(cloud, camera, cfg, max_pairs=1 << 13,
                                  interpret=True)
    params = init_params(cloud)
    # perturb so the loss is nonzero
    params = params._replace(means=params.means + 0.05)

    def loss_fn(p):
        color, _ = render_tiled_diff(p.to_cloud(), camera, cfg,
                                     max_pairs=1 << 13, interpret=True)
        return jnp.mean(jnp.abs(color - target))

    opt = optax.adam(1e-2)
    state = opt.init(params)
    l0, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(l0))
    leaves = jax.tree_util.tree_leaves(grads)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)
    updates, state = opt.update(grads, state, params)
    params2 = optax.apply_updates(params, updates)
    l1 = float(loss_fn(params2))
    assert l1 < float(l0), (l0, l1)
