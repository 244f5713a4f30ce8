"""Adaptive density control (gsrt.models.densify): clone/split/prune
selection, optimizer-moment row surgery, opacity reset, and a small
end-to-end fit that grows its splat budget mid-training."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from gsrt.core.config import RenderConfig
from gsrt.models.densify import (
    DensifyStats,
    accumulate_stats,
    densify_and_prune,
    init_stats,
    make_train_step_adaptive,
    reset_opacity,
    round_up_to,
)
from gsrt.models.trainer import GaussianParams, random_init


def _params4():
    """Four splats: [0] transparent (prune), [1] hot+small (clone),
    [2] hot+large (split), [3] cold (keep)."""
    means = jnp.array([[0.0, 0, 5], [1.0, 0, 5], [2.0, 0, 5], [3.0, 0, 5]])
    log_scales = jnp.log(jnp.array(
        [[0.1] * 3, [0.1] * 3, [1.0] * 3, [0.1] * 3]))
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (4, 1))
    logit = jnp.array([-8.0, 2.0, 2.0, 2.0])   # sigmoid(-8) ≈ 3e-4 → prune
    sh = jnp.ones((4, 1, 3)) * jnp.arange(4.0)[:, None, None]
    return GaussianParams(means, log_scales, quats, logit, sh)


def _stats_hot(hot_idx, n=4, steps=10):
    g = np.zeros(n, np.float32)
    g[list(hot_idx)] = 1.0 * steps
    return DensifyStats(grad_accum=jnp.asarray(g),
                        count=jnp.full((n,), steps, jnp.int32))


def test_selection_clone_split_prune():
    params = _params4()
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    stats = _stats_hot([0, 1, 2])   # pruned splat is hot too — prune wins
    new_p, new_s, new_stats, rep = densify_and_prune(
        params, opt_state, stats, grad_threshold=0.5, scale_threshold=0.5,
        bucket=1, seed=0)
    assert rep.n_before == 4 and rep.n_pruned == 1
    assert rep.n_cloned == 1 and rep.n_split == 1
    # keep [1], [3], clone of [1], 2 children of [2] → 5 live rows
    assert rep.n_after == 5
    assert new_p.means.shape == (5, 3)
    m = np.asarray(new_p.means)
    # kept + cloned rows preserve coordinates exactly
    assert (m == np.array([1.0, 0, 5])).all(1).sum() == 2   # [1] + clone
    assert (m == np.array([3.0, 0, 5])).all(1).sum() == 1   # [3]
    # split children: sampled near parent [2], scales shrunk by 1.6
    child = np.flatnonzero(np.asarray(new_p.sh)[:, 0, 0] == 2.0)
    assert child.size == 2
    np.testing.assert_allclose(
        np.exp(np.asarray(new_p.log_scales)[child]), 1.0 / 1.6, rtol=1e-5)
    assert np.linalg.norm(m[child] - np.array([2.0, 0, 5]), axis=-1).max() \
        < 6.0  # within a few parent sigmas
    # fresh accumulators sized to the new N
    assert new_stats.grad_accum.shape == (5,)
    assert float(new_stats.grad_accum.sum()) == 0.0


def test_opt_state_row_surgery():
    params = _params4()
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    # fabricate nonzero moments so survivorship is observable: row i of
    # every per-splat moment leaf holds the value i + 1
    mu = jax.tree.map(
        lambda a: jnp.ones_like(a) * jnp.arange(
            1, a.shape[0] + 1, dtype=a.dtype
        ).reshape((-1,) + (1,) * (a.ndim - 1)),
        opt_state[0].mu)
    opt_state = (opt_state[0]._replace(mu=mu), opt_state[1])
    stats = _stats_hot([1, 2])
    new_p, new_s, _, rep = densify_and_prune(
        params, opt_state, stats, grad_threshold=0.5, scale_threshold=0.5,
        bucket=1, seed=0)
    new_mu = np.asarray(new_s[0].mu.means)
    assert new_mu.shape[0] == new_p.means.shape[0] == 5
    # survivors [1] and [3] keep their moment rows (values 2 and 4) at the
    # front; clone + split children restart at zero
    np.testing.assert_allclose(new_mu[0], 2.0)
    np.testing.assert_allclose(new_mu[1], 4.0)
    np.testing.assert_allclose(new_mu[2:], 0.0)
    # the step counter (scalar leaf) is untouched
    assert np.asarray(new_s[0].count).shape == ()


def test_bucket_padding_is_inert():
    params = _params4()
    opt = optax.adam(1e-2)
    stats = _stats_hot([1])
    new_p, _, new_stats, rep = densify_and_prune(
        params, opt.init(params), stats, grad_threshold=0.5,
        scale_threshold=0.5, bucket=8, seed=0)
    assert new_p.means.shape[0] == 8 and rep.n_after == 4
    opac = np.asarray(jax.nn.sigmoid(new_p.opacity_logit))
    assert (opac[rep.n_after:] < 1e-4).all()
    # padded quats are valid unit rotations (no NaN covariances downstream)
    q = np.asarray(new_p.quats[rep.n_after:])
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, rtol=1e-6)
    assert round_up_to(5, 8) == 8 and round_up_to(9, 8) == 16


def test_max_splats_budget():
    params = _params4()
    opt = optax.adam(1e-2)
    stats = _stats_hot([1, 2])
    new_p, _, _, rep = densify_and_prune(
        params, opt.init(params), stats, grad_threshold=0.5,
        scale_threshold=0.5, bucket=1, max_splats=4, seed=0)
    assert rep.n_after <= 4


def test_reset_opacity():
    params = _params4()
    out = reset_opacity(params, max_opacity=0.01)
    opac = np.asarray(jax.nn.sigmoid(out.opacity_logit))
    assert (opac <= 0.0100001).all()
    # already-dead rows stay at their lower logit
    assert float(out.opacity_logit[0]) == -8.0


@pytest.mark.slow
def test_fit_with_densification():
    """End-to-end: fit a 12-splat target from 6 random splats; one
    densify event mid-run grows the budget and the loss keeps dropping."""
    from gsrt.models.gaussian_rt import render_fast
    from gsrt.models.trainer import make_optimizer

    cfg = RenderConfig(width=32, height=24, conic_mode="standard")
    key = jax.random.PRNGKey(0)
    target_p = random_init(key, 12, extent=1.5)
    from gsrt.core.types import make_camera, look_at
    camera = make_camera(look_at((0, 0, 0), (0, 0, 4)), 60.0, 32, 24)
    target = render_fast(target_p.to_cloud(), camera, cfg).color

    params = random_init(jax.random.PRNGKey(1), 6, extent=1.5)
    optimizer = make_optimizer()
    opt_state = optimizer.init(params)
    stats = init_stats(6)
    step = make_train_step_adaptive(cfg, optimizer, lambda_ssim=0.0)

    losses = []
    for i in range(30):
        params, opt_state, stats, loss = step(
            params, opt_state, stats, target, camera)
        losses.append(float(loss))
    params, opt_state, stats, rep = densify_and_prune(
        params, opt_state, stats, grad_threshold=0.0,   # grow everywhere
        scale_threshold=0.2, opacity_threshold=1e-4, bucket=8, seed=0)
    assert params.means.shape[0] >= 8
    for i in range(30):
        params, opt_state, stats, loss = step(
            params, opt_state, stats, target, camera)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[5]
    out = render_fast(params.to_cloud(), camera, cfg)
    assert bool(jnp.isfinite(out.color).all())
