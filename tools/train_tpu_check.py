"""On-TPU check of the tiled training path at the VERDICT target scale:
100K splats, 800x600, one optimization step + grad-parity spot check."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from gsrt.core.config import RenderConfig
from gsrt.models.gaussian_rt import GaussianRayTracer, render_fast
from gsrt.models.tiled_diff import render_tiled_diff
from gsrt.models.trainer import (init_params, make_optimizer,
                                 train_step_tiled)
from gsrt.scene import random_cloud

W, H, N = 800, 600, 100_000
cfg = RenderConfig(width=W, height=H, conic_mode="standard",
                   tile_w=16, tile_h=16, pair_chunk=128)
cloud, camera = random_cloud(N, seed=0, width=W, height=H,
                             scale_range=(0.01, 0.06))
mp = GaussianRayTracer(cfg, "tiled").calibrate(cloud, camera)
print(f"max_pairs={mp}", flush=True)

target, _ = jax.jit(functools.partial(
    render_tiled_diff, camera=camera, cfg=cfg, max_pairs=mp))(cloud)
target = jax.lax.stop_gradient(target)
print("target rendered", flush=True)

params = init_params(cloud)
params = params._replace(means=params.means + 0.02)
opt = make_optimizer()
state = opt.init(params)

step = jax.jit(functools.partial(
    train_step_tiled, cfg=cfg, optimizer=opt, max_pairs=mp,
    lambda_ssim=0.0))
t0 = time.perf_counter()
params, state, loss0 = step(params, state, target=target, camera=camera)
l0 = float(loss0)
print(f"step 1 (compile) loss={l0:.5f} [{time.perf_counter()-t0:.1f}s]",
      flush=True)
losses = [l0]
t0 = time.perf_counter()
for i in range(5):
    params, state, loss = step(params, state, target=target, camera=camera)
    losses.append(float(loss))
dt = (time.perf_counter() - t0) / 5
print(f"losses: {['%.5f' % l for l in losses]}  {dt*1e3:.0f} ms/step",
      flush=True)
assert losses[-1] < losses[0], "loss did not decrease"

# grad parity vs render_fast AD on a small slice
Ws, Hs = 64, 48
cloud_s, cam_s = random_cloud(300, seed=4, width=Ws, height=Hs)
cfg_s = RenderConfig(width=Ws, height=Hs, conic_mode="standard",
                     tile_w=16, tile_h=16, pair_chunk=128)
wc = jax.random.normal(jax.random.PRNGKey(1), (Hs, Ws, 3))


def loss_fast(c):
    return jnp.sum(render_fast(c, cam_s, cfg_s).color * wc)


def loss_tiled(c):
    color, _ = render_tiled_diff(c, cam_s, cfg_s, max_pairs=1 << 13)
    return jnp.sum(color * wc)


gf = jax.jit(jax.grad(loss_fast))(cloud_s)
gt = jax.jit(jax.grad(loss_tiled))(cloud_s)
for name in ("means", "cov3d", "opacity", "sh"):
    a, b = np.asarray(getattr(gf, name)), np.asarray(getattr(gt, name))
    scale = np.abs(a).max() + 1e-8
    err = np.abs(a - b).max() / scale
    print(f"grad {name}: rel err {err:.2e}", flush=True)
    assert err < 2e-3, name
print("TPU training check OK", flush=True)
