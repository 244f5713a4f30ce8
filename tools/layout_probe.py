"""Probe TPU layout effects on the projection inputs."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gsrt.core.config import RenderConfig
from gsrt.models.gaussian_rt import fm_from_cloud, _precompute_fm
from gsrt.scene import random_cloud


def timeit(fn, *args, n=8):
    r = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0].ravel()[:1]))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(r)[0].ravel()[:1]))
        best = min(best, time.perf_counter() - t0)
    return best


W, H, N = 1920, 1080, 1_000_000
cfg = RenderConfig(width=W, height=H, conic_mode="standard")
cloud, camera = random_cloud(N, seed=0, width=W, height=H,
                             scale_range=(0.004, 0.03))

from gsrt.ops.gaussian import project_gaussians_fm
from gsrt.ops.sh import eval_sh_fm

# host-created canonical [3,N]/[6,N]/[16,3,N]
meansT = jnp.asarray(np.asarray(cloud.means).T.copy())
covT = jnp.asarray(np.asarray(cloud.cov3d).T.copy())
shT = jnp.asarray(np.transpose(np.asarray(cloud.sh), (1, 2, 0)).copy())

t = timeit(jax.jit(lambda m, c: project_gaussians_fm(
    m, c, camera, conic_mode="standard")), meansT, covT)
print(f"project_fm host-canonical [3,N]:   {t*1e3:7.2f} ms", flush=True)

dirs = jnp.ones((N,)) / jnp.sqrt(3.0)
t = timeit(jax.jit(lambda s, d: eval_sh_fm(s, d, d, d, 3)), shT, dirs)
print(f"eval_sh_fm host-canonical:         {t*1e3:7.2f} ms", flush=True)

# device-transposed (fm_from_cloud) versions
fm = fm_from_cloud(cloud)
t = timeit(jax.jit(lambda m, c: project_gaussians_fm(
    m, c, camera, conic_mode="standard")), fm.meansT, fm.cov3dT)
print(f"project_fm device-transposed:      {t*1e3:7.2f} ms", flush=True)
t = timeit(jax.jit(lambda s, d: eval_sh_fm(s, d, d, d, 3)), fm.shT, dirs)
print(f"eval_sh_fm device-transposed:      {t*1e3:7.2f} ms", flush=True)

# full precompute_fm from fm_from_cloud
t = timeit(jax.jit(lambda f: _precompute_fm(f, camera, cfg)), fm)
print(f"_precompute_fm (fm_from_cloud):    {t*1e3:7.2f} ms", flush=True)

# flat-forced variant
from gsrt.models.gaussian_rt import FMCloud
fm2 = jax.jit(lambda c: FMCloud(
    meansT=c.means.T.reshape(-1).reshape(3, -1),
    cov3dT=c.cov3d.T.reshape(-1).reshape(6, -1),
    opacity=c.opacity,
    shT=jnp.transpose(c.sh, (1, 2, 0)).reshape(-1).reshape(16, 3, -1)))(
        cloud)
t = timeit(jax.jit(lambda f: _precompute_fm(f, camera, cfg)), fm2)
print(f"_precompute_fm (flat-forced):      {t*1e3:7.2f} ms", flush=True)
