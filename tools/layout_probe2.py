"""Probe 2: is the ~30 ms per-call floor output-count / output-bytes /
dispatch overhead, or real compute?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gsrt.scene import random_cloud
from gsrt.ops.gaussian import project_gaussians_fm

W, H, N = 1920, 1080, 1_000_000
cloud, camera = random_cloud(N, seed=0, width=W, height=H,
                             scale_range=(0.004, 0.03))
meansT = jnp.asarray(np.asarray(cloud.means).T.copy())
covT = jnp.asarray(np.asarray(cloud.cov3d).T.copy())


def timeit(fn, *args, n=10):
    r = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0].ravel()[:1]))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(r)[0].ravel()[:1]))
        best = min(best, time.perf_counter() - t0)
    return best


# 1. full projection, single scalar output
t = timeit(jax.jit(lambda m, c: sum(
    x.sum() for x in project_gaussians_fm(m, c, camera)[:7])), meansT, covT)
print(f"project_fm -> scalar:        {t*1e3:7.2f} ms", flush=True)

# 2. trivial elementwise, one [N] output
t = timeit(jax.jit(lambda m: m[0] * 2.0 + m[1]), meansT)
print(f"one elementwise [N] out:     {t*1e3:7.2f} ms", flush=True)

# 3. eight [N] outputs, trivial
t = timeit(jax.jit(lambda m: tuple(m[0] * k for k in range(8))), meansT)
print(f"eight [N] outs:              {t*1e3:7.2f} ms", flush=True)

# 4. heavy elementwise chain -> scalar
def chain(m):
    x = m[0]
    for _ in range(40):
        x = x * 1.0001 + m[1]
    return x.sum()
t = timeit(jax.jit(chain), meansT)
print(f"40-op chain -> scalar:       {t*1e3:7.2f} ms", flush=True)

# 5. divide + rsqrt mix -> scalar
def divchain(m):
    z = 1.0 / jnp.where(m[2] > 1e-4, m[2], 1.0)
    r = jnp.sqrt(jnp.abs(m[0] * z) + 1.0)
    return (r * z).sum()
t = timeit(jax.jit(divchain), meansT)
print(f"div+sqrt chain -> scalar:    {t*1e3:7.2f} ms", flush=True)
