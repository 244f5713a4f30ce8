"""Probe cheaper s_pair constructions at 1M splats / 3.67M pairs."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gsrt.ops.pair_expand import _merge_rank


def timeit(fn, *args, n=8):
    sync = jax.jit(lambda r: jax.tree_util.tree_leaves(r)[0].ravel()[:1].sum())
    float(sync(fn(*args)))
    t0 = time.perf_counter()
    r = None
    for _ in range(n):
        r = fn(*args)
    float(sync(r))
    return (time.perf_counter() - t0) / n


N = 1_000_000
MP = 3_670_016
rng = np.random.default_rng(0)
touched = rng.integers(1, 7, N).astype(np.int32)
off = np.cumsum(touched)
touched = np.maximum((touched * (MP * 0.95 / off[-1])).astype(np.int32), 1)
off = np.cumsum(touched).astype(np.int32)
base = jnp.asarray((off - touched).astype(np.int32))
total = int(off[-1])
print(f"total {total/1e6:.2f}M")

# current: full merge-rank
t = timeit(jax.jit(lambda b: _merge_rank(b, MP, N)), base)
print(f"full merge-rank:        {t*1e3:7.2f} ms", flush=True)
ref = np.asarray(_merge_rank(base, MP, N))


# need _merge_rank with custom queries — quick local variant
def _merge_rank_q(base, queries, n):
    keys = jnp.concatenate([base, queries])
    tag = jnp.concatenate([jnp.ones((base.shape[0],), jnp.int32),
                           jnp.zeros((queries.shape[0],), jnp.int32)])
    k1, t1 = jax.lax.sort((keys, tag), num_keys=1, is_stable=True)
    ranks = jnp.cumsum(t1) - 1
    _, s_q = jax.lax.sort((t1, ranks), num_keys=1, is_stable=True)
    return jnp.clip(s_q[:queries.shape[0]], 0, n - 1).astype(jnp.int32)


def seg_rank2(base):
    B = MP // 128
    s128 = _merge_rank_q(base, jnp.arange(B, dtype=jnp.int32) * 128, N)
    Wn = 136
    basep = jnp.concatenate([base, jnp.full((Wn,), jnp.int32(1 << 30))])
    win = basep[s128[:, None] + jnp.arange(Wn, dtype=jnp.int32)[None, :]]
    pq = (jnp.arange(B, dtype=jnp.int32) * 128)[:, None] \
        + jnp.arange(128, dtype=jnp.int32)[None, :]
    cnt = jnp.sum((win[:, :, None] <= pq[:, None, :]).astype(jnp.int32),
                  axis=1)
    s = s128[:, None] + (cnt - 1)
    return jnp.clip(s.reshape(-1), 0, N - 1)


t = timeit(jax.jit(seg_rank2), base)
print(f"segmented rank:         {t*1e3:7.2f} ms", flush=True)
got = np.asarray(seg_rank2(base))
ok = np.array_equal(got[:total], ref[:total])
print("match:", ok)
if not ok:
    bad = np.nonzero(got[:total] != ref[:total])[0]
    print("bad:", bad[:10], got[bad[:5]], ref[bad[:5]])
