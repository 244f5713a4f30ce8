"""Microbench of the binning pipeline's sort/expand building blocks at the
headline shapes (1M splats -> ~3.7M pairs, 32x16 tiles -> T=4080).

Times, on the real chip, each candidate in isolation so the binning rework
can be chosen from measured numbers rather than the whole-frame deltas:
  * the 5-operand stable tile sort (current production form);
  * the same sort unstable, and unstable with a second int key (a stable
    sort is usually lowered with an implicit iota tiebreaker — if the
    2-key unstable form is cheaper, within-tile depth order can ride an
    explicit depth key instead of stability);
  * the dense pair->source merge (_merge_rank: 2 sorts over N+MP rows)
    vs the coarse rank the fused expand kernel needs (_rank_at over
    N+MP/128);
  * expand_pairs vs expand_pairs_fused on an 8-row table.

Run: python tools/sort_probe.py [MP_millions]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import gsrt  # noqa: F401  (enables the compile cache)
from gsrt.ops.pair_expand import (_merge_rank, _merge_rank_blocked, _rank_at,
                                  expand_pairs, expand_pairs_fused,
                                  _DEAD_BASE)


def timeit(fn, *args, n=8):
    sync = jax.jit(lambda r: jax.tree_util.tree_leaves(r)[0].ravel()[:1].sum())
    float(sync(fn(*args)))
    t0 = time.perf_counter()
    r = None
    for _ in range(n):
        r = fn(*args)
    float(sync(r))
    return (time.perf_counter() - t0) / n


def main():
    mp_m = float(sys.argv[1]) if len(sys.argv) > 1 else 3.67
    MP = int(mp_m * 1e6) // 128 * 128
    N = 1_000_000
    T = 4080
    rng = np.random.default_rng(0)

    tile = jnp.asarray(np.sort(rng.integers(0, T, MP)).astype(np.int32))
    # shuffle within a coarse window to mimic depth-major generation
    perm = np.argsort(rng.integers(0, T, MP), kind="stable")
    tile = jnp.asarray(np.asarray(tile)[perm])
    ops4 = [jnp.asarray(rng.integers(-2**31, 2**31, MP).astype(np.int32))
            for _ in range(4)]
    depth_key = jnp.asarray(np.sort(rng.random(MP).astype(np.float32)))
    depth_int = jax.lax.bitcast_convert_type(depth_key, jnp.int32)

    def sort_stable(t, *o):
        return jax.lax.sort((t,) + o, num_keys=1, is_stable=True)

    def sort_unstable(t, *o):
        return jax.lax.sort((t,) + o, num_keys=1, is_stable=False)

    def sort_2key(t, d, *o):
        return jax.lax.sort((t, d) + o, num_keys=2, is_stable=False)

    rows = [
        ("tile sort stable 1key+4", jax.jit(sort_stable), (tile,) + tuple(ops4)),
        ("tile sort unstbl 1key+4", jax.jit(sort_unstable), (tile,) + tuple(ops4)),
        ("tile sort unstbl 2key+4", jax.jit(sort_2key),
         (tile, depth_int) + tuple(ops4)),
        ("tile sort stable 1key+3", jax.jit(sort_stable), (tile,) + tuple(ops4[:3])),
    ]

    # expand inputs: strictly increasing bases over a live prefix
    touched = rng.integers(1, 8, N).astype(np.int64)
    scale = MP / touched.sum()
    touched = np.maximum((touched * scale).astype(np.int32), 1)
    base_np = np.concatenate([[0], np.cumsum(touched)[:-1]]).astype(np.int32)
    live = np.searchsorted(base_np, MP, side="left")
    base_np[live:] = _DEAD_BASE
    base = jnp.asarray(base_np)
    tab8 = jnp.asarray(rng.random((8, N)).astype(np.float32))

    MP_pad = -(-MP // 16384) * 16384     # what expand_pairs actually asks
    rows += [
        ("merge_rank (dense s)", jax.jit(
            lambda b: _merge_rank(b, MP, N)), (base,)),
        ("merge_rank_blocked", jax.jit(
            lambda b: _merge_rank_blocked(b, MP_pad, N)), (base,)),
        ("rank_at (coarse s)", jax.jit(
            lambda b: _rank_at(jnp.minimum(b, MP),
                               jnp.arange(MP // 128 + 1, dtype=jnp.int32)
                               * 128)), (base,)),
        ("expand_pairs 8row", jax.jit(
            lambda t, b: expand_pairs(t, b, MP)), (tab8, base)),
        ("expand_fused 8row", jax.jit(
            lambda t, b: expand_pairs_fused(t, b, MP)), (tab8, base)),
    ]

    for name, fn, args in rows:
        try:
            t = timeit(fn, *args)
            print(f"{name:28s} {t*1e3:8.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
