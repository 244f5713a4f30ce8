"""Ablate the pair-expand kernel at bench scale: DMA-only vs +shifter vs
full, plus the XLA-side searchsorted — locate the 70 ms."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsrt.ops.pair_expand import TAB_ROWS, _DEAD_BASE, expand_pairs


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
scale = MP * 0.95 / off[-1]
# rescale to ~MP total pairs
touched = np.maximum((touched * scale).astype(np.int32), 1)
off = np.cumsum(touched).astype(np.int32)
base = (off - touched).astype(np.int32)
tabf = rng.random((TAB_ROWS, N), np.float32)
tabf[3] = base.view(np.float32)
tabf_j = jnp.asarray(tabf)
base_j = jnp.asarray(base)
print(f"total pairs {off[-1]/1e6:.2f}M", flush=True)

# XLA-side searchsorted alone
def ss(base):
    q = jnp.arange(MP, dtype=jnp.int32)
    return jnp.clip(jnp.searchsorted(base, q, side="right",
                                     method="sort").astype(jnp.int32) - 1,
                    0, N - 1)
t = timeit(jax.jit(ss), base_j)
print(f"searchsorted(3.67M):      {t*1e3:7.2f} ms", flush=True)

# full expand at various chunks
for ch in (1024, 4096, 8192):
    f = jax.jit(functools.partial(expand_pairs, max_pairs=MP, chunk=ch))
    t = timeit(f, tabf_j, base_j)
    print(f"expand_pairs chunk={ch:5d}: {t*1e3:7.2f} ms", flush=True)


# kernel variants: DMA-only and DMA+shifter-no-srow
def make_variant(chunk, mode):
    W = chunk + 128
    mp_pad = -(-MP // chunk) * chunk
    G = mp_pad // chunk

    def kern(src_start_ref, tabf_hbm, srow_hbm, out_ref, tbuf, sbuf, sem):
        g = pl.program_id(0)
        ng = pl.num_programs(0)

        def dma_t(slot, gi):
            col = pl.multiple_of(src_start_ref[gi], 128)
            return pltpu.make_async_copy(
                tabf_hbm.at[:, pl.ds(col, W)], tbuf.at[slot],
                sem.at[slot, 0])

        def dma_s(slot, gi):
            return pltpu.make_async_copy(
                srow_hbm.at[:, pl.ds(gi * chunk, W)], sbuf.at[slot],
                sem.at[slot, 1])

        @pl.when(g == 0)
        def _():
            dma_t(0, 0).start()
            dma_s(0, 0).start()
        slot = jax.lax.rem(g, 2)

        @pl.when(g + 1 < ng)
        def _():
            dma_t(1 - slot, g + 1).start()
            dma_s(1 - slot, g + 1).start()
        dma_t(slot, g).wait()
        dma_s(slot, g).wait()
        y = pltpu.bitcast(tbuf[slot], jnp.int32)
        if mode == "dma":
            out_ref[...] = pltpu.bitcast(y[:, 128:128 + chunk], jnp.float32)
            return
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        s_w = sbuf[slot][0:1, :] - src_start_ref[g]
        s_w = jnp.minimum(jnp.maximum(s_w, 0), lane)
        d = lane - s_w
        b = 1
        while b * 2 < W:
            b *= 2
        nroll = 0
        while b >= 1:
            take = (d & b) != 0
            y = jnp.where(take, pltpu.roll(y, shift=b, axis=1), y)
            b //= 2
            nroll += 1
            if mode == "one_roll" and nroll >= 1:
                break
        out_ref[...] = pltpu.bitcast(y[:, 128:128 + chunk], jnp.float32)

    def run(tabf, base):
        n_pad = W + ((-N) % 128)
        tabf = jnp.pad(tabf, ((0, 0), (0, n_pad)))
        q = jnp.arange(mp_pad, dtype=jnp.int32)
        s_pair = jnp.clip(jnp.searchsorted(base, q, side="right",
                                           method="sort").astype(jnp.int32)
                          - 1, 0, N - 1)
        srow = jnp.pad(s_pair[None, :], ((0, 7), (128, 0)))
        src_start = (jax.lax.slice(s_pair, (0,), (mp_pad,), (chunk,))
                     // 128) * 128
        tabf, srow, src_start = jax.lax.optimization_barrier(
            (tabf, srow, src_start))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(G,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                      pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((TAB_ROWS, chunk),
                                   index_map=lambda g, ss: (0, g)),
            scratch_shapes=[
                pltpu.VMEM((2, TAB_ROWS, W), jnp.float32),
                pltpu.VMEM((2, 8, W), jnp.int32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ])
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((TAB_ROWS, mp_pad), jnp.float32),
        )(src_start, tabf, srow)
    return run


for mode in ("dma", "one_roll", "full"):
    for ch in (4096,):
        f = jax.jit(make_variant(ch, mode))
        t = timeit(f, tabf_j, base_j)
        print(f"variant {mode:9s} chunk={ch}: {t*1e3:7.2f} ms", flush=True)
