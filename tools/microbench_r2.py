"""Round-2 design microbenchmarks (run on the real TPU chip).

Questions:
 1. How big can a scalar-prefetch (SMEM) array be? (16K tiles needs 64KB)
 2. In-kernel one-hot routing matmul throughput: (C_out x C) x (C x 8)
 3. Cost of a (128, C) blend-shaped chunk step vs the current (8,128,C)
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, n=20):
    fn(*args)  # compile+warm
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


# ---------------------------------------------------------------- 1. SMEM cap
def smem_probe(T):
    def kernel(ts_ref, x_ref, o_ref):
        t = pl.program_id(0)
        o_ref[...] = x_ref[...] * (ts_ref[t] + ts_ref[T - 1 - t]).astype(
            jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(4,),
        in_specs=[pl.BlockSpec((8, 128), lambda t, ts: (t, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda t, ts: (t, 0)),
    )
    x = jnp.ones((32, 128), jnp.float32)
    ts = jnp.arange(T, dtype=jnp.int32)
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32))(ts, x)
    return float(out.sum())


for T in (2048, 16384, 32768, 131072):
    try:
        v = smem_probe(T)
        print(f"SMEM prefetch {T} int32 ({T*4//1024}KB): OK")
    except Exception as e:
        print(f"SMEM prefetch {T}: FAIL {str(e)[:120]}")


# ------------------------------------------------- 2. routing matmul in kernel
# per chunk: build one-hot (CO x C) from ranks, multiply (C x 8) features
def route_kernel(feat_ref, out_ref, *, CO, C):
    # feature col 8 carries the int32 destination rank (bitcast)
    sel = pltpu.bitcast(feat_ref[:, 8:9], jnp.int32)  # (C, 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (CO, C), 0)
    onehot = (rows == sel[:, 0][None, :]).astype(jnp.float32)
    out_ref[...] = jax.lax.dot_general(
        onehot, feat_ref[:, :8], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def route(feat, CO, C, nchunks):
    f = functools.partial(route_kernel, CO=CO, C=C)
    return pl.pallas_call(
        f,
        grid=(nchunks,),
        in_specs=[pl.BlockSpec((C, 16), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((CO, 8), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nchunks * CO, 8), jnp.float32),
    )(feat)


C, CO, NCH = 1024, 1024, 4096  # 4.2M rows routed
featn = np.random.rand(NCH * C, 16).astype(np.float32)
sel = (np.random.permutation(
    np.tile(np.arange(C, dtype=np.int32), NCH)) % CO)
featn[:, 8] = sel.view(np.float32)
feat = jnp.asarray(featn)
fn = jax.jit(functools.partial(route, CO=CO, C=C, nchunks=NCH))
try:
    dt = timeit(fn, feat, n=5)
    rows = NCH * C
    print(f"route matmul f32 HIGHEST: {dt*1e3:.2f} ms for {rows/1e6:.1f}M rows"
          f" = {dt/rows*1e9:.2f} ns/row "
          f"({2*rows*C*8/dt/1e12:.1f} TFLOP/s)")
except Exception as e:
    print(f"route matmul FAIL: {str(e)[:200]}")


# --------------------------------------- 3. blend chunk shapes: VPU throughput
def blend_shape_kernel(pay_ref, out_ref, *, PX, C, reps):
    # emulate the EWA+scan arithmetic footprint on a (PX, C) block
    px = jax.lax.broadcasted_iota(jnp.float32, (PX, 1), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (PX, C), 1)

    def body(i, acc):
        mx = pay_ref[0:1, :]
        qa = pay_ref[1:2, :]
        dx = px - mx
        g = 0.5 * qa * dx * dx + 0.01 * acc[:, :1]
        alpha = jnp.minimum(0.9 * jnp.exp(-g), 0.99)
        one_minus = 1.0 - alpha
        y = jnp.where(lane >= 1, pltpu.roll(one_minus, shift=1, axis=1), 1.0)
        d = 1
        while d < C:
            y = y * jnp.where(lane >= d, pltpu.roll(y, shift=d, axis=1), 1.0)
            d *= 2
        return acc + alpha * y

    acc = jax.lax.fori_loop(0, reps, body, jnp.zeros((PX, C), jnp.float32))
    out_ref[...] = acc


def blend_shape(PX, C, reps, grid):
    pay = jnp.ones((grid * 8, C), jnp.float32) * 0.5
    f = functools.partial(blend_shape_kernel, PX=PX, C=C, reps=reps)
    out = pl.pallas_call(
        f, grid=(grid,),
        in_specs=[pl.BlockSpec((8, C), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((PX, C), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((PX, C), jnp.float32),
    )(pay)
    return out


# current shape: per chunk work = 1024 px x 256 pairs (as (8,128,256))
# new shape: 128 px x 256 pairs as (128, 256)
for PX, C, reps, grid in [(128, 256, 16, 128), (1024, 256, 16, 16)]:
    fn2 = jax.jit(functools.partial(blend_shape, PX, C, reps, grid))
    try:
        dt = timeit(fn2, n=5)
        chunks = reps * grid
        print(f"blend ({PX}x{C}) scan+ewa: {dt/chunks*1e6:.2f} us/chunk "
              f"({chunks} chunks, {dt*1e3:.1f} ms total)")
    except Exception as e:
        print(f"blend shape ({PX},{C}) FAIL: {str(e)[:200]}")
