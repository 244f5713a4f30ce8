"""Round-2 design microbenchmarks, part 2 (run on the real TPU chip).

Questions:
 1. blend chunk step cost at (128 px, C) vs (1024 px, C) shapes
    (the pixel-subtile kernel hypothesis: 8x less VPU work per pair)
 2. in-kernel lane gather: does take_along_axis / dynamic_gather lower?
 3. one-hot routing matmul at DEFAULT/HIGH precision and realistic shapes
 4. segmented scan (contiguous segments) overhead vs plain scan
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, n=20):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


# ---------------------------------------------------- 1. blend shape costs
def blend_shape_kernel(pay_ref, out_ref, *, PX, C, reps, seg):
    pxi = jax.lax.broadcasted_iota(jnp.int32, (PX, 1), 0)
    px = pxi.astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (PX, C), 1)

    def body(i, acc):
        mx = pay_ref[0:1, :]
        qa = pay_ref[1:2, :]
        qb = pay_ref[2:3, :]
        dx = px - mx
        dy = px - qb
        g = 0.5 * (qa * dx * dx + 2.0 * qb * dx * dy + qa * dy * dy)
        alpha = jnp.minimum(0.9 * jnp.exp(-g) + 1e-6 * acc[:, :1], 0.99)
        one_minus = 1.0 - alpha
        y = jnp.where(lane >= 1, pltpu.roll(one_minus, shift=1, axis=1), 1.0)
        d = 1
        while d < C:
            rolled = pltpu.roll(y, shift=d, axis=1)
            if seg:
                # segmented: also require same 32-lane segment
                ok = (lane >= d) & ((lane // 32) == ((lane - d) // 32))
            else:
                ok = lane >= d
            y = y * jnp.where(ok, rolled, 1.0)
            d *= 2
        return acc + alpha * y

    acc = jax.lax.fori_loop(0, reps, body, jnp.zeros((PX, C), jnp.float32))
    out_ref[...] = acc[:8]


def blend_shape(PX, C, reps, grid, seg=False):
    pay = jnp.ones((grid * 8, C), jnp.float32) * 0.5
    f = functools.partial(blend_shape_kernel, PX=PX, C=C, reps=reps, seg=seg)
    return pl.pallas_call(
        f, grid=(grid,),
        in_specs=[pl.BlockSpec((8, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, C), jnp.float32),
    )(pay)


for PX, C, reps, grid, seg in [
        (128, 256, 16, 128, False),
        (128, 256, 16, 128, True),
        (128, 128, 16, 256, False),
        (1024, 256, 16, 16, False),
        (1024, 384, 16, 11, False)]:
    fn2 = jax.jit(functools.partial(blend_shape, PX, C, reps, grid, seg))
    try:
        dt = timeit(fn2, n=5)
        chunks = reps * grid
        pairs = chunks * C
        print(f"blend ({PX}x{C}{' seg' if seg else ''}): "
              f"{dt/chunks*1e6:.2f} us/chunk, {dt/pairs*1e9:.2f} ns/pair "
              f"({dt*1e3:.1f} ms total)")
    except Exception as e:
        print(f"blend shape ({PX},{C}) FAIL: {str(e)[:160]}")


# ------------------------------------------------- 2. in-kernel lane gather
def gather_kernel(x_ref, idx_ref, out_ref):
    idx = idx_ref[...]
    out_ref[...] = jnp.take_along_axis(x_ref[...], idx, axis=1)


def gather_test(R, C):
    x = jnp.arange(R * C, dtype=jnp.float32).reshape(R, C)
    idx = jnp.broadcast_to(
        (jnp.arange(C, dtype=jnp.int32) * 7 % C)[None], (R, C))
    return pl.pallas_call(
        gather_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
    )(x, idx)


try:
    out = jax.jit(functools.partial(gather_test, 8, 256))()
    ref = np.take_along_axis(
        np.arange(8 * 256, dtype=np.float32).reshape(8, 256),
        np.broadcast_to((np.arange(256) * 7 % 256)[None], (8, 256)), axis=1)
    ok = np.allclose(np.asarray(out), ref)
    print(f"lane gather take_along_axis(axis=1): {'OK' if ok else 'WRONG'}")
except Exception as e:
    print(f"lane gather FAIL: {str(e)[:160]}")


# sublane gather (axis=0)
def gather0_kernel(x_ref, idx_ref, out_ref):
    out_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...], axis=0)


try:
    x = jnp.arange(256 * 128, dtype=jnp.float32).reshape(256, 128)
    idx = jnp.broadcast_to(
        (jnp.arange(256, dtype=jnp.int32) * 11 % 256)[:, None], (256, 128))
    out = pl.pallas_call(
        gather0_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
    )(x, idx)
    ref = np.take_along_axis(
        np.arange(256 * 128, dtype=np.float32).reshape(256, 128),
        np.broadcast_to((np.arange(256) * 11 % 256)[:, None], (256, 128)), 0)
    ok = np.allclose(np.asarray(out), ref)
    print(f"sublane gather take_along_axis(axis=0): {'OK' if ok else 'WRONG'}")
except Exception as e:
    print(f"sublane gather FAIL: {str(e)[:160]}")


# gather timing (if it lowered)
def gather_time_kernel(x_ref, idx_ref, out_ref, *, reps):
    idx = idx_ref[...]

    def body(i, acc):
        return acc + jnp.take_along_axis(x_ref[...] + acc[:1, :1], idx, axis=1)

    out_ref[...] = jax.lax.fori_loop(
        0, reps, body, jnp.zeros_like(x_ref[...]))


try:
    R, C, reps, grid = 8, 256, 64, 64
    x = jnp.ones((R * grid, C), jnp.float32)
    idx = jnp.broadcast_to(
        (jnp.arange(C, dtype=jnp.int32) * 7 % C)[None], (R, C))

    def run(x, idx):
        return pl.pallas_call(
            functools.partial(gather_time_kernel, reps=reps),
            grid=(grid,),
            in_specs=[pl.BlockSpec((R, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((R, C), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, C), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        )(x, idx)

    dt = timeit(jax.jit(run), x, idx, n=5)
    n_gathers = grid * reps
    print(f"lane gather (8x256): {dt/n_gathers*1e6:.3f} us/gather "
          f"({dt/n_gathers/C*1e9:.2f} ns/elem-col)")
except Exception as e:
    print(f"lane gather timing FAIL: {str(e)[:160]}")


# ------------------------------- 3. routing matmul, realistic shape+precision
def route_kernel(feat_ref, out_ref, *, CO, C, prec):
    sel = pltpu.bitcast(feat_ref[:, 8:9], jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (CO, C), 0)
    onehot = (rows == sel[:, 0][None, :]).astype(jnp.float32)
    out_ref[...] = jax.lax.dot_general(
        onehot, feat_ref[:, :8], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)


def route(feat, CO, C, nchunks, prec):
    f = functools.partial(route_kernel, CO=CO, C=C, prec=prec)
    return pl.pallas_call(
        f, grid=(nchunks,),
        in_specs=[pl.BlockSpec((C, 16), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((CO, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nchunks * CO, 8), jnp.float32),
    )(feat)


for CO, C, prec in [
        (512, 256, jax.lax.Precision.HIGHEST),
        (512, 256, jax.lax.Precision.DEFAULT),
        (512, 256, jax.lax.Precision.HIGH)]:
    NCH = 8192
    featn = np.random.rand(NCH * C, 16).astype(np.float32)
    sel = np.random.randint(0, CO, NCH * C).astype(np.int32)
    featn[:, 8] = sel.view(np.float32)
    feat = jnp.asarray(featn)
    fn = jax.jit(functools.partial(route, CO=CO, C=C, nchunks=NCH, prec=prec))
    try:
        dt = timeit(fn, feat, n=5)
        rows = NCH * C
        print(f"route ({CO}x{C}) {str(prec).split('.')[-1]}: "
              f"{dt/rows*1e9:.2f} ns/row ({dt*1e3:.1f} ms / {rows/1e6:.1f}M)")
    except Exception as e:
        print(f"route matmul FAIL: {str(e)[:160]}")


# exactness of HIGH-precision one-hot routing
def _route_exact(prec):
    C, CO = 256, 512
    featn = np.random.rand(C, 16).astype(np.float32)
    sel = np.random.randint(0, CO, C).astype(np.int32)
    featn[:, 8] = sel.view(np.float32)
    out = np.asarray(jax.jit(functools.partial(
        route, CO=CO, C=C, nchunks=1, prec=prec))(jnp.asarray(featn)))
    ref = np.zeros((CO, 8), np.float32)
    for c in range(C):
        ref[sel[c]] += featn[c, :8]
    exact = np.array_equal(out[np.sort(np.unique(sel))],
                           ref[np.sort(np.unique(sel))])
    return exact


for prec in [jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGH,
             jax.lax.Precision.DEFAULT]:
    try:
        print(f"route exactness {str(prec).split('.')[-1]}: "
              f"{_route_exact(prec)}")
    except Exception as e:
        print(f"route exactness FAIL: {str(e)[:120]}")
