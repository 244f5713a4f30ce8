"""Real-TPU parity checks for the Pallas kernels (run under axon).

Interpret-mode tests (tests/) validate kernel LOGIC on CPU; this script
validates the Mosaic LOWERING on the real TPU backend, where layout/fusion
bugs have bitten before (see notes in pair_expand.py / gaussian_rt.py).

Usage: python tools/tpu_parity_check.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def check_expand_kernel():
    """expand_pairs vs numpy repeat on a run distribution that triggered
    the push-shifter collision bug (interleaved run lengths)."""
    from gsrt.ops.pair_expand import expand_pairs, TAB_ROWS, _DEAD_BASE

    rng = np.random.default_rng(0)
    n = 1000
    touched = rng.integers(0, 6, n).astype(np.int32)
    touched[rng.random(n) < 0.2] = 0
    touched = np.sort(touched)[::-1].copy()
    offsets = np.cumsum(touched).astype(np.int32)
    base = (offsets - touched).astype(np.int32)
    base[touched == 0] = _DEAD_BASE
    feats = rng.random((11, n)).astype(np.float32)
    feats[3] = base.view(np.float32)
    tabf = np.concatenate(
        [feats, np.zeros((TAB_ROWS - 11, n), np.float32)], 0)

    for chunk, mp in ((512, 4096), (384, 3840), (128, 2048)):
        out = np.asarray(jax.jit(
            lambda t, b, c=chunk, m=mp: expand_pairs(t, b, m, chunk=c))(
                jnp.asarray(tabf), jnp.asarray(base)))
        total = min(int(offsets[-1]), mp)
        ref = np.repeat(feats.T, touched, axis=0).T[:, :total]
        ok = np.array_equal(out[:11, :total], ref)
        print(f"expand chunk={chunk}: {'OK' if ok else 'MISMATCH'}")
        assert ok


def check_tiled_renderer(expand_impl):
    """render_tiled (subtile blend kernel + pallas/xla expansion) vs
    render_fast on a random cloud."""
    from gsrt.core.config import RenderConfig
    from gsrt.models import GaussianRayTracer
    from gsrt.models.gaussian_rt import render_fast
    from gsrt.scene import random_cloud

    cloud, camera = random_cloud(300, seed=3, width=64, height=48)
    cfg = RenderConfig(width=64, height=48, conic_mode="standard",
                       expand_impl=expand_impl)
    tiled = GaussianRayTracer(cfg, "tiled")(cloud, camera)
    fast = render_fast(cloud, camera, cfg)
    err = float(np.abs(np.asarray(fast.trans)
                       - np.asarray(tiled.trans)).max())
    ok = err < 5e-3
    print(f"tiled[{expand_impl}] vs fast: max|Δtrans|={err:.2e} "
          f"{'OK' if ok else 'MISMATCH'}")
    assert ok


if __name__ == "__main__":
    print("devices:", jax.devices())
    check_expand_kernel()
    check_tiled_renderer("pallas")
    check_tiled_renderer("xla")
    print("all TPU parity checks passed")
