"""Bisect the bf16 blend tier's pathological Mosaic compile.

Calls blend_packed directly on a tiny synthetic binning (no projection /
binning stages), timing AOT lower+compile per variant. Usage:
    python tools/bf16_probe.py <variant>
variants: f32, bf16, plus bisection variants added as needed.
Run each in its own process (axon re-execution pathology).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gsrt.ops.tile_binning import COMPACT_STORE, TileBinning
from gsrt.ops.splat_packed import blend_packed

W, H = 256, 256            # 16x16 tiles -> T=256, G=2 at bs=128
SUB = 16
MP = 4096


def main(variant: str) -> None:
    T = (W // SUB) * (H // SUB)
    rng = np.random.default_rng(0)
    payload = jnp.asarray(
        rng.integers(0, 1 << 20, size=(COMPACT_STORE, MP + 128 + 128),
                     dtype=np.int32))
    counts = rng.multinomial(MP, np.ones(T) / T)
    starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    binning = TileBinning(
        payload=payload,
        tile_start=jnp.asarray(starts),
        tile_count=jnp.asarray(counts.astype(np.int32)),
        total_pairs=jnp.int32(MP),
        overflow=jnp.asarray(False),
    )

    math_dtype = "bf16" if "bf16" in variant else "f32"

    def f(binning):
        color, trans = blend_packed(
            binning, width=W, height=H, sub_w=SUB, sub_h=SUB, bs=128,
            skip_range_check=True, scan_impl="logmm",
            math_dtype=math_dtype)
        return color.sum() + trans.sum()

    t0 = time.perf_counter()
    lowered = jax.jit(f).lower(binning)
    t1 = time.perf_counter()
    print(f"{variant}: lower {t1 - t0:.1f}s", flush=True)
    compiled = lowered.compile()
    t2 = time.perf_counter()
    print(f"{variant}: compile {t2 - t1:.1f}s", flush=True)
    out = float(compiled(binning))
    print(f"{variant}: run ok, out={out:.3e}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "f32")
