"""Piecewise-linear exp(-x) lookup table.

Replicates the reference's 256-segment LUT over [0, 8]
(src/Utilities/ExpLUT.hpp:10-24: slope k = -e^{-x₀}, intercept b = e^{-x₀}
at each segment's left edge) and its shader-side evaluation
(RayTracing.ProceduralGauss.rint:45-54: qx = floor(32·x), ex = k·(x−qx/32)+b).

On TPU the VPU has fast transcendentals, so exact `jnp.exp` is the default
compute path; the LUT exists for bit-parity testing and as the
`use_exp_lut=True` mode.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

SEGMENTS = 256
X_MIN = 0.0
X_MAX = 8.0
_SCALE = SEGMENTS / (X_MAX - X_MIN)  # 32.0


def build_exp_lut(segments: int = SEGMENTS, x_min: float = X_MIN,
                  x_max: float = X_MAX) -> jnp.ndarray:
    """Returns [segments, 2] array of (slope, bias) per segment."""
    step = (x_max - x_min) / segments
    x0 = x_min + np.arange(segments) * step
    slope = -np.exp(-x0)
    bias = np.exp(-x0)
    return jnp.asarray(np.stack([slope, bias], axis=-1), jnp.float32)


def linear_exp(x: jnp.ndarray, lut: jnp.ndarray,
               x_max: float = X_MAX) -> jnp.ndarray:
    """Evaluate exp(-x) via the LUT, matching the shader's arithmetic:

    tx = scale·x ; qx = floor(tx) ; dx = x − qx/scale ;
    ex = slope[qx]·dx + bias[qx], with scale = segments/x_max (32 for the
    reference's 256-segment [0, 8] table, ExpLUT.hpp:10-24) derived from
    the lut itself so non-default tables evaluate consistently (the
    NumPy oracle twin does the same). Clamped at 0: the last segment's
    linear extrapolation would go negative past x_max + 1/e-ish, and
    exp(-x) must not (g_cutoff is a free config float)."""
    scale = jnp.asarray(lut.shape[0] / x_max, x.dtype)
    tx = x * scale
    qx = jnp.clip(tx.astype(jnp.int32), 0, lut.shape[0] - 1)
    dx = x - qx.astype(x.dtype) / scale
    seg = lut[qx]  # gather [..., 2]
    return jnp.maximum(seg[..., 0] * dx + seg[..., 1], 0.0)


def exp_neg(x: jnp.ndarray, lut: jnp.ndarray | None = None,
            use_lut: bool = False) -> jnp.ndarray:
    """exp(-x): LUT path for parity, exact VPU exp otherwise."""
    if use_lut:
        assert lut is not None
        return linear_exp(x, lut)
    return jnp.exp(-x)
