"""Per-pixel cost heatmaps.

The reference visualizes per-pixel shader clocks with a 10-stop
Turbo-style colormap (assets/shaders/Heatmap.glsl:3-32, toggled at
RayTracer.cpp:215). Here the cost signals are renderer-native: splats
blended per pixel (`hits`) or k-buffer passes (`passes`).
"""

from __future__ import annotations

import numpy as np

# the reference's 10-stop colormap (Heatmap.glsl:5-16 values)
_STOPS = np.array([
    [0.0, 0.0, 0.0],
    [0.0, 0.0, 1.0],
    [0.0, 1.0, 1.0],
    [0.0, 1.0, 0.0],
    [1.0, 1.0, 0.0],
    [1.0, 0.0, 0.0],
    [1.0, 0.0, 1.0],
    [1.0, 1.0, 1.0],
    [1.0, 1.0, 1.0],
    [1.0, 1.0, 1.0],
], np.float32)


def heatmap(values, scale: float | None = None) -> np.ndarray:
    """[H,W] scalar cost → [H,W,3] colormapped image."""
    v = np.asarray(values, np.float32)
    if scale is None:
        scale = max(float(v.max()), 1e-9)
    t = np.clip(v / scale, 0.0, 1.0) * (len(_STOPS) - 1)
    i = np.clip(t.astype(np.int32), 0, len(_STOPS) - 2)
    f = (t - i)[..., None]
    return _STOPS[i] * (1 - f) + _STOPS[i + 1] * f
