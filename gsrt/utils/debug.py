"""Sanitizers (SURVEY.md §5 race-detection row).

JAX's functional model makes data races impossible by construction; the
remaining failure modes are numeric (NaN/Inf/degenerate covariances) and
kernel logic. This module provides:

* `validate_cloud` / `validate_output` — NaN/Inf/range guards over scene
  and framebuffer SoA (the analogue of the simulator's assert-dense
  traversal, vulkan_ray_tracing.cc:647+);
* interpret-mode rendering (`render_tiled` with `interpret=True`) as the
  kernel sanitizer — the role the cycle simulator played for the reference.
"""

from __future__ import annotations

from typing import List

import numpy as np


def validate_cloud(cloud) -> List[str]:
    """Returns a list of problems (empty = clean)."""
    problems = []
    means = np.asarray(cloud.means)
    cov = np.asarray(cloud.cov3d)
    op = np.asarray(cloud.opacity)
    sh = np.asarray(cloud.sh)
    if not np.isfinite(means).all():
        problems.append("non-finite means")
    if not np.isfinite(cov).all():
        problems.append("non-finite cov3d")
    if not np.isfinite(sh).all():
        problems.append("non-finite SH coefficients")
    if (op < 0).any() or (op > 1).any():
        problems.append("opacity outside [0, 1]")
    # diagonal entries of Σ must be ≥ 0; det of each 2x2 principal minor too
    if (cov[:, [0, 3, 5]] < -1e-6).any():
        problems.append("negative covariance diagonal")
    det_xy = cov[:, 0] * cov[:, 3] - cov[:, 1] ** 2
    if (det_xy < -1e-4).any():
        problems.append("covariance not PSD (xy minor)")
    return problems


def validate_output(out) -> List[str]:
    problems = []
    trans = np.asarray(out.trans)
    color = np.asarray(out.color)
    if not np.isfinite(trans).all():
        problems.append("non-finite transmittance")
    if not np.isfinite(color).all():
        problems.append("non-finite color")
    if (trans < -1e-6).any() or (trans > 1 + 1e-5).any():
        problems.append("transmittance outside [0, 1]")
    if (color < -1e-5).any():
        problems.append("negative color")
    return problems
