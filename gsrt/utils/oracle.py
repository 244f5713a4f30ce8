"""NumPy oracle renderer — slow, scalar, obviously-correct.

Plays the role the cycle-level simulator played for the reference (a second
implementation of the same semantics to validate against; SURVEY.md §4).
Implements the exact multi-pass k-buffer algorithm of
GaussTracing.rgen:47-72 + RayTracing.ProceduralGauss.{rint,rchit} per pixel,
in pure double-precision-free float32 NumPy with explicit loops. Every JAX
and Pallas path is tested against this.
"""

from __future__ import annotations

import numpy as np


def exp_lut_np(segments: int = 256, x_max: float = 8.0) -> np.ndarray:
    step = x_max / segments
    x0 = np.arange(segments, dtype=np.float64) * step
    return np.stack([-np.exp(-x0), np.exp(-x0)], axis=-1).astype(np.float32)


def linear_exp_np(x: float, lut: np.ndarray, x_max: float = 8.0) -> float:
    # derive the quantization scale from the lut itself so non-default
    # segment counts / ranges stay consistent (ExpLUT.hpp uses 256 on
    # [0, 8] -> scale 32)
    scale = np.float32(lut.shape[0] / x_max)
    tx = np.float32(x) * scale
    qx = min(max(int(tx), 0), lut.shape[0] - 1)
    dx = np.float32(x) - np.float32(qx) / scale
    return np.float32(lut[qx, 0] * dx + lut[qx, 1])


def quat_scale_to_cov3d_np(quat: np.ndarray, scale: np.ndarray) -> np.ndarray:
    """Mirror of Sphere.hpp:129-160 semantics: Σ = R S² Rᵀ, upper-tri."""
    out = np.zeros((quat.shape[0], 6), np.float32)
    for i in range(quat.shape[0]):
        q = quat[i] / np.linalg.norm(quat[i])
        r, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
            [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
            [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
        ], np.float32)
        S2 = np.diag(scale[i] ** 2).astype(np.float32)
        sigma = R @ S2 @ R.T
        out[i] = [sigma[0, 0], sigma[0, 1], sigma[0, 2],
                  sigma[1, 1], sigma[1, 2], sigma[2, 2]]
    return out


def _project_one(mean, cov3d, view, fx, fy, cx, cy, conic_mode, dilation):
    R = view[:3, :3]
    t = view[:3, 3]
    p = R @ mean + t
    depth = p[2]
    if depth <= 1e-4:
        return None
    px = fx * p[0] / p[2] + cx
    py = fy * p[1] / p[2] + cy
    J = np.array([
        [fx / p[2], 0.0, -fx * p[0] / (p[2] ** 2)],
        [0.0, fy / p[2], -fy * p[1] / (p[2] ** 2)],
    ], np.float32)
    T = J @ R
    c = cov3d
    sigma = np.array([[c[0], c[1], c[2]],
                      [c[1], c[3], c[4]],
                      [c[2], c[4], c[5]]], np.float32)
    V = T @ sigma @ T.T
    a, b, cc = V[0, 0] + dilation, V[0, 1], V[1, 1] + dilation
    det = a * cc - b * b
    if conic_mode == "standard":
        if det <= 1e-12:
            return None
        quad = (cc / det, -b / det, a / det)
    else:
        quad = (a, b, cc)
    return depth, (px, py), quad


def render_reference_oracle(
    means, cov3d, opacity, view, fx, fy, cx, cy, width, height,
    k=8, max_passes=64, g_cutoff=5.6, alpha_threshold=1.0 / 255.0,
    use_exp_lut=True, conic_mode="reference", dilation=0.0,
    sh_dc=None, camera_pos=None, t_min=1e-3, t_max=1e4,
):
    """Per-pixel multi-pass k-buffer render.

    Returns (trans [H,W], passes [H,W] int, color [H,W,3] if sh_dc given).

    Algorithm = GaussTracing.rgen loop: init front=0, T=1; per pass collect
    all splats with depth > front passing the alpha gates, keep the k nearest
    (sorted ascending), T *= Π(1−α), front ← last kept depth; stop when a
    pass collects nothing (rgen:64-68) or after max_passes.
    """
    N = means.shape[0]
    lut = exp_lut_np() if use_exp_lut else None
    proj = []
    for i in range(N):
        pr = _project_one(means[i], cov3d[i], view, fx, fy, cx, cy,
                          conic_mode, dilation)
        proj.append(pr)

    trans = np.ones((height, width), np.float32)
    passes = np.zeros((height, width), np.int32)
    color = np.zeros((height, width, 3), np.float32) if sh_dc is not None else None

    for yy in range(height):
        for xx in range(width):
            front = np.float32(0.0)
            T = np.float32(1.0)
            C = np.zeros(3, np.float32)
            for _p in range(max_passes):
                cand = []  # (depth, alpha, idx)
                for i in range(N):
                    if proj[i] is None:
                        continue
                    depth, (px, py), (a, b, c) = proj[i]
                    if depth <= front:
                        continue  # rint:69-71 depth-front cull
                    if depth <= t_min or depth >= t_max:
                        continue  # rgen tMin/tMax ray window (rgen:50-51)
                    dx = np.float32(xx) - px
                    dy = np.float32(yy) - py
                    g = np.float32(0.5) * (a * dx * dx + 2 * b * dx * dy + c * dy * dy)
                    if g < 0 or g > g_cutoff:
                        continue  # rint:103
                    power = linear_exp_np(g, lut) if use_exp_lut else np.exp(-g)
                    alpha = np.float32(opacity[i] * power)
                    if conic_mode == "standard":
                        # every JAX standard-mode path clamps at 0.99
                        # (gaussian_rt._chunk_alphas, the Pallas kernels)
                        alpha = min(alpha, np.float32(0.99))
                    if alpha > alpha_threshold:  # rint:107
                        cand.append((np.float32(depth), alpha, i))
                if not cand:
                    break
                cand.sort(key=lambda s: s[0])
                kept = cand[:k]
                for d, a_, i in kept:
                    if color is not None:
                        C = C + T * a_ * sh_dc[i]
                    T = T * (np.float32(1.0) - a_)
                front = kept[-1][0]
                passes[yy, xx] += 1
            trans[yy, xx] = T
            if color is not None:
                color[yy, xx] = C
    if color is not None:
        return trans, passes, color
    return trans, passes
