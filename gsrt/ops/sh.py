"""Real spherical-harmonics color evaluation, degrees 0–3.

The reference never evaluates color for splats (GaussTracing.rgen keeps
pixelColor = vec3(0); SURVEY.md §0) — SH shading is the capability gap that
must be filled for PSNR parity with standard 3DGS scenes (.ply files store
(deg+1)² RGB coefficient triples). Constants are the standard real-SH basis
used by the original INRIA renderer.
"""

from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)


def eval_sh(sh: jnp.ndarray, dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """sh: [..., K, 3] with K ≥ (degree+1)²; dirs: [..., 3] normalized view
    directions (splat center − camera origin). Returns [..., 3] RGB
    (DC-centered: + 0.5, clamped ≥ 0, as in standard 3DGS)."""
    result = C0 * sh[..., 0, :]
    if degree >= 1:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = (result
                  - C1 * y * sh[..., 1, :]
                  + C1 * z * sh[..., 2, :]
                  - C1 * x * sh[..., 3, :])
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        result = (result
                  + C2[0] * xy * sh[..., 4, :]
                  + C2[1] * yz * sh[..., 5, :]
                  + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                  + C2[3] * xz * sh[..., 7, :]
                  + C2[4] * (xx - yy) * sh[..., 8, :])
    if degree >= 3:
        result = (result
                  + C3[0] * y * (3.0 * xx - yy) * sh[..., 9, :]
                  + C3[1] * xy * z * sh[..., 10, :]
                  + C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11, :]
                  + C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[..., 12, :]
                  + C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13, :]
                  + C3[5] * z * (xx - yy) * sh[..., 14, :]
                  + C3[6] * x * (xx - 3.0 * yy) * sh[..., 15, :])
    return jnp.maximum(result + 0.5, 0.0)


def eval_sh_fm(shT: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
               z: jnp.ndarray, degree: int):
    """Feature-major `eval_sh`: shT is [K, 3, N], view direction comes as
    [N] component rows. Returns (r, g, b) rows, each [N].

    Same basis/coefficients as `eval_sh`; lane-major rows keep the VPU and
    HBM fully utilized (an [N, K, 3] layout pads the 3-lane minor dim to
    the 128-lane tile — measured 30 ms just to READ 1M splats' SH)."""
    xx = yy = zz = None
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
    out = []
    for ch in range(3):
        result = C0 * shT[0, ch]
        if degree >= 1:
            result = (result
                      - C1 * y * shT[1, ch]
                      + C1 * z * shT[2, ch]
                      - C1 * x * shT[3, ch])
        if degree >= 2:
            result = (result
                      + C2[0] * (x * y) * shT[4, ch]
                      + C2[1] * (y * z) * shT[5, ch]
                      + C2[2] * (2.0 * zz - xx - yy) * shT[6, ch]
                      + C2[3] * (x * z) * shT[7, ch]
                      + C2[4] * (xx - yy) * shT[8, ch])
        if degree >= 3:
            result = (result
                      + C3[0] * y * (3.0 * xx - yy) * shT[9, ch]
                      + C3[1] * (x * y) * z * shT[10, ch]
                      + C3[2] * y * (4.0 * zz - xx - yy) * shT[11, ch]
                      + C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy)
                      * shT[12, ch]
                      + C3[4] * x * (4.0 * zz - xx - yy) * shT[13, ch]
                      + C3[5] * z * (xx - yy) * shT[14, ch]
                      + C3[6] * x * (xx - 3.0 * yy) * shT[15, ch])
        out.append(jnp.maximum(result + 0.5, 0.0))
    return tuple(out)
