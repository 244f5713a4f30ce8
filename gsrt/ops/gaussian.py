"""Gaussian math: 3D covariance construction and EWA screen-space projection.

Semantics replicated from the reference (cited; code re-derived, not ported):

  * quaternion+scale → Σ = R·S²·Rᵀ, stored upper-triangular
    (RayTracingInVulkan/src/Assets/Sphere.hpp:129-160 — GLM column-major
    construction makes its `M = S*R` equal to (S·R_stdᵀ), hence
    Σ = Mᵀ·M = R_std·S²·R_stdᵀ, the standard 3DGS covariance).
  * camera-space depth = z of the transformed center, pixel projection,
    Jacobian J of the perspective map, Cov2D = (J·W)·Σ·(J·W)ᵀ
    (RayTracing.ProceduralGauss.rint:66-97).
  * response g = ½·dᵀQ d evaluated per pixel with cutoff g ∈ [0, 5.6] and
    alpha = opacity·exp(−g), thresholded at 1/255 (rint:100-107).
    Q is the *inverse* 2D covariance (conic) in "standard" mode; the
    reference's quirk of using Cov2D itself is kept as "reference" mode
    (rint:95-102 reads V's entries directly).

Everything is batched over N splats; no per-splat control flow.
"""

from __future__ import annotations

import jax.numpy as jnp

from gsrt.core.types import Camera


def quat_scale_to_cov3d(quat: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """[N,4] (w,x,y,z) quaternions + [N,3] scales → [N,6] upper-tri Σ.

    Σ = R S² Rᵀ where R is the rotation matrix of the (normalized) quaternion.
    """
    q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]

    # Rows of the standard rotation matrix. All products below are explicit
    # elementwise VPU ops — 3x3 matmuls would run through the MXU's default
    # (bf16-accumulated) path and lose ~0.4% precision for no speedup.
    r00 = 1 - 2 * (y * y + z * z); r01 = 2 * (x * y - r * z); r02 = 2 * (x * z + r * y)  # noqa: E702
    r10 = 2 * (x * y + r * z); r11 = 1 - 2 * (x * x + z * z); r12 = 2 * (y * z - r * x)  # noqa: E702
    r20 = 2 * (x * z - r * y); r21 = 2 * (y * z + r * x); r22 = 1 - 2 * (x * x + y * y)  # noqa: E702

    s0, s1, s2 = (scale * scale)[..., 0], (scale * scale)[..., 1], (scale * scale)[..., 2]

    # Σ = R diag(S²) Rᵀ: Σ_ik = Σ_j R_ij S²_j R_kj
    def entry(a0, a1, a2, b0, b1, b2):
        return a0 * s0 * b0 + a1 * s1 * b1 + a2 * s2 * b2

    return jnp.stack(
        [
            entry(r00, r01, r02, r00, r01, r02),  # xx
            entry(r00, r01, r02, r10, r11, r12),  # xy
            entry(r00, r01, r02, r20, r21, r22),  # xz
            entry(r10, r11, r12, r10, r11, r12),  # yy
            entry(r10, r11, r12, r20, r21, r22),  # yz
            entry(r20, r21, r22, r20, r21, r22),  # zz
        ],
        axis=-1,
    )


def cov3d_to_matrix(cov3d: jnp.ndarray) -> jnp.ndarray:
    """[...,6] upper-tri → [...,3,3] symmetric matrix."""
    c0, c1, c2, c3, c4, c5 = (cov3d[..., i] for i in range(6))
    row0 = jnp.stack([c0, c1, c2], -1)
    row1 = jnp.stack([c1, c3, c4], -1)
    row2 = jnp.stack([c2, c4, c5], -1)
    return jnp.stack([row0, row1, row2], -2)


def project_gaussians(
    means: jnp.ndarray,      # [N, 3]
    cov3d: jnp.ndarray,      # [N, 6]
    camera: Camera,
    conic_mode: str = "standard",
    cov2d_dilation: float = 0.0,
):
    """Project splats to screen space.

    Returns (depth [N], mean2d [N,2] pixels, quad [N,3] quadratic-form
    coefficients (a,b,c) such that g = ½(a·dx² + 2b·dx·dy + c·dy²),
    det2d [N] determinant of the dilated 2D covariance, in_front [N] bool).
    """
    R = camera.view[:3, :3]
    t = camera.view[:3, 3]
    # p_cam = R·mean + t, written elementwise (exact f32 on the VPU; a [N,3]
    # @ [3,3] matmul would take the low-precision MXU default path).
    mx, my, mz = means[..., 0], means[..., 1], means[..., 2]
    px = R[0, 0] * mx + R[0, 1] * my + R[0, 2] * mz + t[0]
    py = R[1, 0] * mx + R[1, 1] * my + R[1, 2] * mz + t[1]
    pz = R[2, 0] * mx + R[2, 1] * my + R[2, 2] * mz + t[2]
    depth = pz
    in_front = depth > 1e-4
    z = jnp.where(in_front, depth, 1.0)          # avoid div-by-zero lanes
    inv_z = 1.0 / z

    mean2d = jnp.stack(
        [camera.fx * px * inv_z + camera.cx,
         camera.fy * py * inv_z + camera.cy],
        axis=-1,
    )

    # T = J·R where J is the Jacobian of (x,y,z) → (fx·x/z, fy·y/z):
    #   J row0 = (fx/z, 0, −fx·x/z²);  row1 = (0, fy/z, −fy·y/z²)
    j00 = camera.fx * inv_z
    j02 = -camera.fx * px * inv_z * inv_z
    j11 = camera.fy * inv_z
    j12 = -camera.fy * py * inv_z * inv_z
    t00 = j00 * R[0, 0] + j02 * R[2, 0]
    t01 = j00 * R[0, 1] + j02 * R[2, 1]
    t02 = j00 * R[0, 2] + j02 * R[2, 2]
    t10 = j11 * R[1, 0] + j12 * R[2, 0]
    t11 = j11 * R[1, 1] + j12 * R[2, 1]
    t12 = j11 * R[1, 2] + j12 * R[2, 2]

    # Cov2D = T Σ Tᵀ with Σ symmetric from its 6 upper-tri entries.
    c0, c1, c2, c3, c4, c5 = (cov3d[..., i] for i in range(6))
    # u = Σ·t0ᵀ, v = Σ·t1ᵀ
    u0 = c0 * t00 + c1 * t01 + c2 * t02
    u1 = c1 * t00 + c3 * t01 + c4 * t02
    u2 = c2 * t00 + c4 * t01 + c5 * t02
    v0 = c0 * t10 + c1 * t11 + c2 * t12
    v1 = c1 * t10 + c3 * t11 + c4 * t12
    v2 = c2 * t10 + c4 * t11 + c5 * t12

    a = t00 * u0 + t01 * u1 + t02 * u2 + cov2d_dilation
    b = t10 * u0 + t11 * u1 + t12 * u2
    c = t10 * v0 + t11 * v1 + t12 * v2 + cov2d_dilation
    det = a * c - b * b

    if conic_mode == "reference":
        # Reference quirk: quadratic form = the covariance itself (rint:95-102).
        quad = jnp.stack([a, b, c], -1)
    elif conic_mode == "standard":
        inv_det = jnp.where(det > 1e-12, 1.0 / jnp.maximum(det, 1e-12), 0.0)
        quad = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], -1)
        in_front = in_front & (det > 1e-12)
    else:
        raise ValueError(f"unknown conic_mode {conic_mode!r}")

    return depth, mean2d, quad, det, in_front


def screen_radius(quad: jnp.ndarray, conic_mode: str,
                  g_cutoff: float) -> jnp.ndarray:
    """Conservative pixel radius of the region where g ≤ g_cutoff.

    g = ½ dᵀQd ≤ G  ⇔  dᵀQd ≤ 2G: an ellipse with max radius
    sqrt(2G / λ_min(Q)). For standard mode Q = Σ2D⁻¹ so λ_min(Q) = 1/λ_max(Σ2D)
    and radius = sqrt(2G·λ_max(Σ2D)).
    """
    a, b, c = quad[..., 0], quad[..., 1], quad[..., 2]
    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(mid * mid - (a * c - b * b), 0.0))
    lam_min = jnp.maximum(mid - disc, 1e-12)
    return jnp.sqrt(2.0 * g_cutoff / lam_min)


def project_gaussians_fm(
    meansT: jnp.ndarray,     # [3, N] feature-major
    cov3dT: jnp.ndarray,     # [6, N] feature-major
    camera: Camera,
    conic_mode: str = "standard",
    cov2d_dilation: float = 0.0,
):
    """Feature-major `project_gaussians`: same math on [*, N] rows.

    TPU layouts pad the minor dimension to the 128-lane tile, so [N, 3]
    inputs waste 125/128 of every vector register and HBM beat (measured:
    31 ms to project 1M splats from [N,3]/[N,6] vs ~1 ms from rows).
    Returns (depth, m2x, m2y, a, b, c, det, in_front), all [N].
    """
    R = camera.view[:3, :3]
    t = camera.view[:3, 3]
    mx, my, mz = meansT[0], meansT[1], meansT[2]
    px = R[0, 0] * mx + R[0, 1] * my + R[0, 2] * mz + t[0]
    py = R[1, 0] * mx + R[1, 1] * my + R[1, 2] * mz + t[1]
    pz = R[2, 0] * mx + R[2, 1] * my + R[2, 2] * mz + t[2]
    depth = pz
    in_front = depth > 1e-4
    z = jnp.where(in_front, depth, 1.0)
    inv_z = 1.0 / z
    m2x = camera.fx * px * inv_z + camera.cx
    m2y = camera.fy * py * inv_z + camera.cy

    j00 = camera.fx * inv_z
    j02 = -camera.fx * px * inv_z * inv_z
    j11 = camera.fy * inv_z
    j12 = -camera.fy * py * inv_z * inv_z
    t00 = j00 * R[0, 0] + j02 * R[2, 0]
    t01 = j00 * R[0, 1] + j02 * R[2, 1]
    t02 = j00 * R[0, 2] + j02 * R[2, 2]
    t10 = j11 * R[1, 0] + j12 * R[2, 0]
    t11 = j11 * R[1, 1] + j12 * R[2, 1]
    t12 = j11 * R[1, 2] + j12 * R[2, 2]

    c0, c1, c2, c3, c4, c5 = (cov3dT[i] for i in range(6))
    u0 = c0 * t00 + c1 * t01 + c2 * t02
    u1 = c1 * t00 + c3 * t01 + c4 * t02
    u2 = c2 * t00 + c4 * t01 + c5 * t02
    v0 = c0 * t10 + c1 * t11 + c2 * t12
    v1 = c1 * t10 + c3 * t11 + c4 * t12
    v2 = c2 * t10 + c4 * t11 + c5 * t12

    a = t00 * u0 + t01 * u1 + t02 * u2 + cov2d_dilation
    b = t10 * u0 + t11 * u1 + t12 * u2
    c = t10 * v0 + t11 * v1 + t12 * v2 + cov2d_dilation
    det = a * c - b * b

    if conic_mode == "standard":
        in_front = in_front & (det > 1e-12)
        # zero degenerate lanes like project_gaussians (not c/1e-12-scale
        # garbage): consumers treating the two projections as
        # interchangeable must not need an extra mask
        inv_det = jnp.where(det > 1e-12, 1.0 / jnp.maximum(det, 1e-12),
                            0.0)
        qa, qb, qc = c * inv_det, -b * inv_det, a * inv_det
    else:
        qa, qb, qc = a, b, c
    return depth, m2x, m2y, qa, qb, qc, det, in_front


def screen_extents_abc(a, b, c, conic_mode: str, g_cutoff: float,
                       opacity: jnp.ndarray | None = None,
                       alpha_threshold: float = 1.0 / 255.0,
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """`screen_extents` on separate quadratic-form columns (a, b, c).

    `conic_mode` is accepted for signature parity but the AABB formula is
    mode-invariant: it reads the quadratic form the caller already built
    (conic in standard mode, raw covariance in reference mode) — the
    mode only changed WHICH (a, b, c) arrive here."""
    det = jnp.maximum(a * c - b * b, 1e-18)
    g = jnp.asarray(g_cutoff, a.dtype)
    if opacity is not None:
        g_alpha = jnp.log(jnp.maximum(opacity / alpha_threshold, 1e-6))
        g = jnp.minimum(g, jnp.maximum(g_alpha, 0.0))
    # Q⁻¹ = (1/det)·[[c, -b], [-b, a]]
    rx = jnp.sqrt(jnp.maximum(2.0 * g * c / det, 0.0))
    ry = jnp.sqrt(jnp.maximum(2.0 * g * a / det, 0.0))
    return rx, ry


def screen_extents(quad: jnp.ndarray, conic_mode: str, g_cutoff: float,
                   opacity: jnp.ndarray | None = None,
                   alpha_threshold: float = 1.0 / 255.0,
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Tight per-axis half-extents (rx, ry) of the visible ellipse.

    The ellipse dᵀQd ≤ 2G has axis-aligned bounding box half-widths
    rx = sqrt(2G·(Q⁻¹)₀₀), ry = sqrt(2G·(Q⁻¹)₁₁). Much tighter than the
    circular radius for anisotropic splats. When `opacity` is given, G is
    further reduced to the point where alpha = opacity·e⁻ᵍ crosses the
    alpha threshold (rint:107) — beyond it the splat contributes nothing,
    so the footprint (and the pair count) shrinks for translucent splats.
    """
    return screen_extents_abc(quad[..., 0], quad[..., 1], quad[..., 2],
                              conic_mode, g_cutoff, opacity=opacity,
                              alpha_threshold=alpha_threshold)


def eval_gaussian_response(
    pix: jnp.ndarray,       # [..., 2] pixel coords
    mean2d: jnp.ndarray,    # [..., 2]
    quad: jnp.ndarray,      # [..., 3] (a, b, c)
) -> jnp.ndarray:
    """g = ½(a·dx² + 2b·dx·dy + c·dy²)  (ProceduralGauss.rint:100-102)."""
    d = pix - mean2d
    dx, dy = d[..., 0], d[..., 1]
    a, b, c = quad[..., 0], quad[..., 1], quad[..., 2]
    return 0.5 * (a * dx * dx + 2.0 * b * dx * dy + c * dy * dy)


def invert_cov3d(cov3d: jnp.ndarray, eps: float = 1e-30) -> jnp.ndarray:
    """[...,6] upper-tri Σ → [...,6] upper-tri Σ⁻¹ (closed-form adjugate)."""
    a, b, c, d, e, f = (cov3d[..., i] for i in range(6))
    # | a b c |
    # | b d e |
    # | c e f |
    A = d * f - e * e
    B = c * e - b * f
    C = b * e - c * d
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) > eps, det, eps)
    return jnp.stack(
        [A * inv_det, B * inv_det, C * inv_det,
         (a * f - c * c) * inv_det, (b * c - a * e) * inv_det,
         (a * d - b * b) * inv_det], axis=-1)


def ray_gaussian_response(orig, dirn, means, cov3d_inv):
    """Max response of rays against 3D Gaussians **in ray space** — the
    3D generalization of the pixel-space EWA test, valid for ARBITRARY rays
    (secondary/shadow), not just camera rays (3DGRT-style; the reference
    only ever evaluates camera rays in pixel space, ProceduralGauss.rint).

    For x(t) = o + t·d, q(t) = (x−μ)ᵀ Σ⁻¹ (x−μ) is minimized at
    t* = −(dᵀΣ⁻¹m)/(dᵀΣ⁻¹d) with m = o−μ. Returns (t_star [R,P],
    g_min [R,P]) where g_min = ½·q(t*) matches the 2D `g` semantics
    (alpha = opacity·exp(−g))."""
    i0, i1, i2, i3, i4, i5 = (cov3d_inv[..., i] for i in range(6))
    m = orig[:, None, :] - means[None, :, :]            # [R,P,3]
    mx, my, mz = m[..., 0], m[..., 1], m[..., 2]
    dx = dirn[:, None, 0]
    dy = dirn[:, None, 1]
    dz = dirn[:, None, 2]
    # Σ⁻¹ d  and Σ⁻¹ m (symmetric matvec, elementwise VPU)
    sd_x = i0 * dx + i1 * dy + i2 * dz
    sd_y = i1 * dx + i3 * dy + i4 * dz
    sd_z = i2 * dx + i4 * dy + i5 * dz
    d_sd = dx * sd_x + dy * sd_y + dz * sd_z            # dᵀΣ⁻¹d > 0
    m_sd = mx * sd_x + my * sd_y + mz * sd_z            # mᵀΣ⁻¹d
    sm_x = i0 * mx + i1 * my + i2 * mz
    m_sm = mx * sm_x + my * (i1 * mx + i3 * my + i4 * mz) \
        + mz * (i2 * mx + i4 * my + i5 * mz)            # mᵀΣ⁻¹m
    d_sd_safe = jnp.maximum(d_sd, 1e-12)
    t_star = -m_sd / d_sd_safe
    q_min = m_sm - (m_sd * m_sd) / d_sd_safe
    return t_star, 0.5 * jnp.maximum(q_min, 0.0)


