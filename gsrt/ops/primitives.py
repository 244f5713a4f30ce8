"""Analytic ray-primitive intersections, batched.

Re-derivations of the reference's procedural intersection shaders
(assets/shaders/RayTracing.Procedural*.rint: sphere quadratic, cube slab,
cylinder) and its triangle test (Möller–Trumbore,
vulkan-sim/src/cuda-sim/vulkan_ray_tracing.cc:1184-1206 `mt_ray_triangle_test`)
as vectorized VPU ops. All functions broadcast rays [R,3] against
primitives [P,...] → [R,P] hit distances (inf on miss) + normals.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INF = jnp.inf


def ray_sphere(orig, dirn, centers, radii, t_min, t_max):
    """[R,3] rays vs [P] spheres → t [R,P] (inf on miss).

    Same quadratic as RayTracing.Procedural.rint (sphere): solves
    |o + t·d − c|² = r², keeps the nearest root inside (t_min, t_max).
    """
    oc = orig[:, None, :] - centers[None, :, :]          # [R,P,3]
    # general quadratic a·t² + 2b·t + c with a = |d|² (Procedural.rint:25-33)
    # — bounce directions are UNNORMALIZED (normal + unit-sphere sample,
    # Scatter.glsl:20), so assuming a = 1 solves the wrong equation for
    # every secondary ray
    a = jnp.sum(dirn * dirn, axis=-1)[:, None]           # [R,1]
    b = jnp.sum(oc * dirn[:, None, :], axis=-1)          # [R,P]
    c = jnp.sum(oc * oc, axis=-1) - (radii ** 2)[None, :]
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    a_safe = jnp.maximum(a, 1e-12)
    t0 = (-b - sq) / a_safe
    t1 = (-b + sq) / a_safe
    t = jnp.where((t0 > t_min) & (t0 < t_max), t0,
                  jnp.where((t1 > t_min) & (t1 < t_max), t1, INF))
    return jnp.where(disc > 0, t, INF)


def sphere_normal(point, center):
    n = point - center
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


def ray_box(orig, dirn, box_min, box_max, t_min, t_max):
    """[R,3] rays vs [P] AABBs (slab test — the reference's ray_box_test,
    vulkan_ray_tracing.cc:217-246, and the cube rint). → t [R,P]."""
    inv = 1.0 / jnp.where(jnp.abs(dirn) > 1e-12, dirn,
                          jnp.where(dirn >= 0, 1e-12, -1e-12))
    lo = (box_min[None, :, :] - orig[:, None, :]) * inv[:, None, :]
    hi = (box_max[None, :, :] - orig[:, None, :]) * inv[:, None, :]
    t_near = jnp.max(jnp.minimum(lo, hi), axis=-1)       # [R,P]
    t_far = jnp.min(jnp.maximum(lo, hi), axis=-1)
    hit = (t_near <= t_far) & (t_far > t_min)
    t = jnp.where(t_near > t_min, t_near, t_far)
    return jnp.where(hit & (t > t_min) & (t < t_max), t, INF)


def box_normal(point, box_min, box_max, eps=1e-4):
    """Outward normal of the face containing `point`."""
    center = 0.5 * (box_min + box_max)
    half = 0.5 * (box_max - box_min)
    local = (point - center) / jnp.maximum(half, 1e-12)
    ax = jnp.argmax(jnp.abs(local), axis=-1)
    sign = jnp.sign(jnp.take_along_axis(local, ax[..., None], -1))[..., 0]
    return jnp.eye(3)[ax] * sign[..., None]


def ray_cylinder(orig, dirn, centers, radii, half_h, t_min, t_max):
    """Y-axis-aligned capped cylinders (the reference's cylinder rint).
    → t [R,P]."""
    oc = orig[:, None, :] - centers[None, :, :]
    dx, dz = dirn[:, None, 0], dirn[:, None, 2]
    ox, oz = oc[..., 0], oc[..., 2]
    a = dx * dx + dz * dz
    b = ox * dx + oz * dz
    c = ox * ox + oz * oz - (radii ** 2)[None, :]
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    a_safe = jnp.where(jnp.abs(a) > 1e-12, a, 1e-12)
    t0 = (-b - sq) / a_safe
    t1 = (-b + sq) / a_safe

    def side_ok(t):
        y = oc[..., 1] + t * dirn[:, None, 1]
        return (disc > 0) & (t > t_min) & (t < t_max) & \
               (jnp.abs(y) <= half_h[None, :])

    t_side = jnp.where(side_ok(t0), t0, jnp.where(side_ok(t1), t1, INF))

    # caps: y = ±half_h planes within radius
    dy = dirn[:, None, 1]
    dy_safe = jnp.where(jnp.abs(dy) > 1e-12, dy, 1e-12)
    t_cap = INF
    for s in (-1.0, 1.0):
        tc = (s * half_h[None, :] - oc[..., 1]) / dy_safe
        x = ox + tc * dx
        z = oz + tc * dz
        ok = (tc > t_min) & (tc < t_max) & \
             (x * x + z * z <= (radii ** 2)[None, :]) & (jnp.abs(dy) > 1e-12)
        t_cap = jnp.minimum(t_cap, jnp.where(ok, tc, INF))
    return jnp.minimum(t_side, t_cap)


def cylinder_normal(point, center, radius, half_h, eps: float = 1e-4):
    """Outward normal of a capped y-axis cylinder at a surface point:
    cap normal (0, ±1, 0) within eps·half_h of a cap plane, radial
    (x, 0, z)/r otherwise."""
    rel = point - center
    on_cap = jnp.abs(jnp.abs(rel[..., 1]) - half_h) <= eps * half_h
    cap_n = jnp.stack([jnp.zeros_like(rel[..., 1]),
                       jnp.sign(rel[..., 1]),
                       jnp.zeros_like(rel[..., 1])], -1)
    side = rel * jnp.array([1.0, 0.0, 1.0])
    side_n = side / jnp.maximum(
        jnp.linalg.norm(side, axis=-1, keepdims=True), 1e-12)
    return jnp.where(on_cap[..., None], cap_n, side_n)


def ray_triangle(orig, dirn, v0, v1, v2, t_min, t_max):
    """Möller–Trumbore, [R,3] rays × [P] triangles → (t [R,P], u, v).

    Mirrors mt_ray_triangle_test (vulkan_ray_tracing.cc:1184-1206)."""
    e1 = v1 - v0                                         # [P,3]
    e2 = v2 - v0
    pvec = jnp.cross(dirn[:, None, :], e2[None, :, :])   # [R,P,3]
    det = jnp.sum(e1[None, :, :] * pvec, axis=-1)        # [R,P]
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = orig[:, None, :] - v0[None, :, :]
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])
    v = jnp.sum(dirn[:, None, :] * qvec, axis=-1) * inv_det
    t = jnp.sum(e2[None, :, :] * qvec, axis=-1) * inv_det
    hit = (jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & \
          (t > t_min) & (t < t_max)
    return jnp.where(hit, t, INF), u, v


def triangle_normal(v0, v1, v2):
    n = jnp.cross(v1 - v0, v2 - v0)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


def mandelbulb_de(p: jnp.ndarray, power: float = 8.0,
                  iters: int = 8) -> jnp.ndarray:
    """Power-8 Mandelbulb distance estimator, [ ...,3] → [...].

    Same algorithm as RayTracing.ProceduralMandelbulb.rint:100-143 (which
    Taylor-approximates sin/cos/log only because the simulated GPU lacked
    transcendentals — the VPU has them natively). Includes the shader's
    45°-about-z pre-rotation."""
    c, s = jnp.cos(jnp.pi / 4), jnp.sin(jnp.pi / 4)
    px = p[..., 0] * c - p[..., 1] * s
    py = p[..., 0] * s + p[..., 1] * c
    p = jnp.stack([px, py, p[..., 2]], -1)

    zn = p
    m = jnp.sum(zn * zn, -1)
    dz = jnp.ones_like(m)
    h = jnp.zeros_like(m)

    def body(_, state):
        zn, m, dz, h = state
        rad = jnp.sqrt(jnp.maximum(m, 1e-20))
        escaped = rad > 2.0
        h_new = 0.25 * jnp.log(jnp.maximum(m, 1e-20)) * rad / dz
        dz_new = power * m ** 3.5 * dz + 1.0
        th = jnp.arctan2(jnp.linalg.norm(zn[..., :2], axis=-1), zn[..., 2])
        phi = jnp.arctan2(zn[..., 1], zn[..., 0])
        rp = rad ** power
        zn_new = jnp.stack(
            [rp * jnp.sin(power * th) * jnp.cos(power * phi),
             rp * jnp.sin(power * th) * jnp.sin(power * phi),
             rp * jnp.cos(power * th)], -1) + p
        zn = jnp.where(escaped[..., None], zn, zn_new)
        dz = jnp.where(escaped, dz, dz_new)
        h = jnp.where(escaped, h_new, h)
        m = jnp.sum(zn * zn, -1)
        return zn, m, dz, h

    _, _, _, h = jax.lax.fori_loop(0, iters, body, (zn, m, dz, h))
    return h


def ray_mandelbulb(orig, dirn, centers, radii, t_min, t_max,
                   steps: int = 96):
    """Sphere-bounded DE ray march (ProceduralMandelbulb.rint:146-166).
    [R,3] rays × [P] bulbs → t [R,P] (inf on miss).

    The march is done on the NORMALIZED ray (DE returns world distances,
    so stepping the raw parameter by DE over-advances by |d|; the entry/
    exit quadratic likewise needs a = |d|²) and converted back to the
    caller's parameter units at the end. Origins INSIDE the bounding
    sphere start marching at t_min rather than at the sphere's exit —
    otherwise the bulb never self-shadows or appears in reflections from
    nearby geometry."""
    dmag = jnp.sqrt(jnp.sum(dirn * dirn, -1, keepdims=True))     # [R,1]
    dmag = jnp.maximum(dmag, 1e-12)
    dn = dirn / dmag
    oc = orig[:, None, :] - centers[None, :, :]
    b = jnp.sum(oc * dn[:, None, :], -1)                         # [R,P]
    c = jnp.sum(oc * oc, -1) - (radii ** 2)[None, :]
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_entry = -b - sq
    t_exit = -b + sq
    tmin_w = t_min * dmag                                        # [R,1]
    tmax_w = t_max * dmag
    inside = c < 0
    start = jnp.maximum(jnp.where(inside, tmin_w, t_entry), tmin_w)
    valid = (disc > 0) & (t_exit > tmin_w) & (start < tmax_w)

    def body(_, t):
        pt = orig[:, None, :] + t[..., None] * dn[:, None, :]
        d = mandelbulb_de(pt - centers[None, :, :])
        return jnp.where(t <= t_exit, t + d, t)

    t = jax.lax.fori_loop(0, steps, body,
                          jnp.where(valid, start, t_exit + 1.0))
    hit = (t <= t_exit) & valid & (t < tmax_w)
    return jnp.where(hit, t / dmag, INF)


def mandelbulb_normal(p, eps: float = 1e-3):
    """Central-difference DE gradient."""
    def d(v):
        return mandelbulb_de(p + v)
    ex = jnp.array([eps, 0, 0])
    ey = jnp.array([0, eps, 0])
    ez = jnp.array([0, 0, eps])
    n = jnp.stack([d(ex) - d(-ex), d(ey) - d(-ey), d(ez) - d(-ez)], -1)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
