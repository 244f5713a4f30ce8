"""Core SoA dtypes.

TPU-first reworking of the reference's AoS device buffers
(gauss_param_t / splat_info_t / ray_info_t at
RayTracingInVulkan/src/Assets/Sphere.hpp:10-25 and Scene.hpp): everything is
a struct-of-arrays NamedTuple (automatic JAX pytree) so fields land as dense
[N,...] arrays in HBM and map onto 8x128 VPU lanes / 128x128 MXU tiles.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class GaussianCloud(NamedTuple):
    """SoA Gaussian scene: the reference's GaussParam SSBO (Gauss.glsl:1-6),

    batched, plus SH color coefficients (absent in the reference — its rgen
    never accumulates color, GaussTracing.rgen:33,75 — but required for the
    PSNR north star).
    """

    means: jnp.ndarray      # [N, 3] world-space centers
    cov3d: jnp.ndarray      # [N, 6] upper-triangular Σ (xx, xy, xz, yy, yz, zz)
    opacity: jnp.ndarray    # [N]
    sh: jnp.ndarray         # [N, K, 3] real SH coefficients (K=(deg+1)²; K=1 → DC)

    @property
    def n(self) -> int:
        return self.means.shape[0]

    @property
    def sh_degree(self) -> int:
        return int(round(self.sh.shape[1] ** 0.5)) - 1

    def aabbs(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Per-splat AABBs, radius = 3·sqrt(max eigenvalue bound).

        The reference uses radius = 3·max(scale) (Sphere.hpp:164). From the
        stored covariance the equivalent bound is 3·sqrt(max diagonal of Σ)
        per axis; we use the tighter per-axis 3σ box: half-extent_i = 3·sqrt(Σ_ii).
        """
        sigma_diag = self.cov3d[:, jnp.array([0, 3, 5])]
        half = 3.0 * jnp.sqrt(jnp.maximum(sigma_diag, 0.0))
        return self.means - half, self.means + half


import dataclasses

import jax


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Pinhole camera.

    view: [4,4] world→camera. Convention: camera looks down **+z**, x right,
    y down — so camera-space z *is* the reference's depth (`t.z`,
    ProceduralGauss.rint:68) and projects as px = fx·x/z + cx.
    (The reference mixes GL clip math with a +z depth test; we keep a single
    consistent convention and validate against our oracle.)

    width/height are static (pytree aux data) so image shapes stay concrete
    under `jit`.
    """

    view: jnp.ndarray       # [4, 4] world→camera
    fx: jnp.ndarray         # focal in pixels
    fy: jnp.ndarray
    cx: jnp.ndarray         # principal point in pixels
    cy: jnp.ndarray
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))

    @property
    def cam_to_world(self) -> jnp.ndarray:
        return jnp.linalg.inv(self.view)

    @property
    def position(self) -> jnp.ndarray:
        # inverse of [R|t]: origin = -Rᵀ t
        R = self.view[:3, :3]
        t = self.view[:3, 3]
        return -R.T @ t


def make_camera(view: np.ndarray, fov_y_deg: float, width: int, height: int) -> Camera:
    """Build a Camera from a world→camera matrix and vertical FOV.

    Matches the reference's intrinsics: fy = Projection[1][1]·H/2 with
    Projection[1][1] = 1/tan(fov/2)  (RayTracer.cpp:44, ProceduralGauss.rint:78-79).
    fx uses the same focal for square pixels (the reference computes
    fx = P[0][0]·H/2 which only equals the true pixel focal when W == H — a
    quirk we do not replicate).
    """
    f = 0.5 * height / np.tan(np.radians(fov_y_deg) * 0.5)
    return Camera(
        view=jnp.asarray(view, jnp.float32),
        fx=jnp.float32(f),
        fy=jnp.float32(f),
        cx=jnp.float32(width * 0.5),
        cy=jnp.float32(height * 0.5),
        width=width,
        height=height,
    )


def look_at(eye, target, up=(0.0, 1.0, 0.0)) -> np.ndarray:
    """world→camera matrix, +z forward / y down (image convention)."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    n = np.linalg.norm(right)
    if n < 1e-8:
        # view parallel to up (straight down/up camera): fall back to an
        # axis not parallel to fwd instead of dividing a zero cross into
        # an all-NaN matrix
        alt = np.array([0.0, 0.0, 1.0]) if abs(fwd[2]) < 0.9 \
            else np.array([1.0, 0.0, 0.0])
        right = np.cross(fwd, alt)
        n = np.linalg.norm(right)
    right = right / n
    down = np.cross(fwd, right)  # y axis points down in image space
    R = np.stack([right, down, fwd], axis=0)  # rows = camera axes
    view = np.eye(4)
    view[:3, :3] = R
    view[:3, 3] = -R @ eye
    return view.astype(np.float32)


class RayBundle(NamedTuple):
    """Wavefront ray SoA (replaces per-thread ray state in the PTX
    interpreter, vulkan_ray_tracing.h:248-372)."""

    origins: jnp.ndarray     # [R, 3]
    directions: jnp.ndarray  # [R, 3] normalized
    t_min: jnp.ndarray       # [R]
    t_max: jnp.ndarray       # [R]

    @property
    def n(self) -> int:
        return self.origins.shape[0]


class HitBuffer(NamedTuple):
    """Per-ray k-nearest splat buffer — SoA version of
    NextK[ray][8] splat_info_t{depth, alpha} (Scene.hpp / Gauss.glsl:8-12)."""

    depth: jnp.ndarray   # [R, k] ascending
    alpha: jnp.ndarray   # [R, k]
    count: jnp.ndarray   # [R] number of valid entries ("GaussNum")


class TriangleMesh(NamedTuple):
    """Triangle scene SoA for the path-tracing workloads (reference:
    Assets::Model vertex/index/material buffers, Scene.cpp:163-169)."""

    vertices: jnp.ndarray    # [V, 3]
    indices: jnp.ndarray     # [T, 3] int32
    normals: jnp.ndarray     # [V, 3]
    material_ids: jnp.ndarray  # [T] int32

    @property
    def num_triangles(self) -> int:
        return self.indices.shape[0]


class Materials(NamedTuple):
    """Material table — mirrors Assets::Material (Material.hpp:9-58):
    model ∈ {0: lambertian, 1: metallic, 2: dielectric, 3: isotropic,
    4: diffuse_light}; texture_id ≥ 0 indexes the scene texture atlas
    (DiffuseTextureId in the reference)."""

    model: jnp.ndarray            # [M] int32
    diffuse: jnp.ndarray          # [M, 3]
    fuzziness: jnp.ndarray        # [M]
    refraction_index: jnp.ndarray # [M]
    texture_id: Optional[jnp.ndarray] = None  # [M] int32, -1 = untextured

    LAMBERTIAN = 0
    METALLIC = 1
    DIELECTRIC = 2
    ISOTROPIC = 3
    DIFFUSE_LIGHT = 4
