"""Scene catalog — factories mirroring the reference's SceneList
(RayTracingInVulkan/src/SceneList.cpp:68-128), TPU SoA output.

The registry maps scene names to factory functions returning
(GaussianCloud | triangle scene, Camera, RenderConfig overrides).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp
import numpy as np

from gsrt.core.types import GaussianCloud, make_camera, look_at
from gsrt.ops.gaussian import quat_scale_to_cov3d


def _cloud_from_params(centers, quats, scales, opacities, rgb=None) -> GaussianCloud:
    centers = jnp.asarray(centers, jnp.float32)
    quats = jnp.asarray(quats, jnp.float32)
    scales = jnp.asarray(scales, jnp.float32)
    opacities = jnp.asarray(opacities, jnp.float32)
    cov3d = quat_scale_to_cov3d(quats, scales)
    n = centers.shape[0]
    if rgb is None:
        rgb = jnp.ones((n, 3), jnp.float32) * 0.5
    else:
        rgb = jnp.asarray(rgb, jnp.float32)
    # store DC SH coefficient such that eval_sh(deg 0) reproduces rgb:
    # rgb = C0·sh0 + 0.5  →  sh0 = (rgb − 0.5)/C0
    from gsrt.ops.sh import C0
    sh = ((rgb - 0.5) / C0)[:, None, :]
    return GaussianCloud(means=centers, cov3d=cov3d,
                         opacity=opacities, sh=sh)


def demo_gauss_splat(width: int = 16, height: int = 16):
    """The reference's "3DGS" demo: two isotropic Gaussians
    (SceneList.cpp:124-125: centers (0,0,5) & (0,0,3), identity rotation,
    scales 1 & 2, opacity 0.9; camera 2 units behind origin looking at them,
    fov 90°, SceneList.cpp:111-113).

    The reference camera has ModelView = translate(0,0,-2) with a GL-style
    projection; in our +z-forward convention the equivalent camera sits at
    world (0,0,-2)·(-1) ... — concretely: eye at (0,0,-2)? No: the reference
    camera origin is MVInverse·(0,0,0,1) = (0,0,2) and splats are at z=3,5
    giving camera-space depths 1 and 3 — we reproduce exactly those depths by
    placing the eye at (0,0,2) looking toward +z.
    """
    centers = [[0.0, 0.0, 5.0], [0.0, 0.0, 3.0]]
    quats = [[1.0, 0, 0, 0], [1.0, 0, 0, 0]]
    scales = [[1.0, 1, 1], [2.0, 2, 2]]
    opac = [0.9, 0.9]
    cloud = _cloud_from_params(centers, quats, scales, opac,
                               rgb=[[0.9, 0.3, 0.2], [0.2, 0.4, 0.9]])
    view = look_at(eye=(0, 0, 2.0), target=(0, 0, 5.0))
    camera = make_camera(view, fov_y_deg=90.0, width=width, height=height)
    return cloud, camera


def random_cloud(n: int, seed: int = 0, extent: float = 4.0,
                 scale_range=(0.02, 0.25), sh_degree: int = 3,
                 width: int = 800, height: int = 600):
    """Synthetic Gaussian cloud for correctness + benchmark configs
    (BASELINE.json config 3: "~100K-splat Gaussian cloud, k=16, SH deg 3")."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    centers[:, 2] += extent * 1.5  # keep in front of the camera
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = rng.uniform(*scale_range, (n, 3)).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, n).astype(np.float32)
    K = (sh_degree + 1) ** 2
    sh = rng.normal(0.0, 0.3, (n, K, 3)).astype(np.float32)
    sh[:, 0, :] = rng.uniform(-1.5, 1.5, (n, 3))
    cloud = GaussianCloud(
        means=jnp.asarray(centers), cov3d=quat_scale_to_cov3d(
            jnp.asarray(quats), jnp.asarray(scales)),
        opacity=jnp.asarray(opac), sh=jnp.asarray(sh))
    view = look_at(eye=(0, 0, -1.0), target=(0, 0, extent))
    camera = make_camera(view, fov_y_deg=60.0, width=width, height=height)
    return cloud, camera


SCENES: Dict[str, Callable] = {
    "3DGS": demo_gauss_splat,
    "random100k": lambda: random_cloud(100_000),
    "random1m": lambda: random_cloud(1_000_000),
}
