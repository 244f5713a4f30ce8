"""gsrt — TPU-native ray-traced 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
stack Wulizhou888/3DGS-RayTrace (RayTracingInVulkan + mesa-vulkan-sim +
vulkan-sim): camera ray generation, BVH construction over per-splat AABBs,
ray-Gaussian EWA intersection with a per-ray k-nearest hit buffer,
front-to-back transmittance compositing with a moving depth front, SH color
evaluation, and triangle/procedural path tracing — all as batched MXU/VPU
kernels over HBM-resident SoA, scaling across chips via `jax.sharding`.

Layer map (mirrors SURVEY.md §7):
  gsrt.core      dtypes, SoA schemas, camera model, config
  gsrt.ops       compute kernels: gaussian math, k-buffer, SH, BVH, Pallas
  gsrt.models    renderers: GaussianRayTracer (flagship), PathTracer
  gsrt.scene     scene catalog + loaders (.ply splats, OBJ, .camera files)
  gsrt.parallel  device-mesh sharding: image-tile DP, splat-sharded ring
  gsrt.utils     NumPy oracle, image IO, PSNR/SSIM, stats
"""

__version__ = "0.1.0"

from gsrt.core.config import RenderConfig  # noqa: F401
from gsrt.core.types import Camera, GaussianCloud  # noqa: F401
