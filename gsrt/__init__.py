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
  gsrt.ops       compute kernels: gaussian math, k-buffer, SH, Pallas
                 (tile/tri binning, packed blend, pair expansion, cluster
                 tracers), BVH builders
  gsrt.models    renderers: GaussianRayTracer (flagship), PathTracer,
                 trainer (custom-VJP tiled backward)
  gsrt.scene     scene catalog + loaders (.ply splats, OBJ+MTL+textures,
                 .camera files, reference datasets, camera paths)
  gsrt.parallel  device-mesh sharding: image-tile DP, depth-slab splat
                 sharding, gradient DP; multi-host via jax.distributed
  gsrt.serving   temporal-reuse saturation culling for camera paths
  gsrt.utils     NumPy oracle, image IO, PSNR/SSIM, stats, profiling
  native/        C++ host runtime: threaded PLY parser, LBVH builder
"""

__version__ = "0.2.0"

from gsrt.core.config import RenderConfig  # noqa: F401
from gsrt.core.types import Camera, GaussianCloud  # noqa: F401
