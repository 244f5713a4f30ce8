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

import os as _os

# Persistent XLA compilation cache: the flagship frame program takes
# minutes to compile cold on the axon backend, and every tool/test/bench
# subprocess pays it again — the disk cache drops warm-process compiles to
# cache-read time (verified to round-trip on the axon TPU backend).
# Cache blobs are machine/JAX-version-specific build artifacts, so they
# live under the XDG cache dir (never inside the repo). We don't override
# a cache dir the embedder already configured via env var or jax.config.
# Opt out with GSRT_NO_COMPILE_CACHE=1 (e.g. when diagnosing compiles).
if not _os.environ.get("GSRT_NO_COMPILE_CACHE"):
    import jax as _jax

    if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        _cache_dir = _os.path.join(
            _os.environ.get("XDG_CACHE_HOME",
                            _os.path.expanduser("~/.cache")),
            "gsrt", "jax_cache")
        try:
            if not _jax.config.jax_compilation_cache_dir:
                _jax.config.update("jax_compilation_cache_dir", _cache_dir)
                _jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 2.0)
        except Exception:  # older jax without the knobs — best-effort
            pass

from gsrt.core.config import RenderConfig  # noqa: F401
from gsrt.core.types import Camera, GaussianCloud  # noqa: F401
