from gsrt.core.config import RenderConfig  # noqa: F401
from gsrt.core.types import Camera, GaussianCloud, RayBundle, TriangleMesh  # noqa: F401
