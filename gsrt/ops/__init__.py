from gsrt.ops.gaussian import (  # noqa: F401
    quat_scale_to_cov3d,
    project_gaussians,
    eval_gaussian_response,
)
from gsrt.ops.explut import build_exp_lut, linear_exp  # noqa: F401
from gsrt.ops.kbuffer import topk_nearest, composite_transmittance  # noqa: F401
from gsrt.ops.sh import eval_sh  # noqa: F401
