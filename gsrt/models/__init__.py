from gsrt.models.gaussian_rt import GaussianRayTracer, render_fast, render_reference  # noqa: F401
