from gsrt.parallel.tiles import (  # noqa: F401
    calibrate_sharded,
    make_render_mesh,
    render_data_parallel,
    render_splat_sharded,
    tiled_render_fn,
)
