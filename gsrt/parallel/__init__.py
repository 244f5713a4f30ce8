from gsrt.parallel.tiles import (  # noqa: F401
    make_render_mesh,
    render_data_parallel,
    render_splat_sharded,
)
