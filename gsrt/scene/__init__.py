from gsrt.scene.catalog import demo_gauss_splat, random_cloud, SCENES  # noqa: F401
