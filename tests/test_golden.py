"""Golden-image regression tests.

The reference's verification was golden dumps (image.binary) compared
across runs (SURVEY.md §4). Here: fixed-seed renders are checked against
committed .npz goldens; regenerate with
`python tests/test_golden.py regenerate` after INTENTIONAL changes.
"""

import os
import sys

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _cases():
    import jax.numpy as jnp
    from gsrt.core.config import RenderConfig
    from gsrt.models.gaussian_rt import render_fast, render_reference
    from gsrt.models.path_tracer import render_path_traced
    from gsrt.scene.catalog import demo_gauss_splat, random_cloud
    from gsrt.scene.primitives_catalog import cornell_box, cube_and_spheres

    def gauss_demo():
        cloud, camera = demo_gauss_splat()
        cfg = RenderConfig(width=16, height=16, conic_mode="reference",
                           use_exp_lut=True)
        out = render_reference(cloud, camera, cfg)
        return {"trans": out.trans, "color": out.color}

    def gauss_random():
        cloud, camera = random_cloud(300, seed=42, width=48, height=32)
        cfg = RenderConfig(width=48, height=32, conic_mode="standard")
        out = render_fast(cloud, camera, cfg)
        return {"trans": out.trans, "color": out.color}

    def pt_cubes():
        scene, camera, extra = cube_and_spheres(32, 24)
        cfg = RenderConfig(width=32, height=24, samples=2, bounces=4,
                           gamma_correction=False)
        return {"color": render_path_traced(scene, camera, cfg, seed=7)}

    return {"gauss_demo": gauss_demo, "gauss_random": gauss_random,
            "pt_cubes": pt_cubes}


def regenerate():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, fn in _cases().items():
        arrays = {k: np.asarray(v) for k, v in fn().items()}
        np.savez_compressed(os.path.join(GOLDEN_DIR, f"{name}.npz"), **arrays)
        print(f"wrote {name}.npz")


def test_golden_images():
    import pytest
    for name, fn in _cases().items():
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        if not os.path.exists(path):
            pytest.skip(f"golden {name} missing — run regenerate")
        golden = np.load(path)
        got = {k: np.asarray(v) for k, v in fn().items()}
        for k in golden.files:
            np.testing.assert_allclose(
                got[k], golden[k], rtol=1e-4, atol=1e-5,
                err_msg=f"{name}/{k} drifted from golden")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regenerate":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax
        jax.config.update("jax_platforms", "cpu")
        regenerate()
