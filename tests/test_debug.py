"""Sanitizer tests."""

import jax.numpy as jnp
import numpy as np

from gsrt.core.config import RenderConfig
from gsrt.models.gaussian_rt import render_fast
from gsrt.scene.catalog import demo_gauss_splat
from gsrt.utils.debug import validate_cloud, validate_output


def test_clean_scene_validates():
    cloud, camera = demo_gauss_splat()
    assert validate_cloud(cloud) == []
    out = render_fast(cloud, camera, RenderConfig(width=16, height=16))
    assert validate_output(out) == []


def test_bad_scene_detected():
    cloud, _ = demo_gauss_splat()
    bad = cloud._replace(
        means=cloud.means.at[0, 0].set(jnp.nan),
        opacity=cloud.opacity.at[1].set(2.0))
    problems = validate_cloud(bad)
    assert "non-finite means" in problems
    assert "opacity outside [0, 1]" in problems
