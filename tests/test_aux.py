"""Aux subsystem tests: checkpoint/resume, heatmap, mandelbulb, foveated."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsrt.core.config import RenderConfig
from gsrt.scene.catalog import demo_gauss_splat, random_cloud
from gsrt.utils.checkpoint import (
    load_scene,
    load_training,
    save_scene,
    save_training,
)
from gsrt.utils.heatmap import heatmap


def test_scene_checkpoint_roundtrip():
    cloud, camera = random_cloud(64, seed=0, width=32, height=32)
    from gsrt.ops.bvh import build_lbvh
    amin, amax = cloud.aabbs()
    bvh = build_lbvh(amin, amax)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "scene.npz")
        save_scene(p, cloud, bvh)
        cloud2, bvh2 = load_scene(p)
    np.testing.assert_array_equal(np.asarray(cloud.means),
                                  np.asarray(cloud2.means))
    np.testing.assert_array_equal(np.asarray(bvh.left),
                                  np.asarray(bvh2.left))
    np.testing.assert_array_equal(np.asarray(bvh.node_min),
                                  np.asarray(bvh2.node_min))


def test_training_checkpoint_roundtrip():
    from gsrt.models.trainer import init_params, make_optimizer
    cloud, _ = demo_gauss_splat()
    params = init_params(cloud)
    opt = make_optimizer()
    opt_state = opt.init(params)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "train.npz")
        save_training(p, params, opt_state, step=42)
        params2, opt_state2, step = load_training(p, params, opt_state)
    assert step == 42
    np.testing.assert_array_equal(np.asarray(params.means),
                                  np.asarray(params2.means))
    l1 = jax.tree_util.tree_leaves(opt_state)
    l2 = jax.tree_util.tree_leaves(opt_state2)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_heatmap_shape_and_range():
    v = np.random.default_rng(0).uniform(0, 10, (16, 24))
    img = heatmap(v)
    assert img.shape == (16, 24, 3)
    assert img.min() >= 0 and img.max() <= 1.0
    # zero cost maps to the first stop (black)
    np.testing.assert_allclose(heatmap(np.zeros((4, 4)), scale=1.0), 0.0)


def test_mandelbulb_de_and_march():
    from gsrt.ops.primitives import mandelbulb_de, ray_mandelbulb
    # the bulb contains the origin region; DE at far point ≈ positive
    d_far = float(mandelbulb_de(jnp.array([3.0, 0.0, 0.0])))
    assert d_far > 0
    # ray through the center must hit
    orig = jnp.array([[0.0, 0.0, -3.0]])
    dirn = jnp.array([[0.0, 0.0, 1.0]])
    centers = jnp.array([[0.0, 0.0, 0.0]])
    radii = jnp.array([1.5])
    t = ray_mandelbulb(orig, dirn, centers, radii, 1e-3, 1e4)
    assert np.isfinite(np.asarray(t))[0, 0], "central ray should hit"
    assert 1.0 < float(t[0, 0]) < 3.0
    # ray missing the bounding sphere must miss
    t2 = ray_mandelbulb(orig + jnp.array([[5.0, 0, 0]]), dirn,
                        centers, radii, 1e-3, 1e4)
    assert not np.isfinite(np.asarray(t2))[0, 0]


@pytest.mark.slow
def test_foveated_sample_rings():
    from gsrt.models.path_tracer import render_foveated
    from gsrt.scene.primitives_catalog import cube_and_spheres
    scene, camera, extra = cube_and_spheres(32, 24)
    cfg = RenderConfig(width=32, height=24, bounces=3,
                       gamma_correction=False)
    img = np.asarray(render_foveated(scene, camera, cfg,
                                     ring_samples=(4, 2, 1)))
    assert img.shape == (24, 32, 3)
    assert np.isfinite(img).all()
