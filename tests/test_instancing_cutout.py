"""Instancing and any-hit alpha-cutout tests."""

import jax.numpy as jnp
import numpy as np

from gsrt.core.config import RenderConfig
from gsrt.models.path_tracer import render_path_traced
from gsrt.scene.instancing import (
    instantiate_cloud,
    instantiate_scene,
    make_transform,
)
from gsrt.scene.primitives_catalog import _SceneBuilder, cube_and_spheres


def test_instantiate_scene_replicates():
    scene, camera, _ = cube_and_spheres(16, 16)
    T = [make_transform((0, 0, 0)), make_transform((5, 0, 0)),
         make_transform((0, 5, 0), rotate_y_deg=45.0)]
    inst = instantiate_scene(scene, T)
    assert inst.sph_center.shape[0] == 3 * scene.sph_center.shape[0]
    assert inst.box_min.shape[0] == 3 * scene.box_min.shape[0]
    # second instance translated by +5x
    np.testing.assert_allclose(
        np.asarray(inst.sph_center)[scene.sph_center.shape[0]],
        np.asarray(scene.sph_center)[0] + np.array([5, 0, 0]), atol=1e-5)


def test_instantiate_cloud_preserves_cov_psd():
    from gsrt.scene.catalog import random_cloud
    cloud, camera = random_cloud(32, seed=1, width=16, height=16)
    T = [make_transform((1, 2, 3), rotate_y_deg=30.0, scale=2.0)]
    inst = instantiate_cloud(cloud, T)
    assert inst.n == cloud.n
    c = np.asarray(inst.cov3d)
    mats = np.zeros((c.shape[0], 3, 3))
    mats[:, 0, 0], mats[:, 0, 1], mats[:, 0, 2] = c[:, 0], c[:, 1], c[:, 2]
    mats[:, 1, 0], mats[:, 1, 1], mats[:, 1, 2] = c[:, 1], c[:, 3], c[:, 4]
    mats[:, 2, 0], mats[:, 2, 1], mats[:, 2, 2] = c[:, 2], c[:, 4], c[:, 5]
    assert (np.linalg.eigvalsh(mats) > -1e-5).all()
    # uniform scale 2 → covariance ×4 (trace check)
    tr_old = np.asarray(cloud.cov3d)[:, [0, 3, 5]].sum(-1)
    tr_new = c[:, [0, 3, 5]].sum(-1)
    np.testing.assert_allclose(tr_new, 4 * tr_old, rtol=1e-4)


def test_alpha_cutout_passes_through():
    """A fully-cutout sphere in front of an opaque one must be invisible."""
    b = _SceneBuilder()
    # texture 0: fully transparent; texture 1: none
    t_clear = b.texture(np.ones((8, 8, 3), np.float32),
                        alpha=np.zeros((8, 8), np.float32))
    m_clear = b.material(0, (1.0, 0.0, 0.0), tex_id=t_clear)   # lambertian
    m_solid = b.lambertian((0.0, 1.0, 0.0))
    b.sphere((0, 0, 2.0), 0.5, m_clear)   # front, cutout
    b.sphere((0, 0, 4.0), 0.5, m_solid)   # behind, green
    scene = b.build()
    assert scene.alpha_textures is not None

    from gsrt.core.types import make_camera, look_at
    camera = make_camera(look_at((0, 0, 0), (0, 0, 1)), 60.0, 16, 16)
    cfg = RenderConfig(width=16, height=16, samples=4, bounces=3,
                       has_sky=True, gamma_correction=False)
    img = np.asarray(render_path_traced(scene, camera, cfg, seed=3))
    center = img[8, 8]
    assert center[1] > center[0], f"should see green behind cutout: {center}"


def test_alpha_opaque_still_blocks():
    b = _SceneBuilder()
    t_solid = b.texture(np.ones((8, 8, 3), np.float32),
                        alpha=np.ones((8, 8), np.float32) * 0.0)
    # make alpha atlas exist but this material untextured → opaque
    m_red = b.lambertian((1.0, 0.1, 0.1))
    m_green = b.lambertian((0.1, 1.0, 0.1))
    b.sphere((0, 0, 2.0), 0.5, m_red)
    b.sphere((0, 0, 4.0), 0.5, m_green)
    scene = b.build()
    from gsrt.core.types import make_camera, look_at
    camera = make_camera(look_at((0, 0, 0), (0, 0, 1)), 60.0, 16, 16)
    cfg = RenderConfig(width=16, height=16, samples=4, bounces=3,
                       has_sky=True, gamma_correction=False)
    img = np.asarray(render_path_traced(scene, camera, cfg, seed=3))
    center = img[8, 8]
    assert center[0] > center[1], f"front red sphere should dominate: {center}"
