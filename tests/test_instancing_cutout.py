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
    # two axis-aligned instances keep boxes; the 45°-rotated one emits
    # 12 triangles per box instead (a rotated AABB is not an AABB)
    assert inst.box_min.shape[0] == 2 * scene.box_min.shape[0]
    assert inst.tri_v0.shape[0] == (3 * scene.tri_v0.shape[0]
                                    + 12 * scene.box_min.shape[0])
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


def test_instantiate_scene_keeps_alpha_textures():
    """alpha_textures must survive instancing (regression: they were
    dropped, silently disabling the cutout path on instanced scenes)."""
    b = _SceneBuilder()
    t_clear = b.texture(np.ones((8, 8, 3), np.float32),
                        alpha=np.zeros((8, 8), np.float32))
    m_clear = b.material(0, (1.0, 0.0, 0.0), tex_id=t_clear)
    b.sphere((0, 0, 2.0), 0.5, m_clear)
    scene = b.build()
    inst = instantiate_scene(scene, [make_transform((0, 0, 0)),
                                     make_transform((3, 0, 0))])
    assert inst.alpha_textures is not None
    np.testing.assert_array_equal(np.asarray(inst.alpha_textures),
                                  np.asarray(scene.alpha_textures))


def test_rotated_box_becomes_triangles():
    """A non-axis-aligned instance transform must turn boxes into triangle
    geometry (regression: the world AABB of a rotated box was rendered as
    the actual geometry — a larger axis-aligned box)."""
    from gsrt.core.types import Materials
    from gsrt.models.path_tracer import PrimitiveScene, _closest_hit
    import jax.numpy as jnp

    mats = Materials(model=jnp.zeros((1,), jnp.int32),
                     diffuse=jnp.ones((1, 3)),
                     fuzziness=jnp.zeros((1,)),
                     refraction_index=jnp.ones((1,)))
    z = jnp.zeros((0, 3))
    scene = PrimitiveScene(
        sph_center=z, sph_radius=jnp.zeros((0,)),
        sph_mat=jnp.zeros((0,), jnp.int32),
        box_min=jnp.array([[-1.0, -1.0, -1.0]]),
        box_max=jnp.array([[1.0, 1.0, 1.0]]),
        box_mat=jnp.zeros((1,), jnp.int32),
        tri_v0=z, tri_v1=z, tri_v2=z,
        tri_mat=jnp.zeros((0,), jnp.int32), materials=mats)

    inst = instantiate_scene(scene, [make_transform(rotate_y_deg=45.0)])
    assert inst.box_min.shape[0] == 0
    assert inst.tri_v0.shape[0] == 12
    # vertical ray through the AABB corner region (x=z=1.2): inside the
    # world AABB of the rotated box (extent ±sqrt(2)) but outside the true
    # 45°-rotated geometry (|x|+|z| ≤ sqrt(2) in the xz plane) — the old
    # AABB-as-geometry behavior would report a hit here
    orig = jnp.array([[1.2, -3.0, 1.2]])
    dirn = jnp.array([[0.0, 1.0, 0.0]])
    t, n, m, hit, _, _ = _closest_hit(inst, orig, dirn, 1e-3, 100.0)
    assert not bool(hit[0]), "ray outside the rotated box must miss"
    # and a ray through the center must hit the diamond edge at x=-sqrt(2)
    orig2 = jnp.array([[-3.0, 0.0, 0.0]])
    dirn2 = jnp.array([[1.0, 0.0, 0.0]])
    t2, n2, m2, hit2, _, _ = _closest_hit(inst, orig2, dirn2, 1e-3, 100.0)
    assert bool(hit2[0])
    np.testing.assert_allclose(float(t2[0]), 3.0 - np.sqrt(2.0), atol=1e-4)


def test_axis_aligned_box_stays_box():
    """90-degree rotations keep boxes procedural (no triangle blow-up)."""
    from gsrt.core.types import Materials
    from gsrt.models.path_tracer import PrimitiveScene
    import jax.numpy as jnp

    mats = Materials(model=jnp.zeros((1,), jnp.int32),
                     diffuse=jnp.ones((1, 3)),
                     fuzziness=jnp.zeros((1,)),
                     refraction_index=jnp.ones((1,)))
    z = jnp.zeros((0, 3))
    scene = PrimitiveScene(
        sph_center=z, sph_radius=jnp.zeros((0,)),
        sph_mat=jnp.zeros((0,), jnp.int32),
        box_min=jnp.array([[-1.0, -2.0, -3.0]]),
        box_max=jnp.array([[1.0, 2.0, 3.0]]),
        box_mat=jnp.zeros((1,), jnp.int32),
        tri_v0=z, tri_v1=z, tri_v2=z,
        tri_mat=jnp.zeros((0,), jnp.int32), materials=mats)
    inst = instantiate_scene(scene, [make_transform(rotate_y_deg=90.0),
                                     make_transform((5, 0, 0), scale=2.0)])
    assert inst.box_min.shape[0] == 2
    assert inst.tri_v0.shape[0] == 0
    # 90° about y swaps x/z extents
    np.testing.assert_allclose(np.asarray(inst.box_max)[0], [3.0, 2.0, 1.0],
                               atol=1e-5)


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
