"""Overflow surfacing + calibrate-and-re-render on the path-traced
production paths (VERDICT round-2 item 4): every static-bound truncation
the PT/shadow/AO renderers can hit must be reported via return_flags, and
render_path_traced_calibrated must grow the offending bound until the
render is overflow-free — the PT mirror of GaussianRayTracer.__call__'s
re-render (the reference instead sizes its warp tables permanently,
intersection_table.h:42)."""

import numpy as np
import pytest
import jax.numpy as jnp

from gsrt.core.config import RenderConfig
from gsrt.core.types import make_camera, look_at
from gsrt.models.path_tracer import (render_ambient_occlusion,
                                     render_path_traced,
                                     render_path_traced_calibrated,
                                     render_shadow_rays)
from gsrt.ops.splat_clusters import build_splat_clusters
from gsrt.scene.catalog import random_cloud
from gsrt.scene.primitives_catalog import _SceneBuilder


def _tri_scene():
    b = _SceneBuilder()
    b.quad((-3, -2, 2), (3, -2, 2), (3, 2, 2), (-3, 2, 2),
           b.lambertian((0.8, 0.3, 0.3)))
    b.quad((-5, -2.2, 6), (5, -2.2, 6), (5, -2.2, -2), (-5, -2.2, -2),
           b.metallic((0.9, 0.9, 0.9), 0.1))
    cam = make_camera(look_at((0, 0, -4.0), (0, 0, 1.0)), 55.0, 48, 32)
    cfg = RenderConfig(width=48, height=32, samples=1, bounces=2,
                       has_sky=True, gamma_correction=False,
                       tile_w=16, tile_h=8)
    return b.build(), cam, cfg


@pytest.mark.slow
def test_binned_pairs_overflow_flag():
    scene, cam, cfg = _tri_scene()
    _, flags = render_path_traced(scene, cam, cfg, seed=0,
                                  primary_impl="binned", tri_max_pairs=16,
                                  return_flags=True, interpret=True)
    assert bool(flags["binned_pairs_overflow"])
    _, flags_ok = render_path_traced(scene, cam, cfg, seed=0,
                                     primary_impl="binned",
                                     tri_max_pairs=1 << 12,
                                     return_flags=True, interpret=True)
    assert not bool(flags_ok["binned_pairs_overflow"])
    assert not bool(flags_ok["tri_visits_overflow"])
    assert not bool(flags_ok["gauss_visits_overflow"])


@pytest.mark.slow
def test_shadow_ao_flags_surface():
    scene, cam, cfg = _tri_scene()
    _, f_sh = render_shadow_rays(scene, cam, cfg, light_pos=(0, 5, 2),
                                 primary_impl="binned", tri_max_pairs=16,
                                 return_flags=True, interpret=True)
    assert bool(f_sh["binned_pairs_overflow"])
    _, f_ao = render_ambient_occlusion(scene, cam, cfg,
                                       primary_impl="binned",
                                       tri_max_pairs=16,
                                       return_flags=True, interpret=True)
    assert bool(f_ao["binned_pairs_overflow"])


@pytest.mark.slow
def test_gauss_overflow_flag_and_calibration():
    """A clustered splat medium with a starved s_max must (a) raise
    gauss_visits_overflow and (b) converge to the ample-budget image when
    rendered through the calibrating wrapper."""
    scene, cam, cfg = _tri_scene()
    cfg = cfg.replace(k=8)
    cloud, _ = random_cloud(3000, seed=0, width=48, height=32)
    colors = jnp.abs(jnp.sin(cloud.means * 5.0))
    sc = build_splat_clusters(cloud, cfg, colors, k=32, sup=4)
    ms = sc.clusters.sup_min.shape[0]
    _, flags = render_path_traced(scene, cam, cfg, seed=0,
                                  gauss_clusters=sc, gauss_s_max=1,
                                  primary_impl="block",
                                  return_flags=True)
    assert bool(flags["gauss_visits_overflow"])

    ample = render_path_traced(scene, cam, cfg, seed=0, gauss_clusters=sc,
                               gauss_s_max=ms, primary_impl="block")
    img, info = render_path_traced_calibrated(
        scene, cam, cfg, seed=0, gauss_clusters=sc, gauss_s_max=1,
        primary_impl="block", max_retries=6)
    assert info["retries"] >= 1
    assert not info["flags"]["gauss_visits_overflow"]
    assert info["gauss_s_max"] > 1
    np.testing.assert_allclose(np.asarray(img), np.asarray(ample),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_calibration_grows_pair_buffer():
    """The moved/zoomed-camera scenario: a pair budget calibrated for one
    view truncates on another; the wrapper must re-render past it."""
    scene, cam, cfg = _tri_scene()
    ample = render_path_traced(scene, cam, cfg, seed=0,
                               primary_impl="binned",
                               tri_max_pairs=1 << 12, interpret=True)
    img, info = render_path_traced_calibrated(
        scene, cam, cfg, seed=0, primary_impl="binned", tri_max_pairs=16,
        max_retries=8, interpret=True)
    assert info["retries"] >= 1
    assert not info["flags"]["binned_pairs_overflow"]
    np.testing.assert_allclose(np.asarray(img), np.asarray(ample),
                               rtol=1e-4, atol=1e-4)
