"""COLMAP loading (gsrt.scene.colmap) and multi-view fitting
(gsrt.models.multiview): text/binary model roundtrips, SfM-point
initialization, holdout split, and a small posed-capture fit."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gsrt.core.config import RenderConfig
from gsrt.core.types import look_at, make_camera
from gsrt.models.multiview import (eval_psnr, fit_views, holdout_split,
                                   make_train_step_mv, viewset_from_cameras,
                                   viewset_from_colmap)
from gsrt.models.trainer import make_optimizer, random_init
from gsrt.scene.colmap import (ColmapCamera, ColmapImage, ColmapModel,
                               init_params_from_points, load_colmap_model,
                               quat_to_rot, rot_to_quat, scene_extent,
                               write_binary_model, write_text_model)


def _tiny_model(n_views=3, n_pts=20, seed=0):
    rng = np.random.default_rng(seed)
    cams = {1: ColmapCamera("PINHOLE", 64, 48, 50.0, 52.0, 32.0, 24.0)}
    images = []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        eye = (3 * np.sin(ang), 0.5, 3 * np.cos(ang))
        images.append(ColmapImage(
            name=f"im_{i:03d}.png", camera_id=1,
            view=look_at(eye, (0, 0, 0)).astype(np.float32)))
    pts = rng.normal(0, 0.8, (n_pts, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n_pts, 3)).astype(np.float32)
    return ColmapModel(cameras=cams, images=images, points=pts, colors=cols)


def test_quat_rot_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R = quat_to_rot(*q)
        q2 = rot_to_quat(R)
        # same rotation up to sign (rot_to_quat returns w >= 0)
        assert min(np.abs(q2 - q).max(), np.abs(q2 + q).max()) < 1e-6
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)


@pytest.mark.parametrize("fmt", ["text", "binary"])
def test_model_roundtrip(tmp_path, fmt):
    model = _tiny_model()
    d = str(tmp_path / fmt)
    (write_text_model if fmt == "text" else write_binary_model)(d, model)
    loaded = load_colmap_model(d)
    cam = loaded.cameras[1]
    assert (cam.width, cam.height) == (64, 48)
    np.testing.assert_allclose((cam.fx, cam.fy, cam.cx, cam.cy),
                               (50.0, 52.0, 32.0, 24.0))
    assert [im.name for im in loaded.images] == \
        [im.name for im in model.images]          # sorted by name
    for a, b in zip(loaded.images, model.images):
        np.testing.assert_allclose(a.view, b.view, atol=1e-6)
    np.testing.assert_allclose(loaded.points, model.points, atol=1e-5)
    np.testing.assert_allclose(loaded.colors, model.colors, atol=1 / 254)
    assert scene_extent(loaded) == pytest.approx(3.0, rel=0.1)


def test_load_from_scene_root(tmp_path):
    model = _tiny_model()
    write_text_model(str(tmp_path / "sparse" / "0"), model)
    loaded = load_colmap_model(str(tmp_path))     # auto-descends sparse/0
    assert len(loaded.images) == 3


def test_init_params_from_points():
    model = _tiny_model(n_pts=50)
    params = init_params_from_points(model.points, model.colors)
    assert params.means.shape == (50, 3)
    assert params.sh.shape == (50, 1, 3)
    from gsrt.ops.sh import C0
    np.testing.assert_allclose(
        np.asarray(params.sh[:, 0]) * C0 + 0.5, model.colors, atol=1e-5)
    scales = np.exp(np.asarray(params.log_scales))
    assert np.isfinite(scales).all() and (scales > 0).all()
    # isotropic kNN init: all three axes equal
    np.testing.assert_allclose(scales[:, 0], scales[:, 1])
    opac = 1 / (1 + np.exp(-np.asarray(params.opacity_logit)))
    np.testing.assert_allclose(opac, 0.1, atol=1e-6)


def test_holdout_split():
    train, test = holdout_split(16, 8)
    assert test == [0, 8] and len(train) == 14 and 0 not in train
    train, test = holdout_split(5, 0)
    assert train == [0, 1, 2, 3, 4] and test == []


def _render_targets(cloud, cameras, cfg):
    from gsrt.models.gaussian_rt import render_fast
    return [render_fast(cloud, c, cfg).color for c in cameras]


def test_viewset_from_colmap_end_to_end(tmp_path):
    """Full path: write a COLMAP capture (model + PNGs), load it, check
    the ViewSet geometry reproduces the written poses/intrinsics."""
    from gsrt.utils.image import save_png
    model = _tiny_model()
    write_binary_model(str(tmp_path / "sparse" / "0"), model)
    imdir = tmp_path / "images"
    imdir.mkdir()
    rng = np.random.default_rng(0)
    for im in model.images:
        save_png(str(imdir / im.name), rng.uniform(0, 1, (48, 64, 3)))
    vs, params, extent = viewset_from_colmap(str(tmp_path), str(imdir))
    assert vs.n_views == 3 and (vs.width, vs.height) == (64, 48)
    assert params.means.shape == (20, 3)
    assert extent == pytest.approx(3.0, rel=0.1)
    np.testing.assert_allclose(np.asarray(vs.views[0]),
                               model.images[0].view, atol=1e-6)
    cam = vs.camera_at(0)
    assert (float(cam.fx), float(cam.fy)) == (50.0, 52.0)
    # downscale halves intrinsics and image size
    vs2, _, _ = viewset_from_colmap(str(tmp_path), str(imdir), downscale=2)
    assert (vs2.width, vs2.height) == (32, 24)
    assert float(vs2.fx[0]) == pytest.approx(25.0)


def test_mv_step_one_executable():
    """The jitted step accepts different (traced) view indices without
    recompiling — poses are leaves, not static."""
    cfg = RenderConfig(width=32, height=24, conic_mode="standard")
    cloud_p = random_init(jax.random.PRNGKey(0), 6, extent=1.0)
    cams = [make_camera(look_at((np.sin(a), 0, 4 + np.cos(a)), (0, 0, 4)),
                        60.0, 32, 24) for a in (0.0, 0.7)]
    targets = _render_targets(cloud_p.to_cloud(), cams, cfg)
    vs = viewset_from_cameras(cams, targets)
    opt = make_optimizer()
    params = random_init(jax.random.PRNGKey(1), 6, extent=1.0)
    from gsrt.models.densify import init_stats
    step = make_train_step_mv(cfg, opt, lambda_ssim=0.0)
    state = (params, opt.init(params), init_stats(6))
    with jax.checking_leaks():
        for v in (0, 1, 0):
            *state, loss = step(*state, vs, jnp.int32(v))
            assert np.isfinite(float(loss))
    n = step._cache_size() if hasattr(step, "_cache_size") else None
    if n is not None:
        assert n == 1


@pytest.mark.slow
def test_fit_views_converges():
    """Fit 4 posed views of a known cloud; loss drops and holdout PSNR is
    finite (holdout=4 puts one view in the test split)."""
    cfg = RenderConfig(width=32, height=24, conic_mode="standard")
    target_p = random_init(jax.random.PRNGKey(0), 10, extent=1.2)
    cams = [make_camera(
        look_at((2.5 * np.sin(a), 0.3, 4 + 2.5 * np.cos(a)), (0, 0, 4)),
        60.0, 32, 24) for a in np.linspace(0, 2 * np.pi, 4, endpoint=False)]
    targets = _render_targets(target_p.to_cloud(), cams, cfg)
    vs = viewset_from_cameras(cams, targets)
    params = random_init(jax.random.PRNGKey(1), 6, extent=1.2)
    params, rep = fit_views(
        vs, params, cfg, iters=60, lambda_ssim=0.0, holdout=4,
        densify_every=25, densify_grad=0.0, scene_scale=2.5, bucket=8,
        seed=0)
    assert np.isfinite(rep.losses).all()
    assert np.mean(rep.losses[-10:]) < np.mean(rep.losses[:10])
    assert rep.n_splats >= 8                     # densified + bucketed
    assert np.isfinite(rep.train_psnr) and np.isfinite(rep.test_psnr)
    assert rep.train_psnr > 10.0
