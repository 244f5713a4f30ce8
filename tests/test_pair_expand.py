"""Pair-expansion kernel exactness (interpret mode on CPU).

The kernel replaces `jnp.repeat(tab, touched, total_repeat_length)` in the
tile binning — reference analogue: the simulator materializes one
intersection-table entry per (ray, procedural leaf) encounter
(vulkan_ray_tracing.cc:1052-1090); here it is one pair per
(tile, splat) overlap."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gsrt.ops.pair_expand import (expand_pairs, expand_pairs_fused,
                                  TAB_ROWS, _DEAD_BASE)


def _run_case(touched, chunk, max_pairs, seed=0):
    """touched: per-splat pair counts, pair-generating prefix first."""
    touched = np.asarray(touched, np.int32)
    n = len(touched)
    offsets = np.cumsum(touched).astype(np.int32)
    base = (offsets - touched).astype(np.int32)
    base[touched == 0] = _DEAD_BASE
    rng = np.random.default_rng(seed)
    feats = rng.random((11, n)).astype(np.float32)
    feats[3] = base.view(np.float32)
    # rows 0-2 as small-int bitcasts (denormals) like the real geometry rows
    feats[0] = rng.integers(0, 16, n).astype(np.int32).view(np.float32)
    tabf = np.concatenate(
        [feats, np.zeros((TAB_ROWS - 11, n), np.float32)], 0)

    total = int(offsets[-1]) if n else 0
    total = min(total, max_pairs)
    ref = np.repeat(feats.T, touched, axis=0).T[:, :total]
    for ep in (expand_pairs, expand_pairs_fused):
        out = jax.jit(lambda t, b, ep=ep: ep(
            t, b, max_pairs, chunk=chunk, interpret=True))(
                jnp.asarray(tabf), jnp.asarray(base))
        out = np.asarray(out)
        np.testing.assert_array_equal(out[:11, :total], ref,
                                      err_msg=ep.__name__)
    return total


def test_random_runs():
    rng = np.random.default_rng(1)
    touched = rng.integers(0, 6, 400).astype(np.int32)
    touched[rng.random(400) < 0.25] = 0
    touched = np.sort(touched)[::-1].copy()
    total = _run_case(touched, chunk=128, max_pairs=1024)
    assert total > 0


def test_interleaved_run_lengths():
    """Short runs right after long ones — the pattern that collided in the
    push-style shifter (a splat's move landing on an unmoved splat)."""
    pat = [4, 1, 1, 2, 1, 5, 1, 1, 3, 1] * 30
    _run_case(np.asarray(pat), chunk=256, max_pairs=4 * 256)


def test_all_ones():
    _run_case(np.ones(500, np.int32), chunk=128, max_pairs=640)


def test_single_giant_run():
    """One splat covering multiple whole chunks (window prefix coverage)."""
    _run_case(np.asarray([700, 1, 1, 1]), chunk=128, max_pairs=768)


def test_dead_tail_chunks():
    """max_pairs far beyond total — trailing chunks source only the last
    splat; outputs there are unconstrained but must not crash."""
    _run_case(np.asarray([3, 2, 1] + [0] * 50), chunk=128, max_pairs=1280)


def test_nonpow2_chunk():
    pat = np.asarray([2, 3, 1, 1, 4] * 100)
    _run_case(pat, chunk=384, max_pairs=3 * 384)


@pytest.mark.slow
def test_binning_parity_pallas_vs_xla():
    """Full build_tile_binning: pallas expansion must bit-match the XLA
    jnp.repeat path (payload + tile offsets)."""
    from gsrt.core.config import RenderConfig
    from gsrt.models.gaussian_rt import _precompute
    from gsrt.ops.gaussian import screen_extents
    from gsrt.ops.tile_binning import build_tile_binning
    from gsrt.scene import random_cloud

    cloud, camera = random_cloud(300, seed=3, width=64, height=48)
    cfg = RenderConfig(width=64, height=48, conic_mode="standard")
    depth, mean2d, quad, in_front, colors = _precompute(cloud, camera, cfg)
    rx, ry = screen_extents(quad, cfg.conic_mode, cfg.g_cutoff,
                            opacity=cloud.opacity,
                            alpha_threshold=cfg.alpha_threshold)
    alive = in_front & (cloud.opacity > cfg.alpha_threshold)

    outs = {}
    for impl in ("pallas", "xla"):
        b = jax.jit(lambda *a, impl=impl: build_tile_binning(
            *a, width=64, height=48, tile_w=128, tile_h=8, chunk=384,
            max_pairs=1 << 13, expand_impl=impl,
            interpret=(impl == "pallas")))(
                depth, mean2d[:, 0], mean2d[:, 1], quad[:, 0], quad[:, 1],
                quad[:, 2], cloud.opacity, colors[:, 0], colors[:, 1],
                colors[:, 2], rx, ry, alive)
        outs[impl] = (np.asarray(b.payload), np.asarray(b.tile_start))
    np.testing.assert_array_equal(outs["pallas"][1], outs["xla"][1])
    np.testing.assert_array_equal(outs["pallas"][0], outs["xla"][0])


@pytest.mark.slow
def test_fused_end_to_end_render():
    """expand_impl='fused' through the full tiled render must be
    bit-identical to 'pallas' (same table, same payload packing; only the
    pair->source merge computation differs)."""
    from gsrt.core.config import RenderConfig
    from gsrt.models.gaussian_rt import render_tiled
    from gsrt.scene.catalog import random_cloud
    cloud, camera = random_cloud(800, seed=5, width=128, height=96)
    base = RenderConfig(width=128, height=96, conic_mode="standard",
                        tile_w=16, tile_h=16, blend_impl="packed",
                        expand_impl="pallas")
    a = render_tiled(cloud, camera, base, max_pairs=1 << 15, interpret=True)
    b = render_tiled(cloud, camera, base.replace(expand_impl="fused"),
                     max_pairs=1 << 15, interpret=True)
    np.testing.assert_array_equal(np.asarray(b.color), np.asarray(a.color))
    np.testing.assert_array_equal(np.asarray(b.trans), np.asarray(a.trans))


def test_binned_end_to_end_render():
    """expand_impl='binned' (in-kernel tile ids + packed means) through
    the full tiled render must be bit-identical to 'pallas' on the
    compact payload: the kernel replicates _finish_compact's tile-id,
    mean-rebase/pack_mean_rel, and dead/saturated masking arithmetic."""
    from gsrt.core.config import RenderConfig
    from gsrt.models.gaussian_rt import render_tiled
    from gsrt.scene.catalog import random_cloud
    cloud, camera = random_cloud(600, seed=7, width=128, height=96)
    base = RenderConfig(width=128, height=96, conic_mode="standard",
                        tile_w=32, tile_h=16, blend_impl="packed",
                        payload="compact", expand_impl="pallas")
    a = render_tiled(cloud, camera, base, max_pairs=1 << 14, interpret=True)
    b = render_tiled(cloud, camera, base.replace(expand_impl="binned"),
                     max_pairs=1 << 14, interpret=True)
    np.testing.assert_array_equal(np.asarray(b.color), np.asarray(a.color))
    np.testing.assert_array_equal(np.asarray(b.trans), np.asarray(a.trans))
