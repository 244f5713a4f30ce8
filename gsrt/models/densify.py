"""Adaptive density control for 3DGS training (clone / split / prune).

The reference stack renders pre-fit scenes only; the .ply files it consumes
come out of exactly this optimization loop (INRIA 3DGS, PAPERS.md). A
production trainer cannot fit from a fixed budget: under-reconstructed
regions need MORE splats (clone small ones, split large ones along their
own distribution) and transparent left-overs must be pruned.

TPU-native split of work:
  * the PER-STEP statistics (positional-gradient accumulation, visibility
    counts) are jitted alongside the train step — fixed shapes, pure VPU;
  * the SHAPE-CHANGING surgery (clone/split/prune, optimizer-moment row
    remap) runs on host NumPy every `densify_every` steps. Shape changes
    force an XLA re-trace of the train step, so `round_up_to` buckets the
    new splat count (dead rows ride with opacity 0 ≡ inert in every
    blend) — a handful of compiles per fit instead of one per event,
    the same static-shape discipline as the pair buckets
    (gsrt.models.gaussian_rt.pair_bucket).

Semantics follow the INRIA schedule: accumulate ||∂L/∂mean|| over steps,
average by visibility count; above `grad_threshold` a splat is cloned
(max scale ≤ `scale_threshold`) or split into `split_n` children sampled
from its own Gaussian with scales shrunk by `split_factor` (originals
removed); splats with opacity < `opacity_threshold` are pruned; opacities
are periodically reset toward transparency so pruning can act.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gsrt.models.trainer import GaussianParams


class DensifyStats(NamedTuple):
    """Per-splat accumulators carried across train steps (jit-friendly)."""

    grad_accum: jnp.ndarray   # [N] f32: sum of ||dL/d mean||
    count: jnp.ndarray        # [N] int32: steps the splat received gradient


def init_stats(n: int) -> DensifyStats:
    return DensifyStats(grad_accum=jnp.zeros((n,), jnp.float32),
                        count=jnp.zeros((n,), jnp.int32))


def accumulate_stats(stats: DensifyStats, grads: GaussianParams
                     ) -> DensifyStats:
    """Fold one step's gradients into the accumulators. A splat is
    "visible" this step if any of its mean components received gradient
    (culled / fully-occluded splats get exact zeros through the masked
    blend, mirroring INRIA's visibility_filter)."""
    g = jnp.linalg.norm(grads.means, axis=-1)
    return DensifyStats(grad_accum=stats.grad_accum + g,
                        count=stats.count + (g > 0).astype(jnp.int32))


def _cov_chol(log_scales: np.ndarray, quats: np.ndarray) -> np.ndarray:
    """[N,3,3] factor A with Σ = A Aᵀ, from the activation parameters:
    A = R(q)·diag(exp(log_scales)) — sampling x = mean + A·n, n~N(0,I)
    draws from the splat's own distribution."""
    q = quats / np.maximum(np.linalg.norm(quats, axis=-1, keepdims=True),
                           1e-12)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], -1).reshape(-1, 3, 3).astype(np.float32)
    return R * np.exp(log_scales)[:, None, :]


def round_up_to(n: int, bucket: int = 4096) -> int:
    return max(bucket, -(-n // bucket) * bucket)


def _pad_rows(a: np.ndarray, n_pad: int) -> np.ndarray:
    if n_pad <= 0:
        return a
    return np.concatenate([a, np.zeros((n_pad,) + a.shape[1:], a.dtype)])


class DensifyReport(NamedTuple):
    n_before: int
    n_after: int       # live splats after surgery (≤ padded shape)
    n_cloned: int
    n_split: int
    n_pruned: int


# logit of a fully-dead opacity: sigmoid(-12) ≈ 6e-6, far below any
# alpha_threshold, so padded rows never blend and receive ~0 gradient
_DEAD_LOGIT = -12.0


def densify_and_prune(
    params: GaussianParams,
    opt_state,
    stats: DensifyStats,
    *,
    grad_threshold: float,
    scale_threshold: float,
    opacity_threshold: float = 0.005,
    split_factor: float = 1.6,
    split_n: int = 2,
    max_splats: Optional[int] = None,
    bucket: int = 4096,
    seed: int = 0,
):
    """One adaptive-density event (host-side, outside jit).

    Returns (params, opt_state, stats, report) with a possibly different
    leading dimension N' = round_up_to(live count, bucket); dead padding
    rows carry opacity logit −12 (inert). Optimizer moments are row-
    remapped: survivors keep theirs, new/padded rows restart at zero (the
    INRIA convention — fresh Adam state for fresh geometry).

    `scale_threshold` is in world units (INRIA: 0.01 × scene extent);
    `grad_threshold` applies to the step-averaged ||dL/d mean||.
    """
    p = jax.tree.map(np.asarray, params)
    n = p.means.shape[0]
    rng = np.random.default_rng(seed)

    cnt = np.asarray(stats.count)
    avg = np.asarray(stats.grad_accum) / np.maximum(cnt, 1)
    opac = 1.0 / (1.0 + np.exp(-p.opacity_logit))
    smax = np.exp(p.log_scales).max(-1)

    alive = opac >= opacity_threshold
    hot = (avg >= grad_threshold) & alive & (cnt > 0)
    clone = hot & (smax <= scale_threshold)
    split = hot & (smax > scale_threshold)

    if max_splats is not None:
        # keep the hottest candidates only, so growth respects the budget
        budget = max(max_splats - int(alive.sum()), 0)
        grow = clone.astype(np.int64) + split.astype(np.int64) * (split_n - 1)
        if int(grow.sum()) > budget:
            order = np.argsort(-avg)          # hottest first
            cum = np.cumsum(grow[order])
            allowed = np.zeros(n, bool)
            allowed[order[cum <= budget]] = True
            clone &= allowed
            split &= allowed

    idx_keep = np.flatnonzero(alive & ~split)
    idx_clone = np.flatnonzero(clone & ~split)
    idx_split = np.flatnonzero(split)

    # split children: sampled from the parent's own Gaussian, scales
    # shrunk so split_n children tile the parent's footprint
    if idx_split.size:
        A = _cov_chol(p.log_scales[idx_split], p.quats[idx_split])
        child_means, child_ls = [], []
        for _ in range(split_n):
            nrm = rng.standard_normal((idx_split.size, 3)).astype(np.float32)
            child_means.append(p.means[idx_split]
                               + np.einsum("nij,nj->ni", A, nrm))
            child_ls.append(p.log_scales[idx_split]
                            - np.float32(np.log(split_factor)))
        child_means = np.concatenate(child_means)
        child_ls = np.concatenate(child_ls)
    else:
        child_means = np.zeros((0, 3), np.float32)
        child_ls = np.zeros((0, 3), np.float32)
    idx_children = np.tile(idx_split, split_n)

    src = np.concatenate([idx_keep, idx_clone, idx_children])
    n_live = src.shape[0]
    n_new = round_up_to(n_live, bucket) if bucket else n_live
    n_pad = n_new - n_live

    def remap(a, override=None):
        a = np.asarray(a)
        out = a[src]
        if override is not None:
            out[idx_keep.size + idx_clone.size:] = override
        return _pad_rows(out, n_pad)

    means = remap(p.means, child_means if idx_children.size else None)
    log_scales = remap(p.log_scales, child_ls if idx_children.size else None)
    quats = remap(p.quats)
    quats[n_live:, 0] = 1.0                 # identity rotation on padding
    logit = remap(p.opacity_logit)
    logit[n_live:] = _DEAD_LOGIT
    sh = remap(p.sh)
    new_params = GaussianParams(
        means=jnp.asarray(means), log_scales=jnp.asarray(log_scales),
        quats=jnp.asarray(quats), opacity_logit=jnp.asarray(logit),
        sh=jnp.asarray(sh))

    # optimizer-state surgery: any leaf with leading dim == old N is a
    # per-splat moment — survivors keep their rows, everything appended
    # (clones, split children, padding) restarts at zero
    keep_rows = idx_keep.size

    def remap_leaf(leaf):
        arr = np.asarray(leaf)
        if arr.ndim >= 1 and arr.shape[0] == n and n != 0:
            out = np.zeros((n_new,) + arr.shape[1:], arr.dtype)
            out[:keep_rows] = arr[idx_keep]
            return jnp.asarray(out)
        return leaf

    new_opt_state = jax.tree.map(remap_leaf, opt_state)

    # report pruning only over rows that were meaningfully alive: padding
    # rows from a previous event sit at sigmoid(_DEAD_LOGIT) ≈ 6e-6 and
    # would otherwise be re-counted as "pruned" forever
    was_real = opac > 2.0 / (1.0 + np.exp(-_DEAD_LOGIT))
    report = DensifyReport(
        n_before=n, n_after=n_live,
        n_cloned=int(idx_clone.size),
        n_split=int(idx_split.size),
        n_pruned=int((was_real & ~alive).sum()))
    return new_params, new_opt_state, init_stats(n_new), report


def reset_opacity(params: GaussianParams,
                  max_opacity: float = 0.01) -> GaussianParams:
    """Clamp every opacity to ≤ max_opacity (INRIA's periodic reset: lets
    the optimizer re-earn opacity so stale floaters fall below the prune
    threshold). Dead padding rows stay dead (clamp only lowers)."""
    cap = float(np.log(max_opacity / (1.0 - max_opacity)))
    return params._replace(
        opacity_logit=jnp.minimum(params.opacity_logit, cap))


def make_train_step_adaptive(cfg, optimizer, lambda_ssim: float = 0.2):
    """Jitted train step that also folds densification statistics:
    step(params, opt_state, stats, target, camera) →
    (params, opt_state, stats, loss). Re-traces per splat-count bucket."""
    import optax

    from gsrt.models.trainer import render_loss

    @jax.jit
    def step(params, opt_state, stats, target, camera):
        loss, grads = jax.value_and_grad(render_loss)(
            params, target, camera, cfg, lambda_ssim)
        stats = accumulate_stats(stats, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, stats, loss

    return step
