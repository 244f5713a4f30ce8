"""Checkpoint / resume.

The reference checkpoints simulator state between functional and timing
phases (vulkan-sim/checkpoint.md). The renderer-level equivalents here:

* scene checkpoints — GaussianCloud SoA (+ optional prebuilt BVH arrays) as
  a single .npz so expensive scene prep runs once per scene;
* training checkpoints — GaussianParams + optimizer state as flattened
  pytree leaves in .npz (self-contained; orbax not required).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gsrt.core.types import GaussianCloud


def _npz(path: str) -> str:
    """np.savez appends '.npz' when missing but np.load does not — keep
    the round trip symmetric."""
    return path if path.endswith(".npz") else path + ".npz"


def save_scene(path: str, cloud: GaussianCloud, bvh=None) -> None:
    arrays = {f"cloud_{k}": np.asarray(v)
              for k, v in cloud._asdict().items()}
    if bvh is not None:
        arrays.update({f"bvh_{k}": np.asarray(v)
                       for k, v in bvh._asdict().items()})
    np.savez_compressed(path, **arrays)


def load_scene(path: str):
    data = np.load(_npz(path))
    cloud = GaussianCloud(**{k: jnp.asarray(data[f"cloud_{k}"])
                             for k in GaussianCloud._fields})
    bvh = None
    if "bvh_left" in data:
        from gsrt.ops.bvh import LBVH
        bvh = LBVH(**{k: jnp.asarray(data[f"bvh_{k}"])
                      for k in LBVH._fields})
    return cloud, bvh


def save_training(path: str, params, opt_state, step: int) -> None:
    """Training state → npz (pytree flattened with stable key order)."""
    leaves, treedef = jax.tree_util.tree_flatten((params, opt_state))
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["step"] = np.asarray(step)
    np.savez_compressed(path, **arrays)


def load_training(path: str, params_like, opt_state_like):
    data = np.load(_npz(path))
    leaves, treedef = jax.tree_util.tree_flatten(
        (params_like, opt_state_like))
    restored = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))]
    params, opt_state = jax.tree_util.tree_unflatten(treedef, restored)
    return params, opt_state, int(data["step"])
