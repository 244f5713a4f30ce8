"""Multi-host (multi-process) rendering on top of jax.distributed.

The reference is a single-GPU stack (SURVEY.md §2.5); gsrt's single-process
multi-chip layer is `gsrt.parallel.tiles`. This module extends it across
HOSTS the TPU-native way: one Python process per host, all launched with
the same program, connected by `jax.distributed.initialize` — after which
`jax.devices()` is the GLOBAL device list and the `tiles`/`splats` mesh of
`make_render_mesh` spans every chip in the pod slice. XLA then lowers the
same shard_map collectives to ICI within a host and DCN across hosts; no
NCCL/MPI-style code is needed (the design the scaling playbook prescribes:
pick a mesh, annotate shardings, let XLA insert collectives).

Launch pattern (one process per host):

    JAX_COORDINATOR=host0:8476 JAX_NUM_PROCESSES=4 JAX_PROCESS_ID=$i \
        python -m my_render_job

    from gsrt.parallel import multihost
    multihost.initialize()                  # reads the env vars above
    mesh = multihost.global_render_mesh(n_splats=2)
    out = multihost.render_data_parallel_global(cloud, camera, cfg, mesh)

Each process feeds the full (replicated) cloud and camera; the framebuffer
comes back sharded — each host holds its row slabs — and
`gather_to_hosts` materializes the full image on every host when needed
(cross-host all-gather over DCN; skip it in serving loops that only
consume local slabs).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from gsrt.core.config import RenderConfig
from gsrt.core.types import Camera, GaussianCloud
from gsrt.parallel.tiles import make_render_mesh, render_data_parallel


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """`jax.distributed.initialize` with env-var defaults
    (JAX_COORDINATOR / JAX_NUM_PROCESSES / JAX_PROCESS_ID). On TPU pods
    with the standard runtime all three are auto-detected and this reduces
    to `jax.distributed.initialize()`. Idempotent. Must run before any
    call that initializes the XLA backend (jax.devices etc.)."""
    if jax.distributed.is_initialized():
        return                         # already initialized
    kwargs = {}
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR")
    if addr:
        kwargs["coordinator_address"] = addr
    nproc = num_processes if num_processes is not None else \
        os.environ.get("JAX_NUM_PROCESSES")
    if nproc is not None:
        kwargs["num_processes"] = int(nproc)
    pid = process_id if process_id is not None else \
        os.environ.get("JAX_PROCESS_ID")
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)


def global_render_mesh(n_splats: int = 1):
    """('tiles', 'splats') mesh over ALL devices of ALL processes. The
    splat axis is innermost so its all_gather stays on the faster links
    (ICI within a host); image slabs span hosts — a pure output sharding
    with no cross-host traffic on the render path."""
    n_dev = len(jax.devices())
    assert n_dev % n_splats == 0, (n_dev, n_splats)
    return make_render_mesh(n_dev // n_splats, n_splats)


def render_data_parallel_global(cloud: GaussianCloud, camera: Camera,
                                cfg: RenderConfig, mesh):
    """Image-slab DP over the global mesh. Returns (trans, color) sharded
    over 'tiles' — each host holds its own row slabs."""
    return render_data_parallel(cloud, camera, cfg, mesh)


def gather_to_hosts(tree):
    """Materialize globally-sharded outputs as full host-local numpy
    arrays on EVERY process (cross-host all-gather over DCN)."""
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(tree, tiled=True)


def sync_hosts(name: str = "gsrt") -> None:
    """Barrier across processes (e.g. before/after checkpoint IO)."""
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)
