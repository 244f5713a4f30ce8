"""Multi-host layer: two REAL processes on localhost, connected by
jax.distributed, render image-slab DP over the global 4-device mesh
(2 processes x 2 virtual CPU devices) and must reproduce the
single-process render bit-for-bit.

This exercises the actual cross-process path (TCP coordinator, global
mesh, process_allgather) — the CPU-mesh analogue of a 2-host TPU pod
slice (SURVEY.md §4: simulator-as-fake-backend test strategy).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from gsrt.core.config import RenderConfig
from gsrt.parallel import multihost
from gsrt.scene.catalog import random_cloud

multihost.initialize()
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

cloud, camera = random_cloud(256, seed=3, width=64, height=32)
cfg = RenderConfig(width=64, height=32, conic_mode="standard",
                   splat_chunk=64)
mesh = multihost.global_render_mesh(n_splats=1)
trans, color = multihost.render_data_parallel_global(
    cloud, camera, cfg, mesh)
trans_full, color_full = multihost.gather_to_hosts((trans, color))
multihost.sync_hosts()
if jax.process_index() == 0:
    np.savez(sys.argv[1], trans=np.asarray(trans_full),
             color=np.asarray(color_full))
print("WORKER_OK", jax.process_index())
"""


@pytest.mark.slow
def test_two_process_render_matches_single(tmp_path):
    port = _free_port()
    out = tmp_path / "mh.npz"
    env_base = dict(os.environ)
    env_base.pop("XLA_FLAGS", None)
    procs = []
    for pid in range(2):
        env = dict(env_base)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["JAX_COORDINATOR"] = f"localhost:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(out)], env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{stdout}\n{stderr}"
        assert "WORKER_OK" in stdout

    # single-process reference on the same scene
    import jax
    from gsrt.core.config import RenderConfig
    from gsrt.models.gaussian_rt import render_fast
    from gsrt.scene.catalog import random_cloud
    cloud, camera = random_cloud(256, seed=3, width=64, height=32)
    cfg = RenderConfig(width=64, height=32, conic_mode="standard",
                       splat_chunk=64)
    ref = render_fast(cloud, camera, cfg)
    got = np.load(out)
    np.testing.assert_allclose(got["trans"], np.asarray(ref.trans),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got["color"], np.asarray(ref.color),
                               rtol=1e-5, atol=1e-5)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port
