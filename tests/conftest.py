"""Test config: run on CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4 — the analogue of the
reference using a cycle simulator as a fake backend)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon sitecustomize registers the TPU platform at interpreter start and
# prepends it to jax_platforms — force pure CPU before any backend spins up.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
