"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated here with
``--xla_force_host_platform_device_count=8`` (real-chip execution is covered
by bench.py and the driver's compile checks).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# keep the axon TPU-tunnel PJRT plugin out of test processes (its handshake
# serializes on the single chip; see .claude/skills/verify/SKILL.md)
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# a sitecustomize may have imported jax (and captured JAX_PLATFORMS=axon)
# before this conftest ran; the config update below re-pins the platform as
# long as no backend has been initialized yet, and XLA_FLAGS is re-read at
# backend init so the 8-device CPU mesh still forms.
jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, (
    f"test harness needs the virtual 8-device CPU mesh, got "
    f"{jax.devices()} — a pre-imported jax backend defeated the pinning")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
