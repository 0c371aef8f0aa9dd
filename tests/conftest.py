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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
