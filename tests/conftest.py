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
# tests NEVER use the persistent compile cache: its writer
# (put_executable_and_time) has segfaulted full-suite runs in this
# environment (observed with concurrent processes sharing the cache dir,
# and with cross-machine AOT reuse before the cache was
# machine-fingerprinted) — a CI gate must not depend on it
os.environ["GFPLSLAM_NO_COMPILE_CACHE"] = "1"
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


@pytest.fixture(autouse=True, scope="module")
def _bound_compiler_state():
    """Drop all live jitted executables between test modules.

    Full-suite runs in one process have segfaulted inside XLA:CPU's
    compiler after ~100 accumulated compiles (backend_compile_and_load,
    reproduced twice in this environment; also seen by round-3 review in
    put_executable_and_time); per-module cache clearing bounds the live
    compiler state so no module sees the others' accumulation. Costs only
    recompiles that module-scoped Configs would pay anyway."""
    yield
    jax.clear_caches()
