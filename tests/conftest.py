"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container exports ``JAX_PLATFORMS=axon`` (a tunneled real TPU with
~minutes of first-compile latency); tests override to CPU via jax.config —
the env var alone is rewritten by the axon plugin's sitecustomize.
XLA_FLAGS must be set before the CPU backend initializes (it is lazy, so
doing it here is early enough even though sitecustomize already imported jax).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # allow f64 oracles in tests

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running integration test")
