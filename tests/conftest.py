"""Test harness: run everything on an 8-device virtual CPU mesh.

Must set XLA flags before jax is imported anywhere — this file is imported
by pytest before any test module.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's TPU plugin ignores the JAX_PLATFORMS env var; force the
# CPU backend through the config API (must run before backend init).
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
