"""Platform selection for CLI tools.

The environment's TPU plugin ignores the standard ``JAX_PLATFORMS`` env var,
so tools call this helper before any backend initialization: set
``VGQA_PLATFORM=cpu`` (plus ``XLA_FLAGS=--xla_force_host_platform_device_count=N``)
to run any CLI hermetically on a virtual CPU mesh.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    platform = os.environ.get("VGQA_PLATFORM", "")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
