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
    enable_compilation_cache()


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (set VGQA_COMPILE_CACHE=0 to skip).

    Full-model TPU compiles take 2-15 minutes through this environment's
    remote-compile service; the on-disk cache makes warm restarts of
    bench/serving/training near-instant for unchanged programs.
    """
    if os.environ.get("VGQA_COMPILE_CACHE", "1") == "0":
        return
    import jax

    cache_dir = os.environ.get(
        "VGQA_COMPILE_CACHE_DIR",
        os.path.expanduser("~/.cache/vgqa_jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Persist tiny programs too: every compile here rides the remote
        # service at ~350 ms/round-trip, so even jit_copy/broadcast_in_dim
        # are worth caching (a warm 64f@420 bench_train restart paid ~80 s
        # in 252 sub-threshold misses under the old 2.0 s floor).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # older jax without these flags
        pass
    # VGQA_EXPLAIN_CACHE=1: log WHY each compile missed the persistent
    # cache (jax explains the first differing key component). A cold
    # production-size compile costs 2-15 min through the remote service,
    # so an unexpected miss is worth a diagnosis run; see
    # tools/cache_doctor.py for an end-to-end cache health check.
    if os.environ.get("VGQA_EXPLAIN_CACHE") == "1":
        try:
            jax.config.update("jax_explain_cache_misses", True)
            import logging

            logging.getLogger("jax._src.compilation_cache").setLevel(
                logging.DEBUG
            )
            logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
        except Exception:
            pass
