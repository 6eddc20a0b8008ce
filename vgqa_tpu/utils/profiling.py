"""Profiling hooks.

The reference has no formal tracing (SURVEY.md §5) — only wall-clock meters.
TPU-natively, `jax.profiler` captures full device traces viewable in
TensorBoard/XProf; these helpers make it a config knob on the trainer and a
context manager for ad-hoc use.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a device profile into ``log_dir`` (no-op when empty)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Device-synchronized step timing: call ``sync()`` with a small output
    array to force completion before reading the clock (plain
    block_until_ready can return early on remote-device tunnels)."""

    def __init__(self):
        self._last = time.time()

    def lap(self, sync_value=None) -> float:
        if sync_value is not None:
            jax.device_get(sync_value)
        now = time.time()
        dt = now - self._last
        self._last = now
        return dt
