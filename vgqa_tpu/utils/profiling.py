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


def summarize_trace(log_dir: str, top: int = 25) -> list:
    """Aggregate device-op durations from a jax.profiler trace directory.

    Parses the Chrome-trace JSON (works through remote-device tunnels —
    the r3 prof420 pattern), sums 'X' events per op name on the device
    process tracks, prints and returns [(name, total_ms, count)] for the
    ``top`` heaviest ops."""
    import glob
    import gzip
    import json
    from collections import defaultdict

    rows = []
    for tr in glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True):
        with gzip.open(tr, "rt") as f:
            events = json.load(f).get("traceEvents", [])
        pid_names = {e["pid"]: e["args"].get("name", "")
                     for e in events if e.get("ph") == "M"
                     and e.get("name") == "process_name" and "args" in e}
        by_pid = defaultdict(float)
        for e in events:
            if e.get("ph") == "X":
                by_pid[e["pid"]] += e.get("dur", 0)
        dev_pids = [p for p in by_pid
                    if "TPU" in pid_names.get(p, "")
                    or "/device" in pid_names.get(p, "")]
        if not dev_pids and by_pid:
            dev_pids = [max(by_pid, key=by_pid.get)]
        agg = defaultdict(float)
        cnt = defaultdict(int)
        for e in events:
            if e.get("ph") == "X" and e["pid"] in dev_pids:
                agg[e["name"]] += e.get("dur", 0)
                cnt[e["name"]] += 1
        total = sum(agg.values())
        print(f"[trace {tr}] device total {total / 1e3:.1f} ms")
        for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {dur / 1e3:9.2f} ms x{cnt[name]:5d}  {name[:110]}",
                  flush=True)
            rows.append((name, dur / 1e3, cnt[name]))
    return rows


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
