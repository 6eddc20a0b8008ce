"""Persistent-compile-cache health check.

Full-size programs compile in 6-10 minutes through this environment's
remote-compile service (BASELINE.md training table), and the persistent
cache is the only thing standing between a warm restart and paying that
again. This tool answers "is the cache working, and if not, why":

1. inventory — entries, sizes, ages of the on-disk cache
2. round-trip probe — compile a marker program, drop the in-memory jit
   cache, recompile: the second compile must be served from disk
3. miss explanation — re-run any workload with VGQA_EXPLAIN_CACHE=1 and
   jax logs the first cache-key component that differs (the usual
   culprits: changed XLA flags, donated-buffer layout changes, a jaxlib
   upgrade, or trace-time constants baked into the HLO)

Usage:
    python tools/cache_doctor.py            # inventory + probe
    VGQA_PLATFORM=cpu python tools/cache_doctor.py   # hermetic CPU run
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("VGQA_EXPLAIN_CACHE", "1")

from vgqa_tpu.utils.platform import apply_platform_env

apply_platform_env()


def inventory(cache_dir: Path) -> None:
    print(f"cache dir: {cache_dir}")
    if not cache_dir.exists():
        print("  (does not exist yet — no compile has been cached)")
        return
    files = [f for f in cache_dir.rglob("*") if f.is_file()]
    total = sum(f.stat().st_size for f in files)
    print(f"  entries: {len(files)}   total: {total / 1e6:.1f} MB")
    now = time.time()
    for f in sorted(files, key=lambda f: -f.stat().st_mtime)[:10]:
        st = f.stat()
        print(
            f"  {st.st_size / 1e6:8.2f} MB  {(now - st.st_mtime) / 3600:6.1f} h old  "
            f"{f.name[:60]}"
        )


def probe() -> bool:
    """Compile a marker program twice (dropping the in-memory cache in
    between); the re-compile must be served from the persistent cache."""
    import jax
    import jax.numpy as jnp

    # unique enough to not collide with real programs, stable across runs
    @jax.jit
    def marker(x):
        return jnp.tanh(x @ x.T) * 3.14159 + jnp.sin(x).sum()

    x = jnp.ones((256, 256), jnp.float32)

    # NOTE: timings fetch a scalar to host — block_until_ready returns
    # before device execution completes on remote tunnels (CLAUDE.md).
    # Compilation itself is host-synchronous, so the cold/warm comparison
    # is valid either way; the fetch keeps the printed times honest.
    t0 = time.time()
    float(marker(x).sum())
    cold = time.time() - t0

    jax.clear_caches()  # drop in-memory executables; disk cache persists

    t0 = time.time()
    float(marker(x).sum())
    warm = time.time() - t0

    print(f"probe: first compile {cold:.2f}s, post-clear recompile {warm:.2f}s")
    # a disk hit skips XLA entirely; anything close to the cold time means
    # the persistent cache is NOT serving this process
    ok = warm < max(0.5 * cold, 0.75)
    print("persistent cache:", "SERVING" if ok else "NOT SERVING (miss)")
    if not ok:
        print(
            "  -> rerun your workload with VGQA_EXPLAIN_CACHE=1; jax logs the\n"
            "     first differing cache-key component for every miss.\n"
            "  -> known churn sources: XLA_FLAGS changes, jaxlib version\n"
            "     bumps, and big trace-time constants (keep masks/indices as\n"
            "     iota arithmetic — see models/video_swin.py)."
        )
    return ok


def main() -> None:
    cache_dir = Path(
        os.environ.get(
            "VGQA_COMPILE_CACHE_DIR",
            os.path.expanduser("~/.cache/vgqa_jax_cache"),
        )
    )
    inventory(cache_dir)
    print()
    probe()


if __name__ == "__main__":
    main()
