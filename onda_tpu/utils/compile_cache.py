"""Persistent XLA compile-cache setup that works even when jax was imported
before us.

On this environment a site .pth hook imports jax at interpreter startup, so
jax's config States (which read their JAX_* environment variables exactly once,
at definition time) are already frozen before any of our code runs. Setting
`os.environ["JAX_COMPILATION_CACHE_DIR"]` from conftest/bench is then a silent
no-op: `jax.config.jax_compilation_cache_dir` stays None and nothing is ever
written (observed 2026-08-20 — a full 133-test run left the cache directory
empty). The fix is to apply the same three settings through
`jax.config.update`, which works at any time before the first compilation.

The env vars are still exported for the benefit of subprocesses (e.g. the
2-process distributed test's workers) that may start fresh interpreters.
"""

import os


def enable(cache_dir: str) -> None:
    """Route jax's persistent compile cache to `cache_dir`, caching every
    entry (no min-size / min-compile-time thresholds — XLA:CPU compiles on
    this one-core box are expensive enough that everything is worth keeping).

    Honors a pre-existing JAX_COMPILATION_CACHE_DIR from the shell (that one
    DID take effect at startup); otherwise points jax at `cache_dir`.
    """
    cache_dir = os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

    import sys

    if "jax" not in sys.modules:
        # jax not imported yet: the env vars above WILL take effect at import,
        # and importing jax here would defeat callers (bench.py) that probe the
        # possibly-wedged tunnel backend in a killable subprocess before
        # letting the main process touch jax at all
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_entry_size_bytes",
        int(os.environ["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"]),
    )
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]),
    )
