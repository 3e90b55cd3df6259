"""Persistent XLA compilation cache.

The cooperative train step is a large fused graph (~1 TFLOP of conv fwd/bwd)
whose first compile costs minutes on a fresh process — and on tunneled TPU
backends there is an additional one-time stall around the first big
executable.  A persistent on-disk cache removes both for every process after
the first: measured 10.1 s -> 0.1 s for a conv-grad graph across processes
on this image.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "cooperative_tpu_xla_cache")


def enable_compilation_cache(cache_dir: str = DEFAULT_CACHE_DIR,
                             min_compile_time_secs: float = 0.5) -> str:
    """Enable the JAX persistent compilation cache (idempotent; safe to call
    before or after backend init).  Also makes ``JAX_PLATFORMS=cpu`` actually
    select CPU: on images where a TPU plugin registers via sitecustomize the
    env route is silently overridden, so mirror it into jax.config (must run
    before backend init — every CLI calls this first)."""
    import jax

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_secs)
    return cache_dir
