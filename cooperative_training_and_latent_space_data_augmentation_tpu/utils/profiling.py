"""Tracing / profiling utilities (SURVEY §5).

The reference has only ad-hoc tools (SizeEstimator, forward hooks, tqdm).
The TPU-native equivalents are first-class:

  * :func:`trace` — context manager around ``jax.profiler`` writing a
    TensorBoard-loadable trace (xplane) directory.
  * :func:`time_fn` — wall-clock timing with ``block_until_ready`` and
    compile/steady-state separation.
  * :func:`cost_summary` — XLA's own FLOP/byte counts for a jitted call plus
    roofline ratios against chip peaks (defaults: TPU v5e).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax

# v5e single-chip peaks (public figures): ~197 TFLOP/s bf16, ~819 GB/s HBM.
V5E_PEAK_FLOPS_BF16 = 197e12
V5E_PEAK_HBM_BYTES = 819e9


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a region: ``with trace('/tmp/tb'): step(...)`` then load the
    directory in TensorBoard / xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, warmup: int = 2, iters: int = 10,
            **kwargs) -> Dict[str, float]:
    """Time ``fn(*args)``: returns compile time (first call) and steady-state
    seconds/call, synchronized with block_until_ready."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for _ in range(max(0, warmup - 1)):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    steady_s = (time.perf_counter() - t0) / iters
    return {"compile_s": compile_s, "steady_s": steady_s}


def cost_summary(fn: Callable, *args,
                 peak_flops: float = V5E_PEAK_FLOPS_BF16,
                 peak_bytes: float = V5E_PEAK_HBM_BYTES,
                 measured_s: Optional[float] = None) -> Dict[str, float]:
    """XLA cost analysis of ``jit(fn)(*args)`` with optional roofline ratios.

    Note: XLA's 'flops'/'bytes accessed' are logical op counts (fusion-
    inflated), so utilization ratios are upper-bound indicators.
    """
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    out = {
        "flops": float(ca.get("flops", float("nan"))),
        "bytes_accessed": float(ca.get("bytes accessed", float("nan"))),
    }
    try:
        ma = compiled.memory_analysis()
        out["temp_bytes"] = float(ma.temp_size_in_bytes)
        out["argument_bytes"] = float(ma.argument_size_in_bytes)
    except Exception:
        pass
    if measured_s:
        out["achieved_flops_per_s"] = out["flops"] / measured_s
        out["mxu_utilization_upper_bound"] = out["achieved_flops_per_s"] / peak_flops
        out["hbm_utilization_upper_bound"] = (
            out["bytes_accessed"] / measured_s / peak_bytes)
    return out
