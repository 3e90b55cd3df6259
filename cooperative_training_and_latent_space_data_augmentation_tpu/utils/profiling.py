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
import jax.numpy as jnp
from jax import lax

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


def fused_scan_marginal(make_scalar_fn: Callable[[int], Callable[[], Any]],
                        k_small: int = 10, k_large: int = 40,
                        reps: int = 3) -> float:
    """Marginal per-iteration device time via fused-scan windows.

    On tunneled TPU backends ``jax.block_until_ready`` does not wait for
    device execution (see RESULTS.md MEASUREMENT CORRECTION), so honest
    timing requires (a) fusing K iterations into ONE dispatch via
    ``lax.scan`` and (b) forcing a scalar device->host fetch.  This helper
    times ``make_scalar_fn(K)()`` (a jitted zero-arg callable returning a
    scalar) for K = k_small and k_large and returns the marginal seconds
    per iteration — subtracting dispatch/fetch latency and one-time stalls.
    bench.py validates the method in-band at ~193 TFLOP/s ~= 98 % of v5e
    bf16 matmul peak.
    """
    times = {}
    for K in (k_small, k_large):
        f = make_scalar_fn(K)
        _ = float(f())  # compile + first-dispatch stall
        best = float("inf")
        for _r in range(reps):
            t0 = time.perf_counter()
            _ = float(f())
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    return (times[k_large] - times[k_small]) / (k_large - k_small)


def serialize_scan(op: Callable[[Any], Any], K: int) -> Callable[[], Any]:
    """Build a jitted zero-arg scalar fn applying ``op`` K times, serialized.

    ``op`` maps a tiny float32 scalar perturbation -> an array (typically
    ``lambda c: f(x + c.astype(x.dtype))``); each iteration's input depends
    on the previous output's mean so XLA cannot parallelize, dedupe, or
    dead-code-eliminate the chain.  Use with :func:`fused_scan_marginal`.
    """

    @jax.jit
    def run():
        def body(c, _):
            y = op(c)
            return jnp.mean(y.astype(jnp.float32)) * 1e-12, None

        c, _ = lax.scan(body, jnp.float32(0), None, length=K)
        return c

    return run


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
