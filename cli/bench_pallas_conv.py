"""Isolated TPU bench: CHW-lanes Pallas conv (ops/pallas_conv.py) vs stock.

Times the forward of each small-channel 3x3 stage three ways — stock XLA
NHWC conv, the Pallas kernel on pre-transposed (N, C, H*W) data (pure
kernel rate), and the NHWC wrapper including boundary transposes — with
the fused-scan marginal method (K=100/400 windows; single-op times are
~0.1-1 ms so the K=10/40 default is too noisy).

Usage: python cli/bench_pallas_conv.py [--batch 20] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    _flags = os.environ.get("XLA_FLAGS", "")
    if "space-to-batch-converter" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_disable_hlo_passes=space-to-batch-converter").strip()

import jax
import jax.numpy as jnp
from jax import lax

from cooperative_training_and_latent_space_data_augmentation_tpu.utils.cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

from cooperative_training_and_latent_space_data_augmentation_tpu.ops.pallas_conv import (  # noqa: E402
    chw_phase_split,
    conv3x3_chw,
    conv3x3_nhwc_via_chw,
    conv3x3s2_phase,
    nhwc_to_chw,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.utils.profiling import (  # noqa: E402
    fused_scan_marginal,
    serialize_scan,
)

STAGES = [(192, 16, 16), (96, 16, 32), (96, 32, 32), (48, 32, 64),
          (48, 64, 64), (24, 64, 128), (24, 128, 128)]


def stock(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--k_small", type=int, default=100)
    ap.add_argument("--k_large", type=int, default=400)
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    for h, cin, cout in STAGES:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (args.batch, h, h, cin), dtype)
        x_chw = jax.device_get(nhwc_to_chw(x))
        x_chw = jnp.asarray(x_chw)          # materialized, not a view
        w = jax.random.normal(key, (3, 3, cin, cout), dtype) * 0.1
        flops = 2.0 * args.batch * h * h * 9 * cin * cout
        out = {"stage": f"{h}^2 {cin}->{cout}", "batch": args.batch}
        variants = (
            ("stock", lambda c: stock(x + c.astype(dtype), w)),
            ("pallas_chw", lambda c: conv3x3_chw(
                x_chw + c.astype(dtype), w, H=h, W=h)),
            ("pallas_nhwc", lambda c: conv3x3_nhwc_via_chw(
                x + c.astype(dtype), w)),
        )
        for name, fn in variants:
            try:
                t = fused_scan_marginal(
                    lambda K: serialize_scan(fn, K),
                    k_small=args.k_small, k_large=args.k_large, reps=4)
                out[f"{name}_ms"] = round(1e3 * t, 4)
                out[f"{name}_tflops"] = round(flops / t / 1e12, 1)
            except Exception as e:  # compile failures reported per-variant
                out[f"{name}_error"] = repr(e)[:200]
        if "stock_ms" in out and "pallas_chw_ms" in out:
            out["kernel_speedup"] = round(out["stock_ms"] / out["pallas_chw_ms"], 2)
        if "stock_ms" in out and "pallas_nhwc_ms" in out:
            out["wrapped_speedup"] = round(out["stock_ms"] / out["pallas_nhwc_ms"], 2)
        print(json.dumps(out), flush=True)

    # stride-2 downsample stages (torch Conv2d(C, C, 3, s2, p1) — the
    # ResConvDown entry convs): stock NHWC vs the phase kernel, both from
    # the layout each rides in production (NHWC vs CHW-resident + split).
    for h, c in [(192, 16), (96, 32), (48, 64), (24, 128)]:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (args.batch, h, h, c), dtype)
        x_chw = jnp.asarray(jax.device_get(nhwc_to_chw(x)))
        w = jax.random.normal(key, (3, 3, c, c), dtype) * 0.1
        flops = 2.0 * args.batch * (h // 2) * (h // 2) * 9 * c * c
        out = {"stage": f"s2 {h}^2 {c}->{c}", "batch": args.batch}
        variants = (
            ("stock_s2", lambda cst: lax.conv_general_dilated(
                x + cst.astype(dtype), w, (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))),
            ("pallas_s2", lambda cst: conv3x3s2_phase(
                chw_phase_split(x_chw + cst.astype(dtype), h, h),
                w, H=h, W=h)),
        )
        for name, fn in variants:
            try:
                t = fused_scan_marginal(
                    lambda K: serialize_scan(fn, K),
                    k_small=args.k_small, k_large=args.k_large, reps=4)
                out[f"{name}_ms"] = round(1e3 * t, 4)
                out[f"{name}_tflops"] = round(flops / t / 1e12, 1)
            except Exception as e:
                out[f"{name}_error"] = repr(e)[:200]
        if "stock_s2_ms" in out and "pallas_s2_ms" in out:
            out["s2_speedup"] = round(out["stock_s2_ms"] / out["pallas_s2_ms"], 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
