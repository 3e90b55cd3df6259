"""Isolated TPU A/B: staircase packed conv vs stock XLA conv (ops/fast_conv.py).

Times fwd and fwd+bwd of each FCN_16 stride-1 3x3 stage both ways with the
fused-scan marginal method.  Prints one JSON line per stage.

Usage: python cli/bench_fast_conv.py [--batch 20] [--dtype bfloat16]
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

from cooperative_training_and_latent_space_data_augmentation_tpu.ops.fast_conv import (  # noqa: E402
    pick_pack_factor,
    staircase_conv3x3,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.utils.profiling import (  # noqa: E402
    fused_scan_marginal,
    serialize_scan,
)

STAGES = [(192, 1, 16), (192, 16, 16), (96, 16, 32), (96, 32, 32),
          (48, 32, 64), (48, 64, 64), (24, 64, 128), (24, 128, 128)]


def stock(x, w):
    # no preferred_element_type: matches flax nn.Conv's lowering, and the
    # conv transpose rule rejects f32-output/bf16-weight mixes under grad
    return lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def time_pair(batch, h, cin, cout, dtype, k_small=100, k_large=400):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, h, h, cin), dtype)
    w = jax.random.normal(key, (3, 3, cin, cout), dtype) * 0.1
    flops = 2.0 * batch * h * h * 9 * cin * cout
    out = {"stage": f"{h}^2 {cin}->{cout}", "batch": batch,
           "f": pick_pack_factor(h, cin, cout)}
    for name, fn in (("stock", stock), ("stair", staircase_conv3x3)):
        t_f = fused_scan_marginal(
            lambda K: serialize_scan(lambda c: fn(x + c.astype(dtype), w), K),
            k_small=k_small, k_large=k_large, reps=4)

        def loss(x_, w_, fn=fn):
            return jnp.mean(fn(x_, w_).astype(jnp.float32))

        grad = jax.value_and_grad(loss, argnums=(0, 1))

        def bwd(c):
            v, (gx, gw) = grad(x + c.astype(dtype), w)
            return (v + jnp.mean(gx.astype(jnp.float32))
                    + jnp.mean(gw.astype(jnp.float32)))[None]

        t_b = fused_scan_marginal(lambda K: serialize_scan(bwd, K),
                                  k_small=k_small, k_large=k_large, reps=4)
        out[f"{name}_fwd_ms"] = round(1e3 * t_f, 3)
        out[f"{name}_fwdbwd_ms"] = round(1e3 * t_b, 3)
        out[f"{name}_fwd_tflops"] = round(flops / t_f / 1e12, 1)
        out[f"{name}_fwdbwd_tflops"] = round(3 * flops / t_b / 1e12, 1)
    out["fwd_speedup"] = round(out["stock_fwd_ms"] / out["stair_fwd_ms"], 2)
    out["fwdbwd_speedup"] = round(
        out["stock_fwdbwd_ms"] / out["stair_fwdbwd_ms"], 2)
    return out


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
        print(json.dumps(time_pair(args.batch, h, cin, cout, dtype,
                                   args.k_small, args.k_large)),
              flush=True)


if __name__ == "__main__":
    main()
