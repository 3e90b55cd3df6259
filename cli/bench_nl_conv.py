"""Isolated TPU bench: NL-sublanes Pallas conv (large-channel stages) vs stock.

The CHW-lanes kernel covers the <=64-channel stages; the remaining stock-XLA
convs are the 128-channel stages at 24^2/12^2 spatial (channel plan
medseg/models/ebm/encoder_decoder.py:351-453).  This times each of them:
stock NHWC conv vs ops/pallas_conv.conv3x3_nl (channels on lanes, flattened
batch*pixels on sublanes — native NHWC layout, zero boundary transposes),
with the fused-scan marginal method.

Usage: python cli/bench_nl_conv.py [--batch 40] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from cooperative_training_and_latent_space_data_augmentation_tpu.utils.cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

from cooperative_training_and_latent_space_data_augmentation_tpu.ops.pallas_conv import (  # noqa: E402
    conv3x3_nl,
    conv3x3_nl_ad,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.utils.profiling import (  # noqa: E402
    fused_scan_marginal,
    serialize_scan,
)

# the network's large-channel stages (effective batch = 2x config batch with
# keep_orig): enc.d3 core, enc.d4 core/decoupler (12^2), decoder u1 bottom
STAGES = [(24, 64, 128), (24, 128, 128), (12, 128, 128), (24, 128, 64)]


def stock(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=40)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--k_small", type=int, default=100)
    ap.add_argument("--k_large", type=int, default=400)
    ap.add_argument("--grad", action="store_true",
                    help="also time the full VJP (fwd+bwd)")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    for h, cin, cout in STAGES:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (args.batch, h, h, cin), dtype)
        w = jax.random.normal(key, (3, 3, cin, cout), dtype) * 0.1
        flops = 2.0 * args.batch * h * h * 9 * cin * cout
        out = {"stage": f"{h}^2 {cin}->{cout}", "batch": args.batch,
               "dtype": args.dtype}
        variants = [
            ("stock", lambda c: stock(x + c.astype(dtype), w)),
            ("pallas_nl", lambda c: conv3x3_nl(x + c.astype(dtype), w)),
        ]
        if args.grad:
            cot = jax.random.normal(key, (args.batch, h, h, cout), dtype)

            def g_stock(c):
                return jax.grad(
                    lambda x_, w_: jnp.sum((stock(x_, w_) * cot)
                                           .astype(jnp.float32)),
                    argnums=(0, 1))(x + c.astype(dtype), w)

            def g_nl(c):
                return jax.grad(
                    lambda x_, w_: jnp.sum((conv3x3_nl_ad(x_, w_, False) * cot)
                                           .astype(jnp.float32)),
                    argnums=(0, 1))(x + c.astype(dtype), w)

            variants += [("stock_vjp", g_stock), ("pallas_nl_vjp", g_nl)]
        for name, fn in variants:
            try:
                t = fused_scan_marginal(
                    lambda K: serialize_scan(fn, K),
                    k_small=args.k_small, k_large=args.k_large, reps=4)
                out[f"{name}_ms"] = round(1e3 * t, 4)
                out[f"{name}_tflops"] = round(flops / t / 1e12, 1)
            except Exception as e:
                out[f"{name}_error"] = repr(e)[:200]
        if "stock_ms" in out and "pallas_nl_ms" in out:
            out["speedup"] = round(out["stock_ms"] / out["pallas_nl_ms"], 2)
        if "stock_vjp_ms" in out and "pallas_nl_vjp_ms" in out:
            out["vjp_speedup"] = round(
                out["stock_vjp_ms"] / out["pallas_nl_vjp_ms"], 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
