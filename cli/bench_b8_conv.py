"""Isolated TPU bench: output-blocked B8 conv vs CHW-lanes kernel vs stock.

The B8 kernel (ops/pallas_conv_blocked.py) raises the small-channel conv's
MXU ceiling from C_out/128 to 9/30 = 30 % by blocking 8 output pixels per
matmul lane group.  This times forward AND full VJP for every eligible
stage of the cooperative conv stack at the production batch.

Usage: python cli/bench_b8_conv.py [--batch 20] [--dtype bfloat16]
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
    conv3x3_chw,
    conv3x3_chw_ad,
    nhwc_to_chw,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.ops.pallas_conv_blocked import (  # noqa: E402
    conv3x3_b8,
    conv3x3_b8_ad,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.utils.profiling import (  # noqa: E402
    fused_scan_marginal,
    serialize_scan,
)

STAGES = [(192, 16, 16), (96, 16, 32), (96, 32, 32), (48, 32, 64),
          (48, 64, 64)]


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
        x = jnp.asarray(jax.random.normal(key, (args.batch, h, h, cin), dtype))
        x_chw = jnp.asarray(jax.device_get(nhwc_to_chw(x)))
        w = jax.random.normal(key, (3, 3, cin, cout), dtype) * 0.1
        cot = jax.random.normal(key, (args.batch, h, h, cout), dtype)
        cot_chw = jnp.asarray(jax.device_get(nhwc_to_chw(cot)))
        flops = 2.0 * args.batch * h * h * 9 * cin * cout
        out = {"stage": f"{h}^2 {cin}->{cout}", "batch": args.batch,
               "dtype": args.dtype}

        def g_b8(c):
            gx, gw = jax.grad(
                lambda x_, w_: jnp.sum((conv3x3_b8_ad(x_, w_, False)
                                        * cot).astype(jnp.float32)),
                argnums=(0, 1))(x + c.astype(dtype), w)
            return (jnp.sum(gx.astype(jnp.float32)) * 1e-9
                    + jnp.sum(gw.astype(jnp.float32)))

        def g_chw(c):
            gx, gw = jax.grad(
                lambda x_, w_: jnp.sum((conv3x3_chw_ad(x_, w_, h, h, False)
                                        * cot_chw).astype(jnp.float32)),
                argnums=(0, 1))(x_chw + c.astype(dtype), w)
            return (jnp.sum(gx.astype(jnp.float32)) * 1e-9
                    + jnp.sum(gw.astype(jnp.float32)))

        def g_stock(c):
            gx, gw = jax.grad(
                lambda x_, w_: jnp.sum((stock(x_, w_)
                                        * cot).astype(jnp.float32)),
                argnums=(0, 1))(x + c.astype(dtype), w)
            return (jnp.sum(gx.astype(jnp.float32)) * 1e-9
                    + jnp.sum(gw.astype(jnp.float32)))

        variants = (
            ("stock", lambda c: stock(x + c.astype(dtype), w)),
            ("chw", lambda c: conv3x3_chw(x_chw + c.astype(dtype), w,
                                          H=h, W=h)),
            ("b8", lambda c: conv3x3_b8(x + c.astype(dtype), w)),
            ("stock_vjp", g_stock),
            ("chw_vjp", g_chw),
            ("b8_vjp", g_b8),
        )
        for name, fn in variants:
            try:
                t = fused_scan_marginal(
                    lambda K: serialize_scan(fn, K),
                    k_small=args.k_small, k_large=args.k_large, reps=4)
                out[f"{name}_ms"] = round(1e3 * t, 4)
                out[f"{name}_tflops"] = round(flops / t / 1e12, 1)
            except Exception as e:
                out[f"{name}_error"] = repr(e)[:160]
        for a, b, tag in (("chw", "b8", "b8_vs_chw"),
                          ("stock", "b8", "b8_vs_stock"),
                          ("chw_vjp", "b8_vjp", "b8_vjp_vs_chw")):
            if f"{a}_ms" in out and f"{b}_ms" in out:
                out[tag] = round(out[f"{a}_ms"] / out[f"{b}_ms"], 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
