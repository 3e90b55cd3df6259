"""Per-stage TPU profile of the device augmentation pipeline.

The fused augmentation pipeline measures 103 ms per 10-raw-sample batch
(224^2 pad -> 192^2 crop, full ACDC policy) — larger than the 86 ms
cooperative train step it feeds (RESULTS.md).  This breaks that cost down
by stage with the fused-scan marginal method (the only honest timing on
the tunneled backend): each stage is scanned K=40-vs-10 times over a
batch of 10 samples with fresh keys, value-forced, and the marginal is
reported.

Reference counterparts: transform.py:46-112 pipeline stages
(MyRandomPurtarbation/V2, RandomBrightnessFluctuation, ts.RandomAffine,
MyElasticTransform x2, MySpecialCrop, MyNormalizeMedicPercentile).

Usage: python cli/profile_augment.py [--batch 10] [--out saved/augment_profile.md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cooperative_training_and_latent_space_data_augmentation_tpu.utils.cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from cooperative_training_and_latent_space_data_augmentation_tpu.ops import (  # noqa: E402
    augment as aug,
)

H = W = 224
CROP = 192


def marginal_ms(make_batch_fn, reps: int = 3):
    """Fused-scan marginal wall time (ms) of make_batch_fn(keys) -> scalar."""

    def multi(key, K):
        def step(carry, k):
            return carry + make_batch_fn(k), None

        keys = jax.random.split(key, K)
        out, _ = lax.scan(step, jnp.float32(0), keys)
        return out

    times = {}
    for K in (10, 40):
        f = jax.jit(lambda k, K=K: multi(k, K))
        _ = float(f(jax.random.PRNGKey(2)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(f(jax.random.PRNGKey(2)))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    return 1e3 * (times[40] - times[10]) / 30


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--out", default="saved/augment_profile.md")
    args = ap.parse_args()
    B = args.batch

    policy = aug.get_policy("ACDC_affine_elastic_intensity")
    img = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 1))
    lbl = jax.random.randint(jax.random.PRNGKey(1), (B, H, W), 0, 4)
    ys0, xs0 = aug._base_grid(CROP, CROP)

    # Every stage takes a FRESH key and derives its inputs from it — a
    # key-independent stage gets hoisted out of the timing scan by XLA and
    # reads as ~0 ms (this profiler's first version did exactly that).
    def coords(k):
        # warp coords jittered per step so the gathers can't be hoisted;
        # crop-composed output grid (192^2), like augment_sample
        j = jax.random.uniform(k, (2, B, CROP, CROP), minval=-3.0, maxval=3.0)
        off = (H - CROP) // 2
        return ys0 + off + j[0], xs0 + off + j[1]

    def vm(fn, *xs_in):
        return jnp.sum(jax.vmap(fn)(*xs_in).astype(jnp.float32)[:, :2, :2])

    stages = {
        "bias_field_v1 (multi-scale FFT field)": lambda k: vm(
            lambda i: aug.bias_field_v1(k, i, policy), img),
        "bias_field_v2 (B-spline knots)": lambda k: vm(
            lambda i: aug.bias_field_v2(k, i, policy), img),
        "brightness_contrast": lambda k: vm(
            lambda i: aug.brightness_contrast(k, i, policy), img),
        "elastic field gen (FFT smooth)": lambda k: (
            lambda dydx: jnp.sum(dydx[0][:2, :2] + dydx[1][:2, :2]))(
                aug._elastic_field(k, H, W, policy)),
        "warp_image (order-3, 224^2 src -> 192^2 out)": lambda k: (
            lambda yx: vm(lambda i, y, x: aug.warp_image(i, y, x),
                          img, yx[0], yx[1]))(coords(k)),
        "warp_label (order-3 per-class, 224^2 src -> 192^2 out)": lambda k: (
            lambda yx: vm(lambda l, y, x: aug.warp_label(l, y, x, 4).astype(
                jnp.float32), lbl, yx[0], yx[1]))(coords(k)),
        "percentile_normalize (192^2)": lambda k: (
            lambda j: vm(aug.percentile_normalize,
                         img[:, :CROP, :CROP] + j))(
            jax.random.uniform(k, (B, 1, 1, 1))),
        "FULL augment_sample pipeline (img+lbl consumed)": lambda k: vm(
            lambda i, l: aug.augment_sample(k, i, l, policy, (H, W),
                                            (CROP, CROP), 4)[0], img, lbl
        ) + vm(
            lambda i, l: aug.augment_sample(k, i, l, policy, (H, W),
                                            (CROP, CROP), 4)[1].astype(
                                                jnp.float32), img, lbl),
    }

    rows = []
    for name, fn in stages.items():
        ms = marginal_ms(fn)
        rows.append((name, ms))
        print(json.dumps({"stage": name, "ms_per_batch": round(ms, 2)}),
              flush=True)

    full = dict(rows).get("FULL augment_sample pipeline", float("nan"))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("# Augmentation pipeline per-stage profile "
                f"(batch {B} raw, {H}^2 pad, {jax.default_backend()})\n\n"
                "Fused-scan marginal (K=40 vs 10, value-forced), fresh keys "
                "per step.  Stages run standalone, so shared subexpressions "
                "are double-counted vs FULL.\n\n"
                "| stage | ms / batch | % of full |\n|---|---|---|\n")
        for name, ms in rows:
            pct = 100 * ms / full if full == full and full > 0 else float("nan")
            f.write(f"| {name} | {ms:.2f} | {pct:.0f}% |\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
