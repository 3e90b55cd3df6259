"""Per-stage TPU profile of the device augmentation pipeline.

Breaks the augment_sample cost (per 10-raw-sample batch, 224^2 pad ->
192^2 crop, full ACDC policy) down by stage with the fused-scan marginal
method (the only honest timing on the tunneled backend): each stage is
scanned K=40-vs-10 times over a batch of 10 samples with fresh keys,
value-forced, and the marginal is reported.  Stages run standalone, so
shared subexpressions are double-counted vs the FULL row; the FULL row is
the number the epoch decomposition uses.

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

    # Two harness rules, both learned from under-measurements:
    #  * consume the FULL output (an early version reduced a 2x2 corner and
    #    XLA slice-propagated/DCE'd most of each stage);
    #  * PER-SAMPLE keys, exactly like the shipped pipeline
    #    (ops/augment.py:781,801 splits the batch key per sample).  Closing
    #    one key over the whole vmapped batch gives every sample identical
    #    random fields/coords, which lets XLA hoist the per-sample field
    #    math out of the vmap and batch the B neighborhood gathers over
    #    shared indices — the FULL pipeline then reads ~7 ms/batch vs the
    #    honest ~20 ms (and 16 x that missing ~13 ms/batch is precisely the
    #    epoch-decomposition gap profile_fused_epoch.py went hunting).
    def consume(tree):
        return sum(jnp.sum(leaf.astype(jnp.float32))
                   for leaf in jax.tree.leaves(tree))

    def vmk(k, fn, *xs_in):
        """vmap fn(key, *per_sample_args) with per-sample keys; consume all."""
        return consume(jax.vmap(fn)(jax.random.split(k, B), *xs_in))

    def coords(k):
        # per-sample smooth displacement (the pipeline's own elastic field)
        # composed on the crop-offset 192^2 output grid, like augment_sample
        dydx = jax.vmap(lambda kk: jnp.stack(
            aug._elastic_field(kk, CROP, CROP, policy)))(
                jax.random.split(jax.random.fold_in(k, 7), B))
        off = (H - CROP) // 2
        return ys0 + off + dydx[:, 0], xs0 + off + dydx[:, 1]

    stages = {
        "bias_field_v1 (multi-scale FFT field)": lambda k: vmk(
            k, lambda kk, i: aug.bias_field_v1(kk, i, policy), img),
        "bias_field_v2 (B-spline knots)": lambda k: vmk(
            k, lambda kk, i: aug.bias_field_v2(kk, i, policy), img),
        "brightness_contrast": lambda k: vmk(
            k, lambda kk, i: aug.brightness_contrast(kk, i, policy), img),
        "elastic field gen (FFT smooth, per-sample)": lambda k: vmk(
            k, lambda kk: jnp.stack(aug._elastic_field(kk, H, W, policy))),
        # the SHIPPED warp path: augment_sample warps image+label through
        # warp_image_and_label (one fused gather).  The standalone
        # warp_image/warp_label entry points take the unfused
        # map_coordinates_cubic route (two 16-tap gathers) and measure
        # far slower standalone — do not profile those as pipeline stages.
        "warp_image_and_label (fused order-3, 224^2 -> 192^2)": lambda k: (
            lambda yx: consume(jax.vmap(
                lambda i, l, y, x: aug.warp_image_and_label(i, l, y, x, 4)
            )(img, lbl, yx[0], yx[1])))(coords(k)),
        "percentile_normalize (192^2)": lambda k: vmk(
            k, lambda kk, i: aug.percentile_normalize(
                i + jax.random.uniform(kk, (1, 1, 1))),
            img[:, :CROP, :CROP]),
        "FULL augment_sample pipeline (img+lbl consumed)": lambda k: vmk(
            k, lambda kk, i, l: aug.augment_sample(kk, i, l, policy, (H, W),
                                                   (CROP, CROP), 4),
            img, lbl),
    }

    rows = []
    for name, fn in stages.items():
        ms = marginal_ms(fn)
        rows.append((name, ms))
        print(json.dumps({"stage": name, "ms_per_batch": round(ms, 2)}),
              flush=True)

    full = next((ms for name, ms in rows if name.startswith("FULL")),
                float("nan"))
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
