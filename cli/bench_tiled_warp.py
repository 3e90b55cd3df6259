"""A/B the tile-local MXU warp (TILED_WARP) against the per-pixel gather.

VERDICT r4 #1: the tiled warp (`ops/augment.py:_fused_warp_tiled_eval`)
shipped default-ON in round 4 with value pins but NO measured TPU number.
This bench times the full `augment_batch` pipeline (the only place the
tiled path is reachable) under both settings with the fused-scan marginal
method (K=40 vs 10, value-forced, per-sample keys — the same harness rules
as cli/profile_augment.py), plus the isolated batched warp stage.

`_tiled_warp_enabled()` is read at TRACE time, so a single process can A/B
by flipping the env var between jit traces.

Reference counterpart being replaced either way:
`medseg/dataset_loader/_utils/elastic_transform.py:16-101` (the scipy
order-3 warp the fused gather/tiled paths re-implement on device).

Usage: python cli/bench_tiled_warp.py [--batch 10] [--batch 20]
Prints one JSON line per (path, stage).
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
    """Fused-scan marginal wall time (ms) of make_batch_fn(key) -> scalar."""

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


def consume(tree):
    return sum(jnp.sum(leaf.astype(jnp.float32))
               for leaf in jax.tree.leaves(tree))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=10)
    args = ap.parse_args()
    B = args.batch

    policy = aug.get_policy("ACDC_affine_elastic_intensity")
    img = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 1))
    lbl = jax.random.randint(jax.random.PRNGKey(1), (B, H, W), 0, 4)
    ys0, xs0 = aug._base_grid(CROP, CROP)

    def coords(k):
        dydx = jax.vmap(lambda kk: jnp.stack(
            aug._elastic_field(kk, CROP, CROP, policy)))(
                jax.random.split(jax.random.fold_in(k, 7), B))
        off = (H - CROP) // 2
        return ys0 + off + dydx[:, 0], xs0 + off + dydx[:, 1]

    def full_pipeline(k):
        return consume(aug.augment_batch(
            jax.random.split(k, B), img, lbl, policy, (H, W), (CROP, CROP), 4))

    def warp_stage(k):
        ys, xs = coords(k)
        return consume(aug.warp_image_and_label_batch(img, lbl, ys, xs, 4))

    results = {}
    for setting in ("1", "0"):
        os.environ["TILED_WARP"] = setting
        tag = "tiled" if setting == "1" else "gather"
        for stage, fn in (("warp_batch", warp_stage),
                          ("full_augment_batch", full_pipeline)):
            ms = marginal_ms(fn)
            results[(tag, stage)] = ms
            print(json.dumps({"path": tag, "stage": stage, "batch": B,
                              "ms_per_batch": round(ms, 2)}), flush=True)

    for stage in ("warp_batch", "full_augment_batch"):
        t, g = results[("tiled", stage)], results[("gather", stage)]
        print(json.dumps({"stage": stage, "tiled_ms": round(t, 2),
                          "gather_ms": round(g, 2),
                          "speedup_tiled_vs_gather": round(g / t, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
