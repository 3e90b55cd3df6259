"""Honest inference/serving throughput bench (real TPU).

Times the DEPLOYED prediction surfaces of the cooperative solver — the
exact graphs `eval/tester.py` and a serving endpoint would run — with the
fused-scan marginal method (the only honest timing over the tunneled
backend; see bench.py header and utils/profiling.fused_scan_marginal):

  * ``fast_predict`` argmax (n_iter=1): one FTN forward, the fast path
    (advanced_triplet_recon_segmentation_model.py:375-383 equivalent).
  * ``predict`` with STN refinement n_iter=2: the reference's test-time
    protocol (test_ACDC_triplet_segmentation.py:115-158 equivalent).

Each variant is timed at the reference eval batch (20) and at a serving
batch (160), bf16.  The scanned input is perturbed by the carried scalar
each iteration so XLA cannot hoist the forward out of the loop.

Usage: python cli/bench_inference.py [--dtype bfloat16]
Prints one JSON line per variant + writes saved/inference_bench.md.
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

from cooperative_training_and_latent_space_data_augmentation_tpu.train.cooperative import (  # noqa: E402
    CooperativeTripletSolver,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.utils.profiling import (  # noqa: E402
    fused_scan_marginal,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--batches", type=int, nargs="+", default=[20, 160])
    ap.add_argument("--k_small", type=int, default=10)
    ap.add_argument("--k_large", type=int, default=40)
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None

    solver = CooperativeTripletSolver(
        network_type="FCN_16_standard", image_ch=1, num_classes=4,
        input_hw=(192, 192), compute_dtype=dtype)
    state = solver.init_state(jax.random.PRNGKey(0))

    def scan_val(fn, images):
        """Jitted K-iteration scan; the carried scalar perturbs the input
        each iteration (sequential dependency — no loop hoisting/CSE)."""

        def make(K):
            def run():
                def body(c, _):
                    return fn(images + c) * 1e-12, None

                c, _ = lax.scan(body, jnp.float32(0), None, length=K)
                return c

            return jax.jit(run)

        return make

    results = []
    for batch in args.batches:
        images = jax.random.uniform(jax.random.PRNGKey(2),
                                    (batch, 192, 192, 1))

        def fast(x):
            pred = solver.predict(state.params, state.batch_stats, x,
                                  n_iter=1)
            return jnp.mean(jnp.argmax(pred, axis=-1).astype(jnp.float32))

        def refined(x):
            pred = solver.predict(state.params, state.batch_stats, x,
                                  n_iter=2)
            return jnp.mean(jnp.argmax(pred, axis=-1).astype(jnp.float32))

        for name, fn in (("fast_predict argmax (n_iter=1)", fast),
                         ("predict + STN refinement (n_iter=2)", refined)):
            t = fused_scan_marginal(scan_val(fn, images),
                                    k_small=args.k_small,
                                    k_large=args.k_large, reps=3)
            row = {"variant": name, "batch": batch,
                   "ms_per_batch": round(1e3 * t, 3),
                   "slices_per_sec": round(batch / t, 1)}
            results.append(row)
            print(json.dumps(row), flush=True)

    os.makedirs("saved", exist_ok=True)
    with open("saved/inference_bench.md", "w") as f:
        f.write(f"# Inference/serving throughput ({args.dtype}, "
                "fused-scan marginal, real TPU)\n\n")
        f.write("| variant | batch | ms/batch | slices/s |\n|---|---|---|---|\n")
        for r in results:
            f.write(f"| {r['variant']} | {r['batch']} | {r['ms_per_batch']} "
                    f"| {r['slices_per_sec']} |\n")
    print(json.dumps({"written": "saved/inference_bench.md"}))


if __name__ == "__main__":
    main()
