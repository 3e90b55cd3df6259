"""Knock-out decomposition of the cooperative train step (real TPU).

Round-4 finding: the 128-channel stages run at 93-172 TFLOP/s under stock
XLA in isolation (cli/bench_nl_conv.py), so the 86 ms step is NOT bound by
the remaining stock convs.  This profiler locates the time by timing step
VARIANTS and primitive sub-graphs with the fused-scan marginal method (the
only honest timing over the tunneled backend):

  * full cooperative step (latent_DA on) — the bench.py headline
  * standard-only step (latent_DA off)
  * forward-only loss graphs (no backward/update) for both
  * the individual forward passes: FTN fast_predict, image decode,
    STN recon pass, hard-example generation (grad-through-decoder masking)
  * optimizer update alone (grads precomputed)

Usage: python cli/profile_step_knockout.py [--batch 20] [--dtype bfloat16]
Writes one JSON line per variant + saved/step_knockout.md.
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

from cooperative_training_and_latent_space_data_augmentation_tpu.config import (  # noqa: E402
    LatentDAConfig,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.train.cooperative import (  # noqa: E402
    CooperativeTripletSolver,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.utils.profiling import (  # noqa: E402
    fused_scan_marginal,
)


def _timed(name, make_fn, k_small, k_large, results):
    try:
        t = fused_scan_marginal(make_fn, k_small=k_small, k_large=k_large,
                                reps=3)
        row = {"variant": name, "ms": round(1e3 * t, 3)}
    except Exception as e:  # report per-variant failures, keep going
        row = {"variant": name, "error": repr(e)[:200]}
    results.append(row)
    print(json.dumps(row), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--k_small", type=int, default=10)
    ap.add_argument("--k_large", type=int, default=40)
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None

    solver = CooperativeTripletSolver(
        network_type="FCN_16_standard", image_ch=1, num_classes=4,
        input_hw=(192, 192), compute_dtype=dtype)
    state = solver.init_state(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(2),
                                (args.batch, 192, 192, 1))
    labels = jax.random.randint(jax.random.PRNGKey(3),
                                (args.batch, 192, 192), 0, 4).astype(jnp.int32)
    data = {"image": images, "label": labels}

    def scan_step(step_body):
        """K-step scan of a (state, batch, key)->(state, metrics) step."""

        def make(K):
            def run():
                def body(carry, k):
                    st, _ = carry
                    st, m = step_body(st, data, k)
                    return (st, m["loss/standard/total"]), None

                keys = jax.random.split(jax.random.PRNGKey(1), K)
                (_, last), _ = lax.scan(body, (state, jnp.float32(0)), keys)
                return last

            return jax.jit(run)

        return make

    def scan_val(fn):
        """K-step serialized scan of a scalar-valued fn(carry_scalar)."""

        def make(K):
            def run():
                def body(c, _):
                    return fn(c) * 1e-12, None

                c, _ = lax.scan(body, jnp.float32(0), None, length=K)
                return c

            return jax.jit(run)

        return make

    results = []
    kw = dict(k_small=args.k_small, k_large=args.k_large, results=results)

    # ---- full step variants
    full = solver.make_train_step(latent_da=LatentDAConfig(), donate=False)
    std = solver.make_train_step(latent_da=None, donate=False)
    _timed("full_step (latent_DA on)", scan_step(full.__wrapped__), **kw)
    _timed("standard_step (latent_DA off)", scan_step(std.__wrapped__), **kw)

    # ---- forward-only losses (no backward, no update)
    def fwd_std(c):
        x = images + c
        losses, _, _ = solver.standard_training(
            state.params, state.batch_stats, images, labels,
            perturbed_image=x, update_stats=True, rngs=None)
        return losses["seg"] + losses["image"] + losses["gt_shape"] + losses["shape"]

    _timed("fwd standard losses (4 fwd passes)", scan_val(fwd_std), **kw)

    # ---- individual forward passes
    def fwd_ftn(c):
        (z_i, z_s), y0, _ = solver.fast_predict(
            state.params, state.batch_stats, images + c, train=True)
        return jnp.mean(y0.astype(jnp.float32))

    _timed("fwd FTN fast_predict (enc + seg dec)", scan_val(fwd_ftn), **kw)

    z_i0, z_s0 = solver.fast_predict(state.params, state.batch_stats,
                                     images, train=False)[0]

    def fwd_imgdec(c):
        out, _ = solver.decode_image(state.params, state.batch_stats,
                                     z_i0 + c, train=True)
        return jnp.mean(out.astype(jnp.float32))

    _timed("fwd image decoder", scan_val(fwd_imgdec), **kw)

    def fwd_stn(c):
        out, _ = solver.recon_shape(state.params, state.batch_stats,
                                    labels, is_label_map=True, train=True)
        return jnp.mean(out.astype(jnp.float32)) + c * 0

    _timed("fwd one STN pass (shape enc+dec)", scan_val(fwd_stn), **kw)

    # ---- hard-example generation alone (grad-through-decoder masking)
    da = LatentDAConfig()

    def gen(c):
        key = jax.random.fold_in(jax.random.PRNGKey(7),
                                 (c * 1e12).astype(jnp.int32))
        p_img, p_seg = solver.hard_example_generation(
            state.params, state.batch_stats, z_i0 + c, z_s0, images, labels,
            key, latent_da=da)
        return (jnp.mean(p_img.astype(jnp.float32))
                + jnp.mean(p_seg.astype(jnp.float32)))

    _timed("hard_example_generation (2x grad-through-decoder + decode)",
           scan_val(gen), **kw)

    # ---- backward+update alone: grad of the standard losses + optax apply
    def step_no_hard_no_update(c):
        def loss_fn(params):
            losses, _, _ = solver.standard_training(
                params, state.batch_stats, images, labels,
                perturbed_image=images + c, update_stats=True, rngs=None)
            return (losses["seg"] + losses["image"] + losses["gt_shape"]
                    + losses["shape"])

        g = jax.grad(loss_fn)(state.params)
        return sum(jnp.sum(x.astype(jnp.float32) ** 2)
                   for x in jax.tree_util.tree_leaves(g)) * 1e-20

    _timed("fwd+bwd standard losses (grad, no optimizer)",
           scan_val(step_no_hard_no_update), **kw)

    with open("saved/step_knockout.md", "w") as f:
        f.write("# Cooperative step knock-out profile "
                f"(batch {args.batch}, {args.dtype})\n\n")
        f.write("| variant | ms |\n|---|---|\n")
        for r in results:
            f.write(f"| {r['variant']} | {r.get('ms', r.get('error'))} |\n")
    print(json.dumps({"written": "saved/step_knockout.md"}))


if __name__ == "__main__":
    main()
