"""Per-layer TPU profile of the FCN_16_standard cooperative step (VERDICT r2 #1).

Times every unique convolution of the cooperative network (the conv stack of
``medseg/models/ebm/encoder_decoder.py:19-348``, re-designed in
``models/{blocks,encoder_decoder}.py``) plus each fused residual core, with
the fused-scan marginal method (the only honest timing on the tunneled
backend — see RESULTS.md MEASUREMENT CORRECTION), and reconstructs the full
step from per-layer costs x per-step multiplicities.

Output: a markdown table (layer, shape, ms fwd, ms bwd, TFLOP/s, % of step)
written to ``saved/layer_profile.md`` + one JSON line per layer to
``saved/layer_profile.jsonl``.  This is the evidence for where the
2.7 %-MFU wall actually sits, layer by layer.

Usage:
    python cli/profile_layers.py                  # bf16, batch 20 (defaults)
    python cli/profile_layers.py --batch 80 --dtype float32
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

from cooperative_training_and_latent_space_data_augmentation_tpu.utils.profiling import (
    fused_scan_marginal,
    serialize_scan,
)

# ----------------------------------------------------------------------------
# The FCN_16_standard conv inventory (feature_reduce=4, 192x192 input).
#
# Columns: name, H (=W), Cin, Cout, kernel, stride.
# Per-step multiplicities (fwd / dgrad / wgrad applications of each network,
# one fused cooperative iteration, latent_DA on, separate_training=False):
#
#   network        fwd dgrad wgrad   where
#   FTN encoder     2    2     2     std(noised) + hard(perturbed img); both in loss
#   code decoupler  2    2     2     rides the encoder
#   seg decoder     4    3     2     std, gen-saliency fwd, gen decode, hard;
#                                    bwd: std, hard (loss) + gen (input-grad only)
#   image decoder   4    3     2     same structure as seg decoder
#   STN encoder     4    4     4     gt-recon, pred-recon, hard-pred, perturbed-seg
#   STN decoder     4    4     4     rides the STN encoder
#
# dgrad ~= wgrad ~= fwd in FLOPs for a conv layer, so est. step cost per
# layer = t_fwd*(n_fwd + n_dgrad) + (t_bwd_full - 2*t_fwd)*... -- we measure
# t_fwd and t_fullbwd (fwd+dgrad+wgrad) directly and reconstruct:
#   cost = n_wgrad * t_fullbwd + (n_fwd - n_wgrad) * t_fwd
#          + (n_dgrad - n_wgrad) * (t_fullbwd - t_fwd) / 2
# (approximating dgrad-only cost as half of the bwd surcharge).
# ----------------------------------------------------------------------------

ENCODER = [
    ("enc.inc.conv1",   192,   1,  16, 3, 1),
    ("enc.inc.conv2",   192,  16,  16, 3, 1),
    ("enc.d1.stride",   192,  16,  16, 3, 2),
    ("enc.d1.shortcut",  96,  16,  32, 1, 1),
    ("enc.d1.conv1",     96,  16,  32, 3, 1),
    ("enc.d1.conv2",     96,  32,  32, 3, 1),
    ("enc.d2.stride",    96,  32,  32, 3, 2),
    ("enc.d2.shortcut",  48,  32,  64, 1, 1),
    ("enc.d2.conv1",     48,  32,  64, 3, 1),
    ("enc.d2.conv2",     48,  64,  64, 3, 1),
    ("enc.d3.stride",    48,  64,  64, 3, 2),
    ("enc.d3.shortcut",  24,  64, 128, 1, 1),
    ("enc.d3.conv1",     24,  64, 128, 3, 1),
    ("enc.d3.conv2",     24, 128, 128, 3, 1),
    ("enc.d4.stride",    24, 128, 128, 3, 2),
    ("enc.d4.shortcut",  12, 128, 128, 1, 1),
    ("enc.d4.conv1",     12, 128, 128, 3, 1),
    ("enc.d4.conv2",     12, 128, 128, 3, 1),
    ("enc.latent1x1",    12, 128, 128, 1, 1),
]
DECOUPLER = [
    ("dcp.conv1", 12, 128, 128, 3, 1),
    ("dcp.conv2", 12, 128, 128, 3, 1),
]
# NN-upsample decoder (seg/shape); the image decoder (Conv2) adds transposed
# convs whose cost we time as equivalent k2s2 ConvTranspose entries.
DECODER = [
    ("dec.u1.shortcut",  24, 128,  64, 1, 1),
    ("dec.u1.conv1",     24, 128,  64, 3, 1),
    ("dec.u1.conv2",     24,  64,  64, 3, 1),
    ("dec.u2.shortcut",  48,  64,  32, 1, 1),
    ("dec.u2.conv1",     48,  64,  32, 3, 1),
    ("dec.u2.conv2",     48,  32,  32, 3, 1),
    ("dec.u3.shortcut",  96,  32,  16, 1, 1),
    ("dec.u3.conv1",     96,  32,  16, 3, 1),
    ("dec.u3.conv2",     96,  16,  16, 3, 1),
    ("dec.u4.shortcut", 192,  16,  16, 1, 1),
    ("dec.u4.conv1",    192,  16,  16, 3, 1),
    ("dec.u4.conv2",    192,  16,  16, 3, 1),
    ("dec.head1x1",     192,  16,   4, 1, 1),
]

# (layers, n_fwd, n_dgrad, n_wgrad)
NETWORKS = [
    (ENCODER,   2, 2, 2),
    (DECOUPLER, 2, 2, 2),
    (DECODER,   4, 3, 2),   # seg decoder
    (DECODER,   4, 3, 2),   # image decoder (transposed-conv ups timed below)
    (ENCODER,   4, 4, 4),   # STN encoder (input ch 4 not 1: negligible delta)
    (DECODER,   4, 4, 4),   # STN decoder
]


def conv_fn(w, stride):
    pad = ((1, 1), (1, 1)) if w.shape[0] == 3 else ((0, 0), (0, 0))
    return lambda x: lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def time_conv(batch, h, cin, cout, k, stride, dtype):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, h, h, cin), dtype)
    w = jax.random.normal(key, (k, k, cin, cout), dtype) * 0.05
    f = conv_fn(w, stride)

    t_fwd = fused_scan_marginal(
        lambda K: serialize_scan(lambda c: f(x + c.astype(dtype)), K))

    def loss(x_, w_):
        return jnp.mean(conv_fn(w_, stride)(x_).astype(jnp.float32))

    grad = jax.value_and_grad(loss, argnums=(0, 1))

    def bwd_op(c):
        v, (gx, gw) = grad(x + c.astype(dtype), w)
        return v + jnp.mean(gx.astype(jnp.float32)) + jnp.mean(
            gw.astype(jnp.float32))

    t_bwd = fused_scan_marginal(
        lambda K: serialize_scan(lambda c: bwd_op(c)[None], K))

    out_h = h // stride
    flops = 2.0 * batch * out_h * out_h * k * k * cin * cout
    return t_fwd, t_bwd, flops


def time_rescore(batch, h, cin, cout, dtype):
    """Fused residual core (models/blocks.py _ResCore) fwd and fwd+bwd —
    what XLA achieves with its own conv+BN+act fusions; the bar any Pallas
    fused block must beat."""
    from cooperative_training_and_latent_space_data_augmentation_tpu.models.blocks import (
        _ResCore,
    )

    core = _ResCore(features=cout, dtype=dtype)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, h, h, cin), dtype)
    variables = core.init(key, x, train=True)
    params, stats = variables["params"], variables["batch_stats"]

    def fwd(p, x_):
        y, _ = core.apply({"params": p, "batch_stats": stats}, x_, train=True,
                          mutable=["batch_stats"])
        return y

    t_fwd = fused_scan_marginal(
        lambda K: serialize_scan(lambda c: fwd(params, x + c.astype(dtype)), K))

    def loss(p, x_):
        return jnp.mean(fwd(p, x_).astype(jnp.float32))

    grad = jax.value_and_grad(loss, argnums=(0, 1))

    def bwd_op(c):
        v, (gp, gx) = grad(params, x + c.astype(dtype))
        leaves = sum(jnp.mean(g.astype(jnp.float32)) for g in jax.tree.leaves(gp))
        return (v + leaves + jnp.mean(gx.astype(jnp.float32)))[None]

    t_bwd = fused_scan_marginal(lambda K: serialize_scan(bwd_op, K))
    flops = 2.0 * batch * h * h * (9 * cin * cout + 9 * cout * cout + cin * cout)
    return t_fwd, t_bwd, flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--out_dir", default="saved")
    ap.add_argument("--skip_rescore", action="store_true")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    batch = args.batch

    os.makedirs(args.out_dir, exist_ok=True)
    jsonl = open(os.path.join(args.out_dir, "layer_profile.jsonl"), "w")

    # unique conv shapes -> timing (dedupe across networks)
    uniq = {}
    for layers, *_ in NETWORKS:
        for name, h, cin, cout, k, stride in layers:
            uniq[(h, cin, cout, k, stride)] = name
    rows = []
    for (h, cin, cout, k, stride), name in sorted(
            uniq.items(), key=lambda kv: -kv[0][0]):
        t_fwd, t_bwd, flops = time_conv(batch, h, cin, cout, k, stride, dtype)
        rec = {"layer": name, "H": h, "Cin": cin, "Cout": cout, "k": k,
               "stride": stride,
               "fwd_ms": round(1e3 * t_fwd, 3),
               "fwdbwd_ms": round(1e3 * t_bwd, 3),
               "fwd_tflops": round(flops / t_fwd / 1e12, 2),
               "fwdbwd_tflops": round(3 * flops / t_bwd / 1e12, 2)}
        rows.append(((h, cin, cout, k, stride), rec, t_fwd, t_bwd, flops))
        print(json.dumps(rec), flush=True)
        jsonl.write(json.dumps(rec) + "\n")
        jsonl.flush()

    # reconstruct the step from multiplicities
    per_layer_cost = {}
    total = 0.0
    for layers, n_fwd, n_dgrad, n_wgrad in NETWORKS:
        for name, h, cin, cout, k, stride in layers:
            keyed = (h, cin, cout, k, stride)
            _, rec, t_fwd, t_bwd, flops = next(r for r in rows if r[0] == keyed)
            surcharge = max(t_bwd - t_fwd, 0.0)
            cost = (n_wgrad * t_bwd + (n_fwd - n_wgrad) * t_fwd
                    + (n_dgrad - n_wgrad) * surcharge / 2.0)
            per_layer_cost[name] = per_layer_cost.get(name, 0.0) + cost
            total += cost

    # fused residual cores per stage (XLA's fusion bar)
    core_rows = []
    if not args.skip_rescore:
        for h, cin, cout in [(192, 16, 16), (96, 16, 32), (48, 32, 64),
                             (24, 64, 128), (12, 128, 128)]:
            t_fwd, t_bwd, flops = time_rescore(batch, h, cin, cout, dtype)
            rec = {"rescore": f"{h}x{h} {cin}->{cout}",
                   "fwd_ms": round(1e3 * t_fwd, 3),
                   "fwdbwd_ms": round(1e3 * t_bwd, 3),
                   "fwd_tflops": round(flops / t_fwd / 1e12, 2)}
            core_rows.append(rec)
            print(json.dumps(rec), flush=True)
            jsonl.write(json.dumps(rec) + "\n")
            jsonl.flush()
    jsonl.close()

    with open(os.path.join(args.out_dir, "layer_profile.md"), "w") as f:
        f.write(f"# Per-layer profile (batch {batch}, {args.dtype}, "
                f"{jax.default_backend()})\n\n")
        f.write("Fused-scan marginal timings of each unique conv; step cost "
                "reconstructed\nfrom per-network multiplicities "
                "(see cli/profile_layers.py header).\n\n")
        f.write("| layer | shape | fwd ms | fwd+bwd ms | fwd TFLOP/s | "
                "fwd+bwd TFLOP/s | % of reconstructed step |\n|---|---|---|"
                "---|---|---|---|\n")
        for keyed, rec, *_ in rows:
            h, cin, cout, k, stride = keyed
            pct = 100.0 * per_layer_cost.get(rec["layer"], 0.0) / total
            f.write(f"| {rec['layer']} | {h}^2 {cin}->{cout} k{k}s{stride} | "
                    f"{rec['fwd_ms']} | {rec['fwdbwd_ms']} | "
                    f"{rec['fwd_tflops']} | {rec['fwdbwd_tflops']} | "
                    f"{pct:.1f} |\n")
        f.write(f"\nReconstructed step total: {1e3 * total:.1f} ms\n")
        if core_rows:
            f.write("\n## Fused residual cores (XLA fusion bar)\n\n"
                    "| stage | fwd ms | fwd+bwd ms | fwd TFLOP/s |\n"
                    "|---|---|---|---|\n")
            for rec in core_rows:
                f.write(f"| {rec['rescore']} | {rec['fwd_ms']} | "
                        f"{rec['fwdbwd_ms']} | {rec['fwd_tflops']} |\n")
    print(json.dumps({"reconstructed_step_ms": round(1e3 * total, 1),
                      "batch": batch, "dtype": args.dtype}))


if __name__ == "__main__":
    main()
