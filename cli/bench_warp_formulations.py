"""A/B alternative formulations of the order-3 warp's coefficient sampling.

The corrected augmentation profile (saved/augment_profile.md) puts 96 % of
the device pipeline in ONE op: the (4,4,C)-slice neighborhood gather of
`warp_image_and_label` (ops/augment.py:341-345), measured ~20 ms per
10-sample batch — ~18 M indices/s against a ~1 MB cache-resident
coefficient stack, i.e. gather-ISSUE-RATE bound, not bandwidth bound.
On TPU the MXU can often beat the gather unit at exactly this shape: a
4-tap separable interpolation is two dense contractions against banded
one-hot weight matrices.  Candidates (all value-checked against the
shipped gather at f32 reorder tolerance):

  gather_44     — the shipped path: one lax.gather, slice_sizes=(4,4,C).
  gather_rows   — 4 gathers of (1,4,C) slices (4x the indices, 1/4 the
                  slice): probes whether slice shape or index count is the
                  limiter.
  matmul_onehot — tmp[n,:,:] = S_y[n,:] @ big (one (N,Hp)x(Hp,Wp*C) MXU
                  matmul, S_y holds each pixel's 4 cubic y-weights at its
                  4 tap rows), then out[n,c] = sum_x S_x[n,x] tmp[n,x,c]
                  (VPU weighted reduce).  ~19 GFLOP + a 148 MB intermediate
                  per sample vs 370 k gather indices.
  matmul_bf16   — same with the big matmul in bf16 (values diverge at
                  ~1e-2 — reported for the speed ceiling, NOT eligible as
                  a drop-in for the scipy-parity pipeline).

Timing: fused-scan marginal (K=40 vs 10, value-forced), per-sample keys,
realistic SMOOTH coords (the pipeline's own elastic field — random jitter
coords degrade the gather ~3x and are not representative, RESULTS.md).

Usage: python cli/bench_warp_formulations.py [--batch 10]
Prints one JSON line per formulation.
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
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from cooperative_training_and_latent_space_data_augmentation_tpu.ops import (  # noqa: E402
    augment as aug,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.ops.spline import (  # noqa: E402
    _bspline_weights,
    spline_coefficients,
)

H = W = 224
CROP = 192
PAD = 12


def build_big(img_hwc, label_hw, num_classes: int):
    """The fused warp's padded coefficient stack (ops/augment.py:320-329)."""
    onehot = jax.nn.one_hot(label_hw, num_classes, dtype=jnp.float32)[..., 1:]
    lbl_ext = jnp.pad(onehot, ((PAD, PAD), (PAD, PAD), (0, 0)), mode="edge")
    lbl_cfp = jnp.pad(spline_coefficients(lbl_ext, "mirror"),
                      ((2, 2), (2, 2), (0, 0)), mode="reflect")
    img_cfp = jnp.pad(spline_coefficients(img_hwc, "reflect"),
                      ((2, 2), (2, 2), (0, 0)), mode="symmetric")
    img_big = jnp.pad(img_cfp, ((PAD, PAD), (PAD, PAD), (0, 0)))
    return jnp.concatenate([img_big.astype(jnp.float32), lbl_cfp], axis=-1)


def tap_data(ys, xs):
    """Shared index/weight prep (one sample): returns (y0, x0, wy, wx) with
    y0/x0 the PADDED-frame slice starts and wy/wx (N, 4) cubic weights."""
    hl, wl = H + 2 * PAD, W + 2 * PAD
    yl = jnp.clip(ys + PAD, 0.0, hl - 1.0)
    xl = jnp.clip(xs + PAD, 0.0, wl - 1.0)
    y0 = jnp.floor(yl)
    x0 = jnp.floor(xl)
    wy = jnp.stack(_bspline_weights(yl - y0), axis=-1).reshape(-1, 4)
    wx = jnp.stack(_bspline_weights(xl - x0), axis=-1).reshape(-1, 4)
    return (y0.astype(jnp.int32).reshape(-1) + 1,
            x0.astype(jnp.int32).reshape(-1) + 1, wy, wx)


def sample_gather_44(big, ys, xs):
    """The shipped formulation (ops/augment.py:338-345)."""
    y0, x0, wy, wx = tap_data(ys, xs)
    c = big.shape[-1]
    dn = lax.GatherDimensionNumbers(offset_dims=(1, 2, 3),
                                    collapsed_slice_dims=(),
                                    start_index_map=(0, 1))
    g = lax.gather(big, jnp.stack([y0, x0], axis=-1), dn,
                   slice_sizes=(4, 4, c))
    return jnp.einsum("nabc,na,nb->nc", g, wy, wx).reshape(ys.shape + (c,))


def sample_gather_rows(big, ys, xs):
    """4 gathers of (1,4,C) row slices: same taps, 4x indices."""
    y0, x0, wy, wx = tap_data(ys, xs)
    c = big.shape[-1]
    dn = lax.GatherDimensionNumbers(offset_dims=(1, 2, 3),
                                    collapsed_slice_dims=(),
                                    start_index_map=(0, 1))
    out = 0.0
    for a in range(4):
        g = lax.gather(big, jnp.stack([y0 + a, x0], axis=-1), dn,
                       slice_sizes=(1, 4, c))                 # (N, 1, 4, C)
        out = out + wy[:, a, None] * jnp.einsum("nbc,nb->nc", g[:, 0], wx)
    return out.reshape(ys.shape + (c,))


def sample_matmul(big, ys, xs, mat_dtype=jnp.float32):
    """Banded one-hot matmul: y-interp on the MXU, x-interp on the VPU."""
    y0, x0, wy, wx = tap_data(ys, xs)
    hp, wp, c = big.shape
    n = y0.shape[0]
    # S_y (N, Hp): row n holds wy[n, a] at column y0[n]+a
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, hp), 1)
    s_y = jnp.zeros((n, hp), jnp.float32)
    for a in range(4):
        s_y = s_y + jnp.where(cols == (y0 + a)[:, None], wy[:, a:a + 1], 0.0)
    tmp = jax.lax.dot(s_y.astype(mat_dtype),
                      big.reshape(hp, wp * c).astype(mat_dtype),
                      precision=lax.Precision.DEFAULT,
                      preferred_element_type=jnp.float32)     # (N, Wp*C)
    tmp = tmp.reshape(n, wp, c)
    # S_x (N, Wp) applied as a weighted reduce over x
    colsx = jax.lax.broadcasted_iota(jnp.int32, (n, wp), 1)
    s_x = jnp.zeros((n, wp), jnp.float32)
    for b in range(4):
        s_x = s_x + jnp.where(colsx == (x0 + b)[:, None], wx[:, b:b + 1], 0.0)
    out = jnp.einsum("nxc,nx->nc", tmp, s_x)
    return out.reshape(ys.shape + (c,))


def smooth_coords(k, b, policy):
    dydx = jax.vmap(lambda kk: jnp.stack(
        aug._elastic_field(kk, CROP, CROP, policy)))(jax.random.split(k, b))
    ys0, xs0 = aug._base_grid(CROP, CROP)
    off = (H - CROP) // 2
    return ys0 + off + dydx[:, 0], xs0 + off + dydx[:, 1]


def marginal_ms(fn, reps: int = 3):
    def multi(key, K):
        def step(carry, kk):
            return carry + fn(kk), None

        out, _ = lax.scan(step, jnp.float32(0), jax.random.split(key, K))
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
    ap.add_argument("--checks_only", action="store_true",
                    help="value equivalence only (CPU-friendly)")
    args = ap.parse_args()
    B = args.batch
    policy = aug.get_policy("ACDC_affine_elastic_intensity")

    img = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 1))
    lbl = jax.random.randint(jax.random.PRNGKey(1), (B, H, W), 0, 4)
    bigs = jax.jit(jax.vmap(lambda i, l: build_big(i, l, 4)))(img, lbl)

    # --- value equivalence (realistic coords, f32) ---
    ys, xs = jax.jit(lambda k: smooth_coords(k, B, policy))(
        jax.random.PRNGKey(3))
    ref = jax.jit(jax.vmap(sample_gather_44))(bigs, ys, xs)
    for name, fn in [("gather_rows", sample_gather_rows),
                     ("matmul_onehot", sample_matmul)]:
        got = jax.jit(jax.vmap(fn))(bigs, ys, xs)
        err = float(jnp.max(jnp.abs(got - ref)))
        print(json.dumps({"check": name, "max_abs_err": err}), flush=True)
        assert err < 1e-4, (name, err)
    if args.checks_only:
        return

    # --- fused-scan marginals (fresh smooth coords per step) ---
    def staged(sample_fn, **kw):
        def run(kk):
            ys, xs = smooth_coords(kk, B, policy)
            out = jax.vmap(lambda bg, y, x: sample_fn(bg, y, x, **kw))(
                bigs, ys, xs)
            return jnp.sum(out)

        return run

    for name, fn, kw in [
        ("gather_44 (shipped)", sample_gather_44, {}),
        ("gather_rows (1x4xC slices)", sample_gather_rows, {}),
        ("matmul_onehot f32", sample_matmul, {}),
        ("matmul_onehot bf16 (values ~1e-2 off)", sample_matmul,
         {"mat_dtype": jnp.bfloat16}),
    ]:
        ms = marginal_ms(staged(fn, **kw))
        print(json.dumps({"formulation": name,
                          "ms_per_batch": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
