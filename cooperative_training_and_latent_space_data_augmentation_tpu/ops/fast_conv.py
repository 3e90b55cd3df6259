"""MXU-saturating small-channel 3x3 convolutions ("staircase" packing).

The cooperative network (the conv stack of
``medseg/models/ebm/encoder_decoder.py:19-348``, re-designed in
``models/blocks.py``) is wall-to-wall 16-64-channel convolutions.  XLA-TPU
lowers a CxC conv as per-tap matmuls with contraction K=C and output width
N=C, so a 16-channel conv uses (16/128)^2 = 1/64 of the MXU systolic array
— measured 3.5 TFLOP/s against a 193 TFLOP/s matmul peak (RESULTS.md).

This module reformulates the stride-1 SAME 3x3 conv so the MXU runs full
128-lane matmuls regardless of the channel count:

  1. **Pack width**: reshape (N, H, W, C) -> (N, H, W/f, f*C) with
     f = 128/C.  A pure reshape — NHWC is W-major over C, so f adjacent
     pixels' channels are already contiguous.
  2. **Staircase weights**: the horizontal taps (kj) connect packed slot
     s to slot s' = s + kj - 1, i.e. a block-tridiagonal ("staircase")
     (f*C_in, f*C_out) matrix per vertical tap ki.  The conv becomes a
     (3, 1) convolution over (H, W/f) with f*C_in -> f*C_out channels —
     full MXU utilization; XLA lowers it as three K=N=128 matmuls.
  3. **Boundary corrections**: the two staircase overflows (slot 0 needs
     kj=0 from the LEFT neighbor's last slot; slot f-1 needs kj=2 from the
     RIGHT neighbor's first slot) are a skinny (3, 1) conv over shifted
     slot-extracts, scatter-added into the packed output.

Dense-MXU overhead is f^2/(3f-2) (2.9x for 16 ch) against a ~55x
utilization gain — a ~15-20x net speedup ceiling for the 16-channel
stages.  Everything is plain jax.numpy / lax.conv, so jax.grad
differentiates it and the transposed matmuls in the backward are full-width
too (the wgrad of the packed conv is a (M x 128)^T @ (M x 128) product).

MEASURED OUTCOME (v5e, bench.py end-to-end A/B, batch 20 bf16): the packed
path is 253.4 ms/step vs 182.7 ms stock — a 39 % LOSS despite the cost
model.  The width-packing relayouts (lane-crossing reshapes) and boundary
scatter-adds cost more than the recovered MXU lanes.  Default is therefore
OFF (see :func:`fast_conv_enabled`); this module remains as an opt-in
measurement vehicle and a documented negative result.

Verified element-exact (to accumulation tolerance) against
``lax.conv_general_dilated`` in tests/test_fast_conv.py.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn
from jax import lax


def _padded(v: int, tile: int = 128) -> int:
    return max(1, -(-v // tile)) * tile


@functools.lru_cache(maxsize=None)
def pick_pack_factor(width: int, cin: int, cout: int,
                     max_f: int = 16) -> int:
    """Pick the packing factor minimizing padded MXU work per pixel.

    Stock XLA cost model: per-tap matmuls at K=cin, N=cout padded to the
    128x128 array -> 9 * 128^2 per pixel whatever the channel count.
    Staircase cost: 3 * Kpad * Npad / f per pixel.  Returns 1 when packing
    would not win (>= 128 channels, or no dividing factor helps).
    """
    stock = 9.0 * _padded(cin) * _padded(cout)
    best_f, best_cost = 1, stock
    for f in range(2, max_f + 1):
        if width % f:
            continue
        main = 3.0 * _padded(f * cin) * _padded(f * cout) / f
        corr = 3.0 * _padded(2 * cin) * _padded(2 * cout) / f
        if main + corr < best_cost:
            best_f, best_cost = f, main + corr
    return best_f


def _staircase_matrix(w: jnp.ndarray, f: int) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> (3, 1, f*Cin, f*Cout) block-staircase kernel."""
    cin, cout = w.shape[2], w.shape[3]
    blocks = []
    for sp in range(f):          # input slot (row blocks)
        row = []
        for s in range(f):       # output slot (column blocks)
            kj = sp - s + 1
            if 0 <= kj <= 2:
                row.append(w[:, kj])                      # (3, Cin, Cout)
            else:
                row.append(jnp.zeros((3, cin, cout), w.dtype))
        blocks.append(jnp.concatenate(row, axis=-1))      # (3, Cin, f*Cout)
    m = jnp.concatenate(blocks, axis=-2)                  # (3, f*Cin, f*Cout)
    return m[:, None]                                     # (3, 1, ...)


def _correction_matrix(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> (3, 1, 2*Cin, 2*Cout) block-diag of the two
    staircase overflow taps: [left-neighbor kj=0 -> slot 0 | right-neighbor
    kj=2 -> slot f-1]."""
    cin, cout = w.shape[2], w.shape[3]
    z = jnp.zeros((3, cin, cout), w.dtype)
    top = jnp.concatenate([w[:, 0], z], axis=-1)
    bot = jnp.concatenate([z, w[:, 2]], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)[:, None]


def _conv31(x: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """(3,1)-window SAME conv over (H, Wp) — XLA lowers to K=N=full matmuls.

    No ``preferred_element_type``: matches stock ``nn.Conv`` lowering (the
    MXU still accumulates bf16 inputs in f32 internally), and jax's conv
    transpose rule rejects the f32-output/bf16-weight mix under grad.
    """
    return lax.conv_general_dilated(
        x, m, window_strides=(1, 1), padding=((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def staircase_conv3x3(x: jnp.ndarray, w: jnp.ndarray,
                      f: Optional[int] = None) -> jnp.ndarray:
    """Stride-1 SAME 3x3 conv via width-packed staircase matmuls.

    Args:
      x: (N, H, W, Cin); W must be divisible by the packing factor.
      w: (3, 3, Cin, Cout) HWIO kernel.
      f: packing factor (slots per packed column); default auto-picked.

    Returns (N, H, W, Cout) in x.dtype (f32 MXU accumulation).
    """
    n, h, width, cin = x.shape
    cout = w.shape[-1]
    if f is None:
        f = pick_pack_factor(width, cin, cout)
    if f <= 1:
        return lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert width % f == 0, (width, f)
    wp = width // f
    xp = x.reshape(n, h, wp, f * cin)

    out = _conv31(xp, _staircase_matrix(w, f))            # (N,H,Wp,f*Cout) f32

    # boundary corrections: LEFT neighbor's last slot feeds output slot 0
    # (kj=0); RIGHT neighbor's first slot feeds output slot f-1 (kj=2).
    zeros = jnp.zeros((n, h, 1, cin), x.dtype)
    left = jnp.concatenate([zeros, xp[:, :, :-1, (f - 1) * cin:]], axis=2)
    right = jnp.concatenate([xp[:, :, 1:, :cin], zeros], axis=2)
    corr = _conv31(jnp.concatenate([left, right], axis=-1),
                   _correction_matrix(w))                 # (N,H,Wp,2*Cout)
    out = out.at[..., :cout].add(corr[..., :cout])
    out = out.at[..., (f - 1) * cout:].add(corr[..., cout:])
    return out.reshape(n, h, width, cout).astype(x.dtype)


def fast_conv_enabled() -> bool:
    """Global A/B switch (trace-time), default OFF.

    Measured end-to-end on the v5e (bench.py, batch 20 bf16): staircase
    253.4 ms/step vs stock 182.7 ms — the packed reformulation LOSES 39 %
    despite the dense-MXU cost model predicting a multi-x win; the
    width-packing relayouts and boundary scatter-adds cost more than the
    extra MXU lanes recover (same verdict as round 2's 9-shifted-matmul
    attempt, RESULTS.md).  Kept as an opt-in (FAST_CONV=1) measurement
    vehicle; the production path is stock XLA convs."""
    return os.environ.get("FAST_CONV", "0") == "1"


class Conv(nn.Conv):
    """``nn.Conv`` drop-in whose stride-1 SAME 3x3 instances run the
    staircase-packed formulation when it wins on the MXU.

    Deliberately NAMED ``Conv`` so flax auto-naming keeps the parameter tree
    byte-identical to ``nn.Conv`` ("Conv_0/kernel", ...): checkpoints,
    weight-transplant parity tests, and the torch converters are unaffected
    by toggling the fast path.  Numerics match stock to f32-accumulation
    reorder tolerance (tests/test_fast_conv.py).
    """

    @nn.compact
    def __call__(self, x):
        strides = self.strides or 1
        strides = ((strides, strides) if isinstance(strides, int)
                   else tuple(strides))
        ks = self.kernel_size
        ks = (ks, ks) if isinstance(ks, int) else tuple(ks)
        eligible = (
            fast_conv_enabled()
            and x.ndim == 4
            and ks == (3, 3)
            and strides == (1, 1)
            and self.padding in ("SAME", ((1, 1), (1, 1)))
            and self.feature_group_count == 1
            and self.kernel_dilation in (1, (1, 1), None)
            and self.input_dilation in (1, (1, 1), None)
        )
        if eligible:
            f = pick_pack_factor(x.shape[2], x.shape[-1], self.features)
            eligible = f > 1
        if not eligible:
            return super().__call__(x)
        kernel = self.param(
            "kernel", self.kernel_init,
            (3, 3, x.shape[-1], self.features), self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype)
        y = staircase_conv3x3(x, kernel, f=f)
        if bias is not None:
            y = y + bias
        return y
