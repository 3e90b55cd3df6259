"""Pallas TPU conv kernels for small-channel 3x3 stages (CHW-lanes layout).

The cooperative network (conv stack of
``medseg/models/ebm/encoder_decoder.py:19-348``, re-designed in
``models/{blocks,encoder_decoder}.py``) is wall-to-wall 16-64-channel
convolutions, which XLA-TPU lowers with the channel count on the MXU
lane/contraction dimensions — 16/128 lanes used, measured 2-20 % MFU
(RESULTS.md).  Two graph-level reformulations (9-shifted-matmul in round 2,
width-staircase packing in round 3) both LOST end-to-end to relayout taxes
at XLA op boundaries.

This module moves the packing INSIDE a Pallas kernel where the layout is
pinned:

  * Activations live as ``(C, H*W)`` — channels on sublanes, PIXELS on
    lanes.  A pixel shift by one (or one row) is a lane roll in VMEM.
  * The 3x3 conv becomes ONE matmul per image:
    ``out(C_out, H*W) = W_all(C_out, 9*C_in) @ P(9*C_in, H*W)``
    where P stacks the 9 tap-shifted copies of the input on sublanes.
    K = 9*C_in (144 for 16 ch) and N = H*W (thousands) both fill the MXU;
    the only FLOP overhead vs. the true conv is K padding to the systolic
    array (144 -> 2 K-passes ~= 56 % fill).
  * SAME zero-padding is enforced by masking the tap copies at image/row
    edges (pure VPU selects on lane-index iotas) — no padded buffers.

VMEM budget: P is ``9 * C_in * H*W`` elements — at most ~10.6 MB bf16
(16 ch @ 192^2), comfortably VMEM-resident, so each image is one matmul.
Lane rolls happen in f32 (Mosaic's ``dynamic_rotate`` has no sub-32-bit
path) and the tap copies are cast back to the input dtype before the MXU.

Forward-only here; ``fused_res_core`` (conv-BN-LReLU-conv-BN-add fusion)
and the custom VJP build on these primitives.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def weights_to_wall(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C_in, C_out) HWIO -> (C_out, 9*C_in), tap-major columns:
    column t*C_in + i holds w[t // 3, t % 3, i, :]."""
    k = w.reshape(9 * w.shape[2], w.shape[3])        # (9*Cin, Cout), tap-major
    return k.T                                        # (Cout, 9*Cin)


def _tap_offsets(w_cols: int) -> Tuple[int, ...]:
    """Flat-pixel offset of each tap: out[g] += w[t] * x[g + off_t]."""
    return tuple((ki - 1) * w_cols + (kj - 1)
                 for ki in range(3) for kj in range(3))


def _roll_lanes(x2d, shift: int):
    """Lane-dim roll (axis=1) by a static amount.

    Mosaic's ``tpu.dynamic_rotate`` only supports 32-bit element types
    ("Rotate with non-32-bit data" is unimplemented), so sub-32-bit inputs
    are rolled in f32 by the caller.
    """
    if shift % x2d.shape[1] == 0:
        return x2d
    return pltpu.roll(x2d, shift % x2d.shape[1], 1)


def _conv_kernel(x_ref, w_ref, o_ref, *, H: int, W: int, C_in: int,
                 C_out: int):
    """One image: x_ref (1, C_in, H*W), w_ref (C_out, 9*C_in),
    o_ref (1, C_out, H*W).

    Builds the tap-stacked matrix P (9*C_in, H*W) in VMEM — lane rolls in
    f32 (Mosaic limitation), edge masking as VPU selects on a lane iota,
    matmul in the input dtype with f32 accumulation.  P is at most ~10.6 MB
    bf16 (16 ch @ 192^2), well within VMEM, so one matmul covers the image.
    """
    L = H * W
    x = x_ref[0]                       # (C_in, L), VMEM-resident
    x32 = x.astype(jnp.float32)        # rolls require 32-bit data
    g = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    parts = []
    for t, off in enumerate(_tap_offsets(W)):
        ki, kj = divmod(t, 3)
        shifted = _roll_lanes(x32, -off)
        valid = jnp.ones((1, L), jnp.bool_)
        if ki == 0:
            valid = jnp.logical_and(valid, g >= W)
        elif ki == 2:
            valid = jnp.logical_and(valid, g < (H - 1) * W)
        if kj == 0:
            valid = jnp.logical_and(valid, (g % W) != 0)
        elif kj == 2:
            valid = jnp.logical_and(valid, (g % W) != W - 1)
        parts.append(jnp.where(valid, shifted, 0.0).astype(x.dtype))
    p = jnp.concatenate(parts, axis=0)                # (9*C_in, L)
    acc = jax.lax.dot_general(
        w_ref[:], p, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (C_out, L)
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("H", "W", "interpret"))
def conv3x3_chw(x_chw: jnp.ndarray, w: jnp.ndarray, *, H: int, W: int,
                interpret: bool = False):
    """SAME stride-1 3x3 conv in CHW-lanes layout.

    Args:
      x_chw: (N, C_in, H*W) activations, pixels on lanes.
      w: (3, 3, C_in, C_out) HWIO kernel.
      interpret: run the Pallas interpreter (CPU testing).
    Returns (N, C_out, H*W) in x dtype.
    """
    n, c_in, L = x_chw.shape
    assert L == H * W, (L, H, W)
    c_out = w.shape[-1]
    w_all = weights_to_wall(w).astype(x_chw.dtype)
    kern = functools.partial(_conv_kernel, H=H, W=W, C_in=c_in, C_out=c_out)
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, c_in, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_out, 9 * c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c_out, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c_out, L), x_chw.dtype),
        compiler_params=pltpu.CompilerParams(
            # P + the f32 roll staging exceed the default 16 MB scoped-vmem
            # cap at 192^2; physical v5e VMEM is 128 MB.
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_chw, w_all)


def nhwc_to_chw(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, C, H*W) (the kernel's canonical layout)."""
    n, h, w, c = x.shape
    return x.transpose(0, 3, 1, 2).reshape(n, c, h * w)


def chw_to_nhwc(x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    n, c, L = x.shape
    return x.reshape(n, c, H, W).transpose(0, 2, 3, 1)


def conv3x3_nhwc_via_chw(x: jnp.ndarray, w: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """NHWC wrapper (transposes at the boundary; for isolated testing —
    production use keeps whole stages in CHW to amortize the transposes)."""
    n, h, ww, c = x.shape
    out = conv3x3_chw(nhwc_to_chw(x), w, H=h, W=ww, interpret=interpret)
    return chw_to_nhwc(out, h, ww)
