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

Measured (v5e, cli/bench_pallas_conv.py, batch 20 bf16, incl. NHWC
boundary transposes): 1.9-4.1x vs stock XLA for the <=64-channel stages;
slower at 128 channels (stock tiles those fine) — hence the eligibility
rule in :class:`Conv`.  End-to-end (bench.py A/B): per-conv drop-in took
the full cooperative train step 183.0 -> 142.6 ms/step; keeping the
residual cores CHW-RESIDENT between kernels (models/blocks.py fused
paths, via this module's ``chw=`` entry) took it to **86.3 ms/step
(231.7 slices/s/chip, 2.12x stock)** — losses agreeing to bf16 reorder
tolerance (cli/check_pallas_values.py).

Training works through a custom VJP: dx is this same kernel with the
flipped/transposed weights; dw is a second Pallas reduction kernel
accumulating P_i @ dy_i^T across the batch grid.

Considered and bounded-out: fusing the BN+LeakyReLU epilogue into the
kernel.  XLA already fuses the normalize-apply + LReLU into ONE elementwise
HBM pass between conv kernels (saved/layer_profile.md "fusion bar": the
full 192^2 16->16 residual core runs 0.429 ms fwd vs ~0.31 ms for its two
Pallas convs alone, i.e. ~0.12 ms for ALL inter-conv glue at the largest
stage).  The roofline for one such pass is ~0.06 ms (20x192^2x16 bf16
read+write at 819 GB/s); an in-kernel epilogue can only save the
write+read BETWEEN conv and norm — a <=2-3 ms ceiling across the whole
86 ms step (every stage, all three gradient passes) — while BN's batch
statistics still need a cross-image reduction pass the per-image grid
cannot produce, and the custom VJP would have to differentiate through the
fused normalize.  Not worth the complexity at this model scale; the
measured wall is MXU fill (C_out <= 64 rows of the 128-row systolic
array), not relayout traffic.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cooperative_training_and_latent_space_data_augmentation_tpu.ops.fast_conv import (
    Conv as _FallbackConv,  # staircase drop-in; stock unless FAST_CONV=1
)
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec


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
    p = _build_p(x_ref[0], H, W)                      # (9*C_in, L)
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


def _build_p(x, H: int, W: int):
    """Tap-stacked matrix P (9*C_in, H*W) from x (C_in, H*W) in VMEM.

    Shared by the forward and dw kernels.  Lane rolls in f32 (Mosaic
    limitation), SAME-padding edge masking via lane-iota selects, result
    cast back to x dtype for the MXU.
    """
    L = H * W
    x32 = x.astype(jnp.float32)
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
    return jnp.concatenate(parts, axis=0)                 # (9*C_in, L)


def _dw_kernel(x_ref, dy_ref, o_ref, *, H: int, W: int):
    """Weight gradient: accumulate P_i @ dy_i^T over the image grid.

    x_ref (1, C_in, L), dy_ref (1, C_out, L), o_ref (9*C_in, C_out) f32 —
    the output block index is constant across the grid, so the accumulator
    stays VMEM-resident (standard Pallas reduction-grid pattern).
    """
    i = pl.program_id(0)
    p = _build_p(x_ref[0], H, W)
    acc = jax.lax.dot_general(
        p, dy_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # (9*C_in, C_out)

    @pl.when(i == 0)
    def _init():
        o_ref[...] = acc

    @pl.when(i > 0)
    def _acc():
        o_ref[...] += acc


@functools.partial(jax.jit, static_argnames=("H", "W", "interpret"))
def _conv3x3_chw_dw(x_chw, dy_chw, *, H: int, W: int,
                    interpret: bool = False):
    """d(conv)/d(w) in wall layout -> (3, 3, C_in, C_out) f32."""
    n, c_in, L = x_chw.shape
    c_out = dy_chw.shape[1]
    kern = functools.partial(_dw_kernel, H=H, W=W)
    dw_wall = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, c_in, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * c_in, c_out), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * c_in, c_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_chw, dy_chw)
    # wall rows are tap-major (t*C_in + i) -> (9, C_in, C_out) -> HWIO
    return dw_wall.reshape(3, 3, c_in, c_out)


def _flip_w(w: jnp.ndarray) -> jnp.ndarray:
    """Transpose conv kernel: w'[ki, kj, o, i] = w[2-ki, 2-kj, i, o]."""
    return jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)


# -------------------- multi-chip partitioning (pjit + shardy) --------------------
#
# pallas_call does not auto-partition under pjit: without help, a sharded
# trace would all-gather the batch onto every chip.  Both kernels are batch
# data-parallel (the grid is the batch dim), so `custom_partitioning` teaches
# the partitioner the obvious SPMD rule instead:
#   * forward / dx: run the kernel on the local batch shard (no collectives);
#   * dw: per-shard partial reduction + psum over the mesh axes that shard
#     the batch (the classic DP gradient all-reduce, riding ICI).
# Everything around the kernels (BN over the sharded batch, losses, optax)
# stays under the ordinary pjit partitioner, so numerics and BN semantics
# are identical to the single-chip path.  The wrappers only engage on
# multi-device processes; the single-chip bench path is byte-identical.


def _dim0_axes(sharding) -> Tuple:
    """Mesh axis names sharding dim 0 of a NamedSharding (possibly ())."""
    spec = getattr(sharding, "spec", None)
    if spec is None or len(spec) == 0 or spec[0] is None:
        return ()
    a = spec[0]
    return tuple(a) if isinstance(a, tuple) else (a,)


def _batch_spec(axes, rank: int) -> PartitionSpec:
    """(axes|None, None, ...) — batch on dim 0, replicated elsewhere."""
    return PartitionSpec(axes if axes else None, *([None] * (rank - 1)))


@functools.lru_cache(maxsize=None)
def _sharded_conv_fwd(H: int, W: int, interpret: bool):
    """custom_partitioning wrapper for the forward/dx kernel."""

    fn = custom_partitioning(
        lambda x, w: conv3x3_chw(x, w, H=H, W=W, interpret=interpret))

    def partition(mesh, arg_shapes, result_shape):
        axes = _dim0_axes(arg_shapes[0].sharding)
        xs = NamedSharding(mesh, _batch_spec(axes, 3))
        ws = NamedSharding(mesh, PartitionSpec(None, None, None, None))
        rs = NamedSharding(mesh, _batch_spec(axes, 3))

        def lower_fn(x, w):
            return conv3x3_chw(x, w, H=H, W=W, interpret=interpret)

        return mesh, lower_fn, rs, (xs, ws)

    def infer_sharding(mesh, arg_shapes, result_shape):
        axes = _dim0_axes(arg_shapes[0].sharding)
        return NamedSharding(mesh, _batch_spec(axes, 3))

    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule="b i l, kh kw i o -> b o l")
    return fn


@functools.lru_cache(maxsize=None)
def _sharded_conv_dw(H: int, W: int, interpret: bool):
    """custom_partitioning wrapper for the weight-grad reduction kernel."""

    fn = custom_partitioning(
        lambda x, dy: _conv3x3_chw_dw(x, dy, H=H, W=W, interpret=interpret))

    def partition(mesh, arg_shapes, result_shape):
        axes = _dim0_axes(arg_shapes[0].sharding)
        xs = NamedSharding(mesh, _batch_spec(axes, 3))
        ys = NamedSharding(mesh, _batch_spec(axes, 3))
        rs = NamedSharding(mesh, PartitionSpec(None, None, None, None))

        def lower_fn(x, dy):
            dw = _conv3x3_chw_dw(x, dy, H=H, W=W, interpret=interpret)
            if axes:
                dw = jax.lax.psum(dw, axes)
            return dw

        return mesh, lower_fn, rs, (xs, ys)

    def infer_sharding(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, PartitionSpec(None, None, None, None))

    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule="b i l, b o l -> kh kw i o",
        reduction_factors=("b",))
    return fn


def _multi_device() -> bool:
    """True on processes where pjit may shard the batch over >1 device."""
    return jax.device_count() > 1


def _conv_fwd_dispatch(x_chw, w, H, W, interpret):
    if _multi_device():
        return _sharded_conv_fwd(H, W, interpret)(x_chw, w)
    return conv3x3_chw(x_chw, w, H=H, W=W, interpret=interpret)


def _conv_dw_dispatch(x_chw, dy_chw, H, W, interpret):
    if _multi_device():
        return _sharded_conv_dw(H, W, interpret)(x_chw, dy_chw)
    return _conv3x3_chw_dw(x_chw, dy_chw, H=H, W=W, interpret=interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv3x3_chw_ad(x_chw, w, H: int, W: int, interpret: bool = False):
    """Differentiable CHW-lanes 3x3 SAME conv (custom VJP).

    dx rides the forward kernel with the flipped/transposed kernel (a SAME
    3x3 conv's input-gradient IS a SAME 3x3 conv); dw is the reduction
    kernel above.  Matches ``jax.grad`` of ``lax.conv_general_dilated`` —
    pinned by tests/test_pallas_conv.py.  On multi-device processes all
    three kernels ride the custom_partitioning wrappers so pjit keeps the
    batch sharded over the mesh (dw all-reduced via psum).
    """
    return _conv_fwd_dispatch(x_chw, w, H, W, interpret)


def vjp_mode() -> str:
    """Backward route for the CHW kernel (PALLAS_VJP env):

    - ``pallas``: dx rides the forward kernel with flipped weights, dw is
      the Pallas batch-grid reduction kernel.
    - ``stock``: whole backward through jax.vjp of stock lax.conv on the
      NCHW view ((N, C, H*W) -> (N, C, H, W) is a free minor-dim split).
    - ``hybrid``: dx via the Pallas kernel (the CHW chain's layout
      survives), dw alone via stock XLA.

    Isolation (cli/bench_b8_conv.py, v5e batch 20 bf16): stock backward
    beats the Pallas dx+dw pair at the deeper stages (48^2 32->64: 0.048
    vs 0.083 ms; 48^2 64->64: 0.065 vs 0.172) and ties shallow — the
    Pallas dw reduction's (9*C_in x C_out) output starves the MXU.  The
    end-to-end A/B (RESULTS.md) picks the default."""
    return os.environ.get("PALLAS_VJP", "pallas")


def _conv_nchw_stock(x4, w_):
    return jax.lax.conv_general_dilated(
        x4, w_, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"))


def _conv_ad_fwd(x_chw, w, H, W, interpret):
    return _conv_fwd_dispatch(x_chw, w, H, W, interpret), (x_chw, w)


def _conv_ad_bwd(H, W, interpret, res, dy):
    x_chw, w = res
    mode = vjp_mode()
    n, c_in, L = x_chw.shape
    if mode == "stock":
        # jax.vjp of the stock conv emits XLA's fused dx/dw backward graph
        # (the unused forward value is DCE'd).
        _, vjp = jax.vjp(_conv_nchw_stock, x_chw.reshape(n, c_in, H, W), w)
        dx4, dw = vjp(dy.reshape(n, dy.shape[1], H, W))
        return dx4.reshape(n, c_in, L), dw.astype(w.dtype)
    dx = _conv_fwd_dispatch(dy, _flip_w(w), H, W, interpret)
    if mode == "hybrid":
        x4 = x_chw.reshape(n, c_in, H, W)
        _, vjp_w = jax.vjp(lambda w_: _conv_nchw_stock(x4, w_), w)
        dw, = vjp_w(dy.reshape(n, dy.shape[1], H, W))
    else:
        dw = _conv_dw_dispatch(x_chw, dy, H, W, interpret)
    return dx, dw.astype(w.dtype)


conv3x3_chw_ad.defvjp(_conv_ad_fwd, _conv_ad_bwd)


# ------------------------- stride-2 (phase-decomposed) -------------------------
#
# The encoder's downsample convs (torch Conv2d(C, C, 3, stride=2, padding=1),
# medseg/models/ebm/encoder_decoder.py:23-27) read input pixels 2r+ki-1.
# Writing 2r+ki-1 = 2(r+dr)+pi with pi=(ki+1)%2, dr=(ki-1-pi)//2 in {-1, 0}
# shows each tap is a SHIFTED copy of one of the four parity PHASES of the
# input.  So after a phase split (N, C, H*W) -> (N, 4C, (H/2)(W/2)) — a plain
# XLA relayout that REPLACES the NHWC boundary transpose — the stride-2 conv
# has exactly the stride-1 kernel's structure: rolls + edge masks to build a
# (9*C_in, L/4) tap matrix, one MXU matmul per image.  Only the ki=0 / kj=0
# taps mask (top row / left column); P is 4x smaller than the stride-1 one.


def chw_phase_split(x_chw: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """(N, C, H*W) -> (N, 4C, (H/2)*(W/2)); channel block p = 2*pi+pj holds
    the (row%2==pi, col%2==pj) phase.  Plain XLA ops (outside the kernel)."""
    n, c, L = x_chw.shape
    assert L == H * W and H % 2 == 0 and W % 2 == 0, (x_chw.shape, H, W)
    x = x_chw.reshape(n, c, H // 2, 2, W // 2, 2)
    x = x.transpose(0, 3, 5, 1, 2, 4)                # (n, pi, pj, c, H2, W2)
    return x.reshape(n, 4 * c, (H // 2) * (W // 2))


def chw_phase_merge(xp: jnp.ndarray, H2: int, W2: int) -> jnp.ndarray:
    """Inverse of :func:`chw_phase_split`: (N, 4C, H2*W2) -> (N, C, 4*H2*W2)."""
    n, c4, L4 = xp.shape
    c = c4 // 4
    x = xp.reshape(n, 2, 2, c, H2, W2)
    x = x.transpose(0, 3, 4, 1, 5, 2)                # (n, c, H2, pi, W2, pj)
    return x.reshape(n, c, 4 * H2 * W2)


def _s2_taps(W2: int):
    """Per-tap (phase block, lane offset, masks_top_row, masks_left_col)."""
    taps = []
    for ki in range(3):
        for kj in range(3):
            pi, pj = (ki + 1) % 2, (kj + 1) % 2
            dr, dc = (ki - 1 - pi) // 2, (kj - 1 - pj) // 2
            taps.append((2 * pi + pj, dr * W2 + dc, dr == -1, dc == -1))
    return taps


def _build_p_s2(xp, H2: int, W2: int, C_in: int):
    """Tap matrix P (9*C_in, L4) from the phase-split input (4*C_in, L4)."""
    L4 = H2 * W2
    xp32 = xp.astype(jnp.float32)
    g = jax.lax.broadcasted_iota(jnp.int32, (1, L4), 1)
    parts = []
    for p, off, mask_top, mask_left in _s2_taps(W2):
        # static slice: Mosaic TC has no dynamic_slice lowering
        block = xp32[p * C_in:(p + 1) * C_in]
        shifted = _roll_lanes(block, -off)
        valid = jnp.ones((1, L4), jnp.bool_)
        if mask_top:
            valid = jnp.logical_and(valid, g >= W2)
        if mask_left:
            valid = jnp.logical_and(valid, (g % W2) != 0)
        parts.append(jnp.where(valid, shifted, 0.0).astype(xp.dtype))
    return jnp.concatenate(parts, axis=0)            # (9*C_in, L4)


def _conv_s2_kernel(xp_ref, w_ref, o_ref, *, H2: int, W2: int, C_in: int):
    p = _build_p_s2(xp_ref[0], H2, W2, C_in)
    acc = jax.lax.dot_general(
        w_ref[:], p, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (C_out, L4)
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("H", "W", "interpret"))
def conv3x3s2_phase(xp: jnp.ndarray, w: jnp.ndarray, *, H: int, W: int,
                    interpret: bool = False):
    """Stride-2 SAME(pad 1) 3x3 conv on phase-split input.

    Args:
      xp: (N, 4*C_in, (H/2)*(W/2)) from :func:`chw_phase_split`.
      w: (3, 3, C_in, C_out) HWIO kernel.  H, W are the PRE-downsample dims.
    Returns (N, C_out, (H/2)*(W/2)).
    """
    n, c4, L4 = xp.shape
    c_in = c4 // 4
    H2, W2 = H // 2, W // 2
    assert L4 == H2 * W2, (xp.shape, H, W)
    c_out = w.shape[-1]
    w_all = weights_to_wall(w).astype(xp.dtype)
    kern = functools.partial(_conv_s2_kernel, H2=H2, W2=W2, C_in=c_in)
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, c4, L4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_out, 9 * c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c_out, L4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c_out, L4), xp.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, w_all)


def _dx_s2_kernel(dy_ref, w_ref, o_ref, *, H2: int, W2: int, C_in: int):
    """d(conv_s2)/d(xp): dP = W_all^T @ dy, scattered back into the four
    phase blocks with the inverse rolls (the forward mask zeros first, so
    wrapped lanes carry no stale contribution)."""
    L4 = H2 * W2
    dy32 = dy_ref[0].astype(jnp.float32)
    dp = jax.lax.dot_general(
        w_ref[:], dy32, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (9*C_in, L4)
    g = jax.lax.broadcasted_iota(jnp.int32, (1, L4), 1)
    blocks = [jnp.zeros((C_in, L4), jnp.float32) for _ in range(4)]
    for t, (p, off, mask_top, mask_left) in enumerate(_s2_taps(W2)):
        dpt = dp[t * C_in:(t + 1) * C_in]
        valid = jnp.ones((1, L4), jnp.bool_)
        if mask_top:
            valid = jnp.logical_and(valid, g >= W2)
        if mask_left:
            valid = jnp.logical_and(valid, (g % W2) != 0)
        blocks[p] = blocks[p] + _roll_lanes(jnp.where(valid, dpt, 0.0), off)
    o_ref[0] = jnp.concatenate(blocks, axis=0).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("H", "W", "interpret"))
def _conv3x3s2_phase_dx(dy: jnp.ndarray, w: jnp.ndarray, *, H: int, W: int,
                        interpret: bool = False):
    n, c_out, L4 = dy.shape
    c_in = w.shape[2]
    H2, W2 = H // 2, W // 2
    w_all = weights_to_wall(w).astype(jnp.float32)    # (C_out, 9*C_in)
    kern = functools.partial(_dx_s2_kernel, H2=H2, W2=W2, C_in=c_in)
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, c_out, L4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_out, 9 * c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4 * c_in, L4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 4 * c_in, L4), dy.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(dy, w_all)


def _dw_s2_kernel(xp_ref, dy_ref, o_ref, *, H2: int, W2: int, C_in: int):
    i = pl.program_id(0)
    p = _build_p_s2(xp_ref[0], H2, W2, C_in)
    acc = jax.lax.dot_general(
        p, dy_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # (9*C_in, C_out)

    @pl.when(i == 0)
    def _init():
        o_ref[...] = acc

    @pl.when(i > 0)
    def _acc():
        o_ref[...] += acc


@functools.partial(jax.jit, static_argnames=("H", "W", "interpret"))
def _conv3x3s2_phase_dw(xp, dy, *, H: int, W: int, interpret: bool = False):
    n, c4, L4 = xp.shape
    c_in = c4 // 4
    c_out = dy.shape[1]
    H2, W2 = H // 2, W // 2
    kern = functools.partial(_dw_s2_kernel, H2=H2, W2=W2, C_in=c_in)
    dw_wall = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, c4, L4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out, L4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * c_in, c_out), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * c_in, c_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, dy)
    return dw_wall.reshape(3, 3, c_in, c_out)


@functools.lru_cache(maxsize=None)
def _sharded_s2(which: str, H: int, W: int, interpret: bool):
    """custom_partitioning wrappers for the stride-2 kernels (same batch-DP
    rules as the stride-1 ones: fwd/dx shard-local, dw psum)."""
    base = {"fwd": lambda xp, w: conv3x3s2_phase(
                xp, w, H=H, W=W, interpret=interpret),
            "dx": lambda dy, w: _conv3x3s2_phase_dx(
                dy, w, H=H, W=W, interpret=interpret),
            "dw": lambda xp, dy: _conv3x3s2_phase_dw(
                xp, dy, H=H, W=W, interpret=interpret)}[which]
    fn = custom_partitioning(base)

    def partition(mesh, arg_shapes, result_shape):
        axes = _dim0_axes(arg_shapes[0].sharding)
        if which == "dw":
            arg_sh = (NamedSharding(mesh, _batch_spec(axes, 3)),
                      NamedSharding(mesh, _batch_spec(axes, 3)))
            rs = NamedSharding(mesh, PartitionSpec(None, None, None, None))

            def lower_fn(xp, dy):
                dw = base(xp, dy)
                return jax.lax.psum(dw, axes) if axes else dw
        else:
            arg_sh = (NamedSharding(mesh, _batch_spec(axes, 3)),
                      NamedSharding(mesh, PartitionSpec(None, None, None, None)))
            rs = NamedSharding(mesh, _batch_spec(axes, 3))
            lower_fn = base
        return mesh, lower_fn, rs, arg_sh

    def infer_sharding(mesh, arg_shapes, result_shape):
        if which == "dw":
            return NamedSharding(mesh, PartitionSpec(None, None, None, None))
        axes = _dim0_axes(arg_shapes[0].sharding)
        return NamedSharding(mesh, _batch_spec(axes, 3))

    rules = {"fwd": "b i l, kh kw j o -> b o l",
             "dx": "b o l, kh kw j p -> b i l",
             "dw": "b i l, b o l -> kh kw j o"}
    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule=rules[which],
        reduction_factors=("b",) if which == "dw" else ())
    return fn


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv3x3s2_phase_ad(xp, w, H: int, W: int, interpret: bool = False):
    """Differentiable stride-2 phase conv (custom VJP; multi-device via
    custom_partitioning).  Matches ``jax.grad`` of the stride-2
    ``lax.conv_general_dilated`` through the phase split — pinned by
    tests/test_pallas_conv.py."""
    if _multi_device():
        return _sharded_s2("fwd", H, W, interpret)(xp, w)
    return conv3x3s2_phase(xp, w, H=H, W=W, interpret=interpret)


def _conv_s2_ad_fwd(xp, w, H, W, interpret):
    return conv3x3s2_phase_ad(xp, w, H, W, interpret), (xp, w)


def _conv_s2_ad_bwd(H, W, interpret, res, dy):
    xp, w = res
    if _multi_device():
        dxp = _sharded_s2("dx", H, W, interpret)(dy, w)
        dw = _sharded_s2("dw", H, W, interpret)(xp, dy)
    else:
        dxp = _conv3x3s2_phase_dx(dy, w, H=H, W=W, interpret=interpret)
        dw = _conv3x3s2_phase_dw(xp, dy, H=H, W=W, interpret=interpret)
    return dxp.astype(xp.dtype), dw.astype(w.dtype)


conv3x3s2_phase_ad.defvjp(_conv_s2_ad_fwd, _conv_s2_ad_bwd)


# ------------------- NL-sublanes kernel (large-channel stages) -------------------
#
# The CHW-lanes kernel above wins for <=64-channel stages but LOSES at 128
# channels (stock XLA tiles those fine; measured, RESULTS.md round 3).  The
# remaining stock stages — the two deepest encoder stages, the code
# decoupler and the decoder bottoms (channel plan
# medseg/models/ebm/encoder_decoder.py:351-453) — run 128-channel convs at
# 12x12/24x24 spatial, where HW-on-lanes starves the MXU.  This second
# tiling flips the layout: CHANNELS on lanes (128 = exactly one lane tile)
# and the flattened batch*pixels on sublanes — i.e. the native NHWC layout,
# so entering/leaving the kernel costs a free reshape, no transposes.
#
#   * X lives as (N*H*W, C); tap shifts are SUBLANE rolls (f32 staging, same
#     Mosaic constraint as the lane rolls above).
#   * P stacks the 9 tap copies on lanes: (M, 9*C_in) with M = chunk*H*W
#     images per grid step; one (M, 9*C_in) @ (9*C_in, C_out) MXU matmul
#     per chunk — M in the thousands, K = 9*C_in >= 576, N_dim = C_out >=
#     64 all fill the systolic array.
#   * Per-image SAME-padding masks use the image-local pixel index
#     p = sublane_index mod (H*W); the same conditions that zero a tap at
#     an image edge also kill every cross-image contribution a roll could
#     drag in (a masked-valid p always has 0 <= p+off < H*W).
#
# dx is this same kernel with flipped/transposed weights; dw accumulates
# P_chunk^T @ dY_chunk over the chunk grid.


# Max flattened rows per grid step: P is M x 9*C_in; at C_in=128 and f32
# staging this caps the tap matrix at ~21 MB — comfortably VMEM-resident.
_NL_MAX_M = 4608


def _nl_chunk(n: int, L: int) -> int:
    """Largest divisor of n whose chunk*L fits the VMEM row budget."""
    best = 1
    for d in range(1, n + 1):
        if n % d == 0 and d * L <= _NL_MAX_M:
            best = d
    return best


def _build_p_nl(x, H: int, W: int):
    """Tap matrix P (M, 9*C_in) from x (M, C_in), M = chunk*H*W flattened
    batch-major.  Sublane rolls in f32 (Mosaic rotate is 32-bit only),
    SAME-padding edge masks on the image-local pixel index."""
    M = x.shape[0]
    L = H * W
    x32 = x.astype(jnp.float32)
    p = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) % L
    parts = []
    for t, off in enumerate(_tap_offsets(W)):
        ki, kj = divmod(t, 3)
        if off % M == 0:
            shifted = x32
        else:
            shifted = pltpu.roll(x32, (-off) % M, 0)
        valid = jnp.ones((M, 1), jnp.bool_)
        if ki == 0:
            valid = jnp.logical_and(valid, p >= W)
        elif ki == 2:
            valid = jnp.logical_and(valid, p < (H - 1) * W)
        if kj == 0:
            valid = jnp.logical_and(valid, (p % W) != 0)
        elif kj == 2:
            valid = jnp.logical_and(valid, (p % W) != W - 1)
        parts.append(jnp.where(valid, shifted, 0.0).astype(x.dtype))
    return jnp.concatenate(parts, axis=1)                 # (M, 9*C_in)


def _conv_nl_kernel(x_ref, w_ref, o_ref, *, H: int, W: int):
    """One chunk: x_ref (M, C_in), w_ref (9*C_in, C_out), o_ref (M, C_out)."""
    p = _build_p_nl(x_ref[...], H, W)
    acc = jax.lax.dot_general(
        p, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (M, C_out)
    o_ref[...] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3_nl(x: jnp.ndarray, w: jnp.ndarray, *, interpret: bool = False):
    """SAME stride-1 3x3 conv in NL-sublanes layout (channels on lanes).

    Args:
      x: (N, H, W, C_in) NHWC activations — the kernel layout IS the
         flattened NHWC view, so no transposes happen at the boundary.
      w: (3, 3, C_in, C_out) HWIO kernel.
    Returns (N, H, W, C_out) in x dtype.
    """
    n, h, w_cols, c_in = x.shape
    c_out = w.shape[-1]
    L = h * w_cols
    chunk = _nl_chunk(n, L)
    w_all = w.reshape(9 * c_in, c_out).astype(x.dtype)   # tap-major rows
    kern = functools.partial(_conv_nl_kernel, H=h, W=w_cols)
    out = pl.pallas_call(
        kern,
        grid=(n // chunk,),
        in_specs=[
            pl.BlockSpec((chunk * L, c_in), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c_in, c_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk * L, c_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * L, c_out), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x.reshape(n * L, c_in), w_all)
    return out.reshape(n, h, w_cols, c_out)


def _dw_nl_kernel(x_ref, dy_ref, o_ref, *, H: int, W: int):
    """Weight grad: accumulate P_chunk^T @ dY_chunk over the chunk grid.
    x_ref (M, C_in), dy_ref (M, C_out), o_ref (9*C_in, C_out) f32."""
    i = pl.program_id(0)
    p = _build_p_nl(x_ref[...], H, W)
    acc = jax.lax.dot_general(
        p, dy_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (9*C_in, C_out)

    @pl.when(i == 0)
    def _init():
        o_ref[...] = acc

    @pl.when(i > 0)
    def _acc():
        o_ref[...] += acc


@functools.partial(jax.jit, static_argnames=("H", "W", "interpret"))
def _conv3x3_nl_dw(x_flat, dy_flat, *, H: int, W: int,
                   interpret: bool = False):
    """d(conv)/d(w) -> (3, 3, C_in, C_out) f32 from flattened activations."""
    M_total, c_in = x_flat.shape
    c_out = dy_flat.shape[1]
    L = H * W
    n = M_total // L
    chunk = _nl_chunk(n, L)
    kern = functools.partial(_dw_nl_kernel, H=H, W=W)
    dw_wall = pl.pallas_call(
        kern,
        grid=(n // chunk,),
        in_specs=[
            pl.BlockSpec((chunk * L, c_in), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk * L, c_out), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * c_in, c_out), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * c_in, c_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_flat, dy_flat)
    return dw_wall.reshape(3, 3, c_in, c_out)


@functools.lru_cache(maxsize=None)
def _sharded_nl_fwd(interpret: bool):
    """custom_partitioning wrapper: batch-DP forward (shard-local)."""

    fn = custom_partitioning(
        lambda x, w: conv3x3_nl(x, w, interpret=interpret))

    def partition(mesh, arg_shapes, result_shape):
        axes = _dim0_axes(arg_shapes[0].sharding)
        xs = NamedSharding(mesh, _batch_spec(axes, 4))
        ws = NamedSharding(mesh, PartitionSpec(None, None, None, None))
        rs = NamedSharding(mesh, _batch_spec(axes, 4))

        def lower_fn(x, w):
            return conv3x3_nl(x, w, interpret=interpret)

        return mesh, lower_fn, rs, (xs, ws)

    def infer_sharding(mesh, arg_shapes, result_shape):
        axes = _dim0_axes(arg_shapes[0].sharding)
        return NamedSharding(mesh, _batch_spec(axes, 4))

    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule="b h wd i, kh kw i o -> b h wd o")
    return fn


@functools.lru_cache(maxsize=None)
def _sharded_nl_dw(H: int, W: int, interpret: bool):
    """custom_partitioning wrapper: per-shard dw partial + psum (DP grad
    all-reduce riding ICI)."""

    fn = custom_partitioning(
        lambda x, dy: _conv3x3_nl_dw(x, dy, H=H, W=W, interpret=interpret))

    def partition(mesh, arg_shapes, result_shape):
        axes = _dim0_axes(arg_shapes[0].sharding)
        xs = NamedSharding(mesh, _batch_spec(axes, 2))
        ys = NamedSharding(mesh, _batch_spec(axes, 2))
        rs = NamedSharding(mesh, PartitionSpec(None, None, None, None))

        def lower_fn(x, dy):
            dw = _conv3x3_nl_dw(x, dy, H=H, W=W, interpret=interpret)
            if axes:
                dw = jax.lax.psum(dw, axes)
            return dw

        return mesh, lower_fn, rs, (xs, ys)

    def infer_sharding(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, PartitionSpec(None, None, None, None))

    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule="m i, m o -> kh kw i o",
        reduction_factors=("m",))
    return fn


def _nl_fwd_dispatch(x, w, interpret):
    if _multi_device():
        return _sharded_nl_fwd(interpret)(x, w)
    return conv3x3_nl(x, w, interpret=interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_nl_ad(x, w, interpret: bool = False):
    """Differentiable NL-sublanes 3x3 SAME conv (custom VJP).

    dx = this kernel with the flipped/transposed weights (a SAME 3x3
    conv's input-gradient IS a SAME 3x3 conv); dw = the chunk-grid
    reduction kernel.  Matches jax.grad of lax.conv_general_dilated —
    pinned in tests/test_pallas_conv.py.  Multi-device: both kernels ride
    custom_partitioning (forward shard-local, dw psum over the mesh).
    """
    return _nl_fwd_dispatch(x, w, interpret)


def _nl_ad_fwd(x, w, interpret):
    return _nl_fwd_dispatch(x, w, interpret), (x, w)


def _nl_ad_bwd(interpret, res, dy):
    x, w = res
    n, h, w_cols, c_in = x.shape
    dx = _nl_fwd_dispatch(dy, _flip_w(w), interpret)
    x_flat = x.reshape(n * h * w_cols, c_in)
    dy_flat = dy.reshape(n * h * w_cols, dy.shape[-1])
    # dw: shard-local chunk reduction (+psum under a mesh): the flattened
    # batch dim m carries the batch sharding (n*h*w rows, batch-major)
    if _multi_device():
        dw = _sharded_nl_dw(h, w_cols, interpret)(x_flat, dy_flat)
    else:
        dw = _conv3x3_nl_dw(x_flat, dy_flat, H=h, W=w_cols,
                            interpret=interpret)
    return dx, dw.astype(w.dtype)


conv3x3_nl_ad.defvjp(_nl_ad_fwd, _nl_ad_bwd)


def pallas_nl_enabled() -> bool:
    """Trace-time switch for the NL-sublanes large-channel kernel
    (PALLAS_CONV_NL env).

    Default OFF — a documented MEASURED NEGATIVE result (third in the
    family after the staircase packing and the stride-2 phase kernel):
    isolation on v5e (cli/bench_nl_conv.py, batch 40 bf16, both sides in
    native NHWC so no transpose asymmetry) has stock XLA running the
    128-channel stages at 93-172 TFLOP/s — 47-88 % MFU, NOT the
    single-digit MFU hypothesized from whole-step arithmetic — and the NL
    kernel 0.44-0.56x behind it.  The 86 ms step's remaining time is NOT
    in these convs (see cli/profile_step_knockout.py).  The kernel stays
    correct (value/grad/sharding pinned in tests/test_pallas_conv.py,
    Mosaic-lowerable per tests/test_pallas_tpu_lowering.py) and opt-in
    for future re-measurement."""
    return os.environ.get("PALLAS_CONV_NL", "0") == "1"


def _eligible_channels_nl(c_in: int, c_out: int) -> bool:
    """NL-kernel win region: the large-channel stages the CHW kernel
    rejects.  Both ends must put real work on the MXU lanes (>=64) and at
    least one side must reach the 128-lane tile the CHW kernel starves on."""
    return (min(c_in, c_out) >= 64 and max(c_in, c_out) >= 128
            and max(c_in, c_out) <= int(
                os.environ.get("PALLAS_CONV_NL_MAX_CH", "256")))


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


def conv3x3_nhwc_ad(x: jnp.ndarray, w: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """Differentiable NHWC wrapper: layout transposes are plain jnp ops
    (jax.grad handles them); the conv core uses the custom VJP."""
    n, h, ww, c = x.shape
    out = conv3x3_chw_ad(nhwc_to_chw(x), w, h, ww, interpret)
    return chw_to_nhwc(out, h, ww)


def pallas_conv_enabled() -> bool:
    """Global trace-time switch for the CHW-lanes kernel (PALLAS_CONV env,
    default ON; set PALLAS_CONV=0 for the stock-XLA A/B control)."""
    return os.environ.get("PALLAS_CONV", "1") == "1"


def pallas_s2_enabled() -> bool:
    """Trace-time switch for the stride-2 phase kernel + CHW stage chaining
    (PALLAS_CONV_S2 env).

    Default OFF — a documented NEGATIVE result (like the staircase packing
    in ops/fast_conv.py): measured end-to-end on v5e (bench.py A/B, batch
    20 bf16, full cooperative step) the phase-kernel downsamples + cross-
    stage CHW chaining run 93.3 ms/step vs 86.2 ms with only the stride-1
    CHW-resident residual cores — an 8 % LOSS.  The phase split/merge
    relayouts and the serial per-image dw accumulation cost more than the
    removed boundary transposes save.  The kernels stay correct (exact vs
    stock in tests/test_pallas_conv.py, Mosaic-lowerable per
    tests/test_pallas_tpu_lowering.py) and opt-in for future re-measurement.
    """
    return os.environ.get("PALLAS_CONV_S2", "0") == "1"


def pallas_interpret_forced() -> bool:
    """PALLAS_CONV_INTERPRET=1 forces the Pallas path in interpreter mode
    on any backend — the CPU test vehicle for the fused CHW-resident block
    paths (which are otherwise TPU-gated)."""
    return os.environ.get("PALLAS_CONV_INTERPRET", "0") == "1"


def pallas_path_available() -> bool:
    """Trace-time gate shared by :class:`Conv` and the fused block paths in
    ``models/blocks.py``: kernel enabled AND a backend it can run on.

    Multi-device processes are supported: the kernels carry
    custom_partitioning rules (above) so pjit runs them per-shard on the
    local batch instead of all-gathering (dw all-reduced via psum).
    """
    if not pallas_conv_enabled():
        return False
    if pallas_interpret_forced():
        return True
    return jax.default_backend() == "tpu"


def _eligible_channels(c_in: int, c_out: int) -> bool:
    """Measured win region (cli/bench_pallas_conv.py, v5e batch 20 bf16):
    1.6-4.1x for max(C)<=64 at 48^2-192^2; LOSES when either side reaches
    128 lanes (stock already tiles those well) — but that measurement
    includes per-conv boundary transposes, which the CHW-resident block
    paths eliminate; PALLAS_CONV_MAX_CH overrides the cutoff for A/Bs."""
    return max(c_in, c_out) <= int(os.environ.get("PALLAS_CONV_MAX_CH", "64"))


class Conv(_FallbackConv):
    """``nn.Conv`` drop-in routing eligible stride-1 SAME 3x3 convs through
    the CHW-lanes Pallas kernel (custom VJP, so training works).

    NAMED ``Conv`` so flax auto-naming keeps the parameter tree
    byte-identical to ``nn.Conv`` ("Conv_0/kernel", ...): checkpoints,
    transplant parity tests, and converters are unaffected by the toggle.
    On non-TPU backends (tests, CPU mesh) it falls back to the staircase
    drop-in (ops/fast_conv.py), itself stock unless FAST_CONV=1 — so both
    measurement toggles stay independently live.
    """

    @nn.compact
    def __call__(self, x, chw: Optional[Tuple[int, int]] = None,
                 phase_chw: Optional[Tuple[int, int]] = None):
        strides = self.strides or 1
        strides = ((strides, strides) if isinstance(strides, int)
                   else tuple(strides))
        ks = self.kernel_size
        ks = (ks, ks) if isinstance(ks, int) else tuple(ks)
        interpret = pallas_interpret_forced()
        if phase_chw is not None:
            # Stride-2 phase entry (ResConvDown downsample): x is the
            # phase-split (N, 4*C_in, (H/2)*(W/2)); phase_chw = PRE-downsample
            # (H, W).  Caller guarantees eligibility.
            h, w_cols = phase_chw
            assert x.ndim == 3 and x.shape[2] == (h // 2) * (w_cols // 2), \
                (x.shape, phase_chw)
            assert ks == (3, 3) and strides == (2, 2), (ks, strides)
            c_in = x.shape[1] // 4
            kernel = self.param("kernel", self.kernel_init,
                                (3, 3, c_in, self.features), self.param_dtype)
            bias = (self.param("bias", self.bias_init, (self.features,),
                               self.param_dtype) if self.use_bias else None)
            x, kernel, bias = nn.dtypes.promote_dtype(
                x, kernel, bias, dtype=self.dtype)
            y = conv3x3s2_phase_ad(x, kernel, h, w_cols, interpret)
            if bias is not None:
                y = y + bias[:, None].astype(y.dtype)
            return y
        if chw is not None:
            # CHW-resident entry (fused block paths in models/blocks.py):
            # x is (N, C_in, H*W); the CALLER guarantees eligibility
            # (pallas_path_available() + channel rule) before transposing
            # into this layout.  Supports the 3x3 kernel and the 1x1
            # shortcut (a plain channel matmul in this layout).
            h, w_cols = chw
            assert x.ndim == 3 and x.shape[2] == h * w_cols, (x.shape, chw)
            assert strides == (1, 1) and ks in ((3, 3), (1, 1)), (ks, strides)
            kernel = self.param("kernel", self.kernel_init,
                                (*ks, x.shape[1], self.features),
                                self.param_dtype)
            bias = (self.param("bias", self.bias_init, (self.features,),
                               self.param_dtype) if self.use_bias else None)
            x, kernel, bias = nn.dtypes.promote_dtype(
                x, kernel, bias, dtype=self.dtype)
            if ks == (3, 3):
                y = conv3x3_chw_ad(x, kernel, h, w_cols, interpret)
            else:
                y = jnp.einsum("if,nil->nfl", kernel[0, 0], x,
                               preferred_element_type=jnp.float32
                               ).astype(x.dtype)
            if bias is not None:
                y = y + bias[:, None].astype(y.dtype)
            return y
        base_ok = (
            pallas_path_available()
            and x.ndim == 4
            and ks == (3, 3)
            and strides == (1, 1)
            and self.padding in ("SAME", ((1, 1), (1, 1)))
            and self.feature_group_count == 1
            and self.kernel_dilation in (1, (1, 1), None)
            and self.input_dilation in (1, (1, 1), None)
        )
        eligible_chw = base_ok and _eligible_channels(x.shape[-1],
                                                      self.features)
        eligible_nl = (base_ok and pallas_nl_enabled()
                       and _eligible_channels_nl(x.shape[-1], self.features))
        if not (eligible_chw or eligible_nl):
            return super().__call__(x)
        kernel = self.param(
            "kernel", self.kernel_init,
            (3, 3, x.shape[-1], self.features), self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype)
        if eligible_chw:
            y = conv3x3_nhwc_ad(x, kernel, interpret=interpret)
        else:
            # large-channel stage: NL-sublanes kernel (native NHWC layout,
            # zero boundary transposes)
            y = conv3x3_nl_ad(x, kernel, interpret)
        if bias is not None:
            y = y + bias
        return y
