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


def _conv_ad_fwd(x_chw, w, H, W, interpret):
    return _conv_fwd_dispatch(x_chw, w, H, W, interpret), (x_chw, w)


def _conv_ad_bwd(H, W, interpret, res, dy):
    x_chw, w = res
    dx = _conv_fwd_dispatch(dy, _flip_w(w), H, W, interpret)
    dw = _conv_dw_dispatch(x_chw, dy, H, W, interpret)
    return dx, dw.astype(w.dtype)


conv3x3_chw_ad.defvjp(_conv_ad_fwd, _conv_ad_bwd)


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
    def __call__(self, x, chw: Optional[Tuple[int, int]] = None):
        strides = self.strides or 1
        strides = ((strides, strides) if isinstance(strides, int)
                   else tuple(strides))
        ks = self.kernel_size
        ks = (ks, ks) if isinstance(ks, int) else tuple(ks)
        interpret = pallas_interpret_forced()
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
        eligible = (
            pallas_path_available()
            and x.ndim == 4
            and ks == (3, 3)
            and strides == (1, 1)
            and self.padding in ("SAME", ((1, 1), (1, 1)))
            and self.feature_group_count == 1
            and self.kernel_dilation in (1, (1, 1), None)
            and self.input_dilation in (1, (1, 1), None)
            and _eligible_channels(x.shape[-1], self.features)
        )
        if not eligible:
            return super().__call__(x)
        kernel = self.param(
            "kernel", self.kernel_init,
            (3, 3, x.shape[-1], self.features), self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype)
        y = conv3x3_nhwc_ad(x, kernel, interpret=interpret)
        if bias is not None:
            y = y + bias
        return y
