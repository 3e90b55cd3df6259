"""Output-blocked Pallas 3x3 conv for the small-channel stages (B8 kernel).

Round-4 knock-out profiling (cli/profile_step_knockout.py + bench_nl_conv)
pinned the cooperative step's remaining cost in the <=64-channel convs
themselves: a conv with C_out=16 fills only 16 of the MXU's 128 output
rows (CHW kernel: M=C_out) or 16 of 128 lanes (NL layout: N=C_out) — a
hard ~12.5 % utilization ceiling no layout shuffle fixes while one matmul
row/col carries a single output channel.

This kernel RAISES the ceiling by blocking 8 consecutive output pixels of
an image row into one matmul column group:

    out(HW/8, 8*C_out) = P'(HW/8, 30*C_in) @ W'(30*C_in, 8*C_out)

Each P' row carries the 3x10 input window covering its 8 output pixels
(SAME padding), so lanes now hold 8*C_out = 128+ at C_out>=16 — full MXU
fill — at the cost of 30/9 = 3.33x logical FLOPs (the window overlap).
Net ceiling: 9/30 = 30 % of peak, ~2.4x above the unblocked kernels; the
weight gradient inherits the same full-fill geometry (M=30*C_in, N=8*C_out
both >=128), fixing the dw fill problem as well.

Layout mechanics (all shapes per image, grid over the batch):
  * x arrives as (HW/8, 8*C_in) — the BLOCKED row layout, a pure row-major
    reshape of NHWC (XLA relayout at the boundary, no transpose).
  * The 3x10 window of block row r = 3 window rows x [last pixel of block
    q-1 | block q | first pixel of block q+1] where q = r + (di-1)*(W/8):
    whole-block SUBLANE rolls (f32 staging - Mosaic rotate is 32-bit) plus
    C_in-lane edge slices, concatenated on lanes.
  * SAME-padding masks are PER-ROW selects (top/bottom image rows for the
    window row, first/last block column for the +-1 pixel slices) — no
    per-lane masking needed because 8 | W keeps blocks within image rows.
  * W'[(di, c, i), (j, o)] = w[di, c-j, i, o] for 0 <= c-j <= 2 else 0,
    c in 0..9 — precomputed outside the kernel (tiny, trace-time).

dx is this same kernel with flipped/transposed weights (a SAME 3x3 conv's
input-gradient IS a SAME 3x3 conv); dw accumulates P'^T @ dY' over the
image grid and folds the (30*C_in, 8*C_out) wall back to HWIO outside.

Matches lax.conv_general_dilated bit-for-bit in f32 (tests/
test_pallas_conv_blocked.py); multi-chip via custom_partitioning with the
same batch-DP rules as the other kernels (forward/dx shard-local, dw psum).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec

B = 8  # output pixels per block (lane groups of 8*C_out)


def blocked_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C_in, C_out) HWIO -> W' (30*C_in, 8*C_out).

    Row (di, c, i), column (j, o):  W'= w[di, c-j, i, o] if 0<=c-j<3 else 0.
    """
    kh, kw, c_in, c_out = w.shape
    assert (kh, kw) == (3, 3), w.shape
    cols = []
    for j in range(B):
        # pad taps into the 10-wide window at column offset j
        wj = jnp.pad(w, ((0, 0), (j, B + 1 - j - 2), (0, 0), (0, 0)))
        cols.append(wj)                                   # (3, 10, C_in, C_out)
    # stack j on a new axis -> (3, 10, C_in, B, C_out) -> rows (di, c, i)
    wall = jnp.stack(cols, axis=3)
    return wall.reshape(3 * (B + 2) * c_in, B * c_out)


def _roll_rows(x2d, shift: int):
    """Static sublane roll (axis 0); f32 only (Mosaic rotate constraint)."""
    if shift % x2d.shape[0] == 0:
        return x2d
    return pltpu.roll(x2d, shift % x2d.shape[0], 0)


def _build_p_b8(xb, H: int, W: int, C: int):
    """P' (HW/8, 30*C) from the blocked image xb (HW/8, 8*C)."""
    rows = xb.shape[0]                                   # HW/8
    wb = W // B                                          # blocks per image row
    xf = xb.astype(jnp.float32)
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    first_col = (r % wb) == 0
    last_col = (r % wb) == wb - 1
    parts = []
    for di in range(3):
        q = (di - 1) * wb
        mid = _roll_rows(xf, -q)
        prev = _roll_rows(xf, -(q - 1))
        nxt = _roll_rows(xf, -(q + 1))
        if di == 0:
            row_ok = r >= wb                             # needs image row h-1
        elif di == 2:
            row_ok = r < rows - wb                       # needs image row h+1
        else:
            row_ok = jnp.ones((rows, 1), jnp.bool_)
        # c = 0: pixel 8wb-1 = last pixel of block q-1 (invalid at col 0)
        left = jnp.where(row_ok & ~first_col, prev[:, (B - 1) * C:], 0.0)
        # c = 1..8: block q itself
        body = jnp.where(row_ok, mid, 0.0)
        # c = 9: pixel 8wb+8 = first pixel of block q+1 (invalid at last col)
        right = jnp.where(row_ok & ~last_col, nxt[:, :C], 0.0)
        parts += [left, body, right]
    return jnp.concatenate(parts, axis=1).astype(xb.dtype)  # (HW/8, 30*C)


def _b8_kernel(x_ref, w_ref, o_ref, *, H: int, W: int, C: int):
    p = _build_p_b8(x_ref[0], H, W, C)
    acc = jax.lax.dot_general(
        p, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (HW/8, 8*C_out)
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3_b8(x: jnp.ndarray, w: jnp.ndarray, *, interpret: bool = False):
    """SAME stride-1 3x3 conv, output-blocked (B=8) layout.

    Args:
      x: (N, H, W, C_in) NHWC; requires W % 8 == 0 and H >= 2.
      w: (3, 3, C_in, C_out) HWIO.
    Returns (N, H, W, C_out) in x dtype.
    """
    n, h, w_cols, c_in = x.shape
    assert w_cols % B == 0 and h >= 2, (x.shape,)
    c_out = w.shape[-1]
    rows = h * w_cols // B
    w_all = blocked_weights(w).astype(x.dtype)
    kern = functools.partial(_b8_kernel, H=h, W=w_cols, C=c_in)
    out = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, rows, B * c_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * (B + 2) * c_in, B * c_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, B * c_out), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, rows, B * c_out), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x.reshape(n, rows, B * c_in), w_all)
    return out.reshape(n, h, w_cols, c_out)


def _b8_dw_kernel(x_ref, dy_ref, o_ref, *, H: int, W: int, C: int):
    """dw wall: accumulate P'^T @ dY' over the image grid.
    x_ref (1, HW/8, 8*C_in), dy_ref (1, HW/8, 8*C_out),
    o_ref (30*C_in, 8*C_out) f32."""
    i = pl.program_id(0)
    p = _build_p_b8(x_ref[0], H, W, C)
    acc = jax.lax.dot_general(
        p, dy_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (30*C_in, 8*C_out)

    @pl.when(i == 0)
    def _init():
        o_ref[...] = acc

    @pl.when(i > 0)
    def _acc():
        o_ref[...] += acc


def fold_dw_wall(wall: jnp.ndarray, c_in: int, c_out: int) -> jnp.ndarray:
    """(30*C_in, 8*C_out) wall -> (3, 3, C_in, C_out): tap (di, kj) appears
    once per output position j at window column c = j + kj; sum over j."""
    wall = wall.reshape(3, B + 2, c_in, B, c_out)
    taps = []
    for kj in range(3):
        # gather c = j + kj over j: diagonal slice
        taps.append(sum(wall[:, j + kj, :, j, :] for j in range(B)))
    return jnp.stack(taps, axis=1)                       # (3, 3, C_in, C_out)


@functools.partial(jax.jit, static_argnames=("H", "W", "C", "interpret"))
def _conv3x3_b8_dw(xb, dyb, *, H: int, W: int, C: int,
                   interpret: bool = False):
    """d(conv)/dw from blocked activations/cotangents -> HWIO f32."""
    n, rows, _ = xb.shape
    c_out = dyb.shape[-1] // B
    kern = functools.partial(_b8_dw_kernel, H=H, W=W, C=C)
    wall = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, rows, B * C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, B * c_out), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3 * (B + 2) * C, B * c_out),
                               lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3 * (B + 2) * C, B * c_out),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xb, dyb)
    return fold_dw_wall(wall, C, c_out)


def _flip_w(w: jnp.ndarray) -> jnp.ndarray:
    return jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)


# ----------------------- multi-chip partitioning (batch DP) -----------------------


def _dim0_axes(sharding) -> Tuple:
    spec = getattr(sharding, "spec", None)
    if spec is None or len(spec) == 0 or spec[0] is None:
        return ()
    a = spec[0]
    return tuple(a) if isinstance(a, tuple) else (a,)


def _batch_spec(axes, rank: int) -> PartitionSpec:
    return PartitionSpec(axes if axes else None, *([None] * (rank - 1)))


@functools.lru_cache(maxsize=None)
def _sharded_b8_fwd(interpret: bool):
    fn = custom_partitioning(
        lambda x, w: conv3x3_b8(x, w, interpret=interpret))

    def partition(mesh, arg_shapes, result_shape):
        axes = _dim0_axes(arg_shapes[0].sharding)
        xs = NamedSharding(mesh, _batch_spec(axes, 4))
        ws = NamedSharding(mesh, PartitionSpec(None, None, None, None))
        rs = NamedSharding(mesh, _batch_spec(axes, 4))
        return mesh, (lambda x, w: conv3x3_b8(x, w, interpret=interpret)), \
            rs, (xs, ws)

    def infer_sharding(mesh, arg_shapes, result_shape):
        axes = _dim0_axes(arg_shapes[0].sharding)
        return NamedSharding(mesh, _batch_spec(axes, 4))

    fn.def_partition(partition=partition,
                     infer_sharding_from_operands=infer_sharding,
                     sharding_rule="b h wd i, kh kw i o -> b h wd o")
    return fn


@functools.lru_cache(maxsize=None)
def _sharded_b8_dw(H: int, W: int, C: int, interpret: bool):
    fn = custom_partitioning(
        lambda xb, dyb: _conv3x3_b8_dw(xb, dyb, H=H, W=W, C=C,
                                       interpret=interpret))

    def partition(mesh, arg_shapes, result_shape):
        axes = _dim0_axes(arg_shapes[0].sharding)
        xs = NamedSharding(mesh, _batch_spec(axes, 3))
        ys = NamedSharding(mesh, _batch_spec(axes, 3))
        rs = NamedSharding(mesh, PartitionSpec(None, None, None, None))

        def lower_fn(xb, dyb):
            dw = _conv3x3_b8_dw(xb, dyb, H=H, W=W, C=C, interpret=interpret)
            return jax.lax.psum(dw, axes) if axes else dw

        return mesh, lower_fn, rs, (xs, ys)

    def infer_sharding(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, PartitionSpec(None, None, None, None))

    fn.def_partition(partition=partition,
                     infer_sharding_from_operands=infer_sharding,
                     sharding_rule="b r i, b r o -> kh kw i o",
                     reduction_factors=("b",))
    return fn


def _multi_device() -> bool:
    return jax.device_count() > 1


def _b8_fwd_dispatch(x, w, interpret):
    if _multi_device():
        return _sharded_b8_fwd(interpret)(x, w)
    return conv3x3_b8(x, w, interpret=interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_b8_ad(x, w, interpret: bool = False):
    """Differentiable output-blocked 3x3 SAME conv (custom VJP; batch-DP
    custom_partitioning under pjit).  Matches jax.grad of
    lax.conv_general_dilated — pinned in tests/test_pallas_conv_blocked.py."""
    return _b8_fwd_dispatch(x, w, interpret)


def _b8_ad_fwd(x, w, interpret):
    return _b8_fwd_dispatch(x, w, interpret), (x, w)


def _b8_ad_bwd(interpret, res, dy):
    x, w = res
    n, h, w_cols, c_in = x.shape
    c_out = dy.shape[-1]
    rows = h * w_cols // B
    dx = _b8_fwd_dispatch(dy, _flip_w(w), interpret)
    xb = x.reshape(n, rows, B * c_in)
    dyb = dy.reshape(n, rows, B * c_out)
    if _multi_device():
        dw = _sharded_b8_dw(h, w_cols, c_in, interpret)(xb, dyb)
    else:
        dw = _conv3x3_b8_dw(xb, dyb, H=h, W=w_cols, C=c_in,
                            interpret=interpret)
    return dx, dw.astype(w.dtype)


conv3x3_b8_ad.defvjp(_b8_ad_fwd, _b8_ad_bwd)


def b8_eligible(h: int, w: int, c_in: int, c_out: int) -> bool:
    """Shape gate: blocked rows need 8 | W, >=2 image rows, and lane slices
    at C_in granularity (C_in >= 8 keeps them tile-friendly)."""
    return w % B == 0 and h >= 2 and c_in >= 8 and max(c_in, c_out) <= 64
