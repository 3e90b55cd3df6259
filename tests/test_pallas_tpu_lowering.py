"""Mosaic (TPU) lowering regression tests for every Pallas kernel.

The numerics tests run the kernels in interpret mode, which skips Mosaic's
MLIR lowering entirely — a kernel can pass all of them and still fail to
lower on the real chip (this caught us once: ``dynamic_slice_in_dim`` with
static Python indices still emits the ``dynamic_slice`` primitive, which
Mosaic TC has no lowering for).  ``jax.export.export(..., platforms=["tpu"])``
runs the exact per-platform lowering rule (pallas_call -> Mosaic module) on
a CPU-only host, so these tests fail on CI the moment a kernel uses a
non-lowerable primitive, without needing TPU hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import pytest

from cooperative_training_and_latent_space_data_augmentation_tpu.ops import (
    pallas_conv as pc,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.ops.pallas_kernels import (
    fused_percentile_mask,
)


def _export_tpu(fn, *args):
    exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert exp.out_avals  # lowering reached an output spec


N, C, CO, H, W = 2, 16, 32, 32, 32


def test_stride1_fwd_lowers_for_tpu():
    x = jnp.zeros((N, C, H * W), jnp.float32)
    w = jnp.zeros((3, 3, C, CO), jnp.float32)
    _export_tpu(functools.partial(pc.conv3x3_chw, H=H, W=W), x, w)


def test_stride1_dw_lowers_for_tpu():
    x = jnp.zeros((N, C, H * W), jnp.float32)
    dy = jnp.zeros((N, CO, H * W), jnp.float32)
    _export_tpu(functools.partial(pc._conv3x3_chw_dw, H=H, W=W), x, dy)


def test_stride1_full_vjp_lowers_for_tpu():
    x = jnp.zeros((N, C, H * W), jnp.float32)
    w = jnp.zeros((3, 3, C, CO), jnp.float32)

    def loss(x, w):
        return pc.conv3x3_chw_ad(x, w, H, W, False).sum()

    _export_tpu(jax.grad(loss, argnums=(0, 1)), x, w)


def test_stride2_fwd_lowers_for_tpu():
    xp = jnp.zeros((N, 4 * C, (H // 2) * (W // 2)), jnp.float32)
    w = jnp.zeros((3, 3, C, CO), jnp.float32)
    _export_tpu(functools.partial(pc.conv3x3s2_phase, H=H, W=W), xp, w)


def test_stride2_dx_lowers_for_tpu():
    dy = jnp.zeros((N, CO, (H // 2) * (W // 2)), jnp.float32)
    w = jnp.zeros((3, 3, C, CO), jnp.float32)
    _export_tpu(functools.partial(pc._conv3x3s2_phase_dx, H=H, W=W), dy, w)


def test_stride2_dw_lowers_for_tpu():
    xp = jnp.zeros((N, 4 * C, (H // 2) * (W // 2)), jnp.float32)
    dy = jnp.zeros((N, CO, (H // 2) * (W // 2)), jnp.float32)
    _export_tpu(functools.partial(pc._conv3x3s2_phase_dw, H=H, W=W), xp, dy)


def test_stride2_full_vjp_lowers_for_tpu():
    xp = jnp.zeros((N, 4 * C, (H // 2) * (W // 2)), jnp.float32)
    w = jnp.zeros((3, 3, C, CO), jnp.float32)

    def loss(xp, w):
        return pc.conv3x3s2_phase_ad(xp, w, H, W, False).sum()

    _export_tpu(jax.grad(loss, argnums=(0, 1)), xp, w)


def test_percentile_mask_lowers_for_tpu():
    sal = jnp.zeros((4, 128), jnp.float32)
    soft = jnp.zeros((4, 128), jnp.float32)
    _export_tpu(lambda s, v: fused_percentile_mask(s, 0.3, v), sal, soft)


def test_nl_fwd_lowers_for_tpu():
    x = jnp.zeros((2, 12, 12, 128), jnp.float32)
    w = jnp.zeros((3, 3, 128, 128), jnp.float32)
    _export_tpu(pc.conv3x3_nl, x, w)


def test_nl_fwd_bf16_lowers_for_tpu():
    x = jnp.zeros((4, 24, 24, 64), jnp.bfloat16)
    w = jnp.zeros((3, 3, 64, 128), jnp.bfloat16)
    _export_tpu(pc.conv3x3_nl, x, w)


def test_nl_dw_lowers_for_tpu():
    x = jnp.zeros((2 * 12 * 12, 128), jnp.float32)
    dy = jnp.zeros((2 * 12 * 12, 128), jnp.float32)
    _export_tpu(functools.partial(pc._conv3x3_nl_dw, H=12, W=12), x, dy)


def test_nl_full_vjp_lowers_for_tpu():
    x = jnp.zeros((2, 24, 24, 128), jnp.bfloat16)
    w = jnp.zeros((3, 3, 128, 64), jnp.bfloat16)

    def loss(x, w):
        return pc.conv3x3_nl_ad(x, w, False).sum()

    _export_tpu(jax.grad(loss, argnums=(0, 1)), x, w)


def test_b8_fwd_lowers_for_tpu():
    from cooperative_training_and_latent_space_data_augmentation_tpu.ops import (
        pallas_conv_blocked as pb,
    )

    x = jnp.zeros((2, 192, 192, 16), jnp.bfloat16)
    w = jnp.zeros((3, 3, 16, 16), jnp.bfloat16)
    _export_tpu(pb.conv3x3_b8, x, w)


def test_b8_full_vjp_lowers_for_tpu():
    from cooperative_training_and_latent_space_data_augmentation_tpu.ops import (
        pallas_conv_blocked as pb,
    )

    x = jnp.zeros((2, 48, 48, 32), jnp.bfloat16)
    w = jnp.zeros((3, 3, 32, 64), jnp.bfloat16)

    def loss(x, w):
        return pb.conv3x3_b8_ad(x, w, False).sum()

    _export_tpu(jax.grad(loss, argnums=(0, 1)), x, w)
