"""Staircase packed conv (ops/fast_conv.py) vs stock lax.conv.

The staircase reformulation must be element-exact (to f32 accumulation
reorder tolerance) against ``lax.conv_general_dilated`` for every channel
plan in the FCN_16 network, under both f32 and bf16, and under grad.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from cooperative_training_and_latent_space_data_augmentation_tpu.ops.fast_conv import (
    pick_pack_factor,
    staircase_conv3x3,
)


def stock(x, w):
    # matches flax nn.Conv's lowering (no preferred_element_type)
    return lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _mk(h, w, cin, cout, dtype=jnp.float32, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(k1, (2, h, w, cin), dtype)
    ker = jax.random.normal(k2, (3, 3, cin, cout), dtype) * 0.1
    return x, ker


# the network's stride-1 3x3 channel plans (models/encoder_decoder.py)
PLANS = [(192, 192, 1, 16), (192, 192, 16, 16), (96, 96, 16, 32),
         (96, 96, 32, 32), (48, 48, 32, 64), (48, 48, 64, 64),
         (24, 24, 64, 128), (24, 24, 128, 128), (12, 12, 128, 128)]


@pytest.mark.parametrize("h,w,cin,cout", PLANS)
def test_matches_stock_f32(h, w, cin, cout):
    x, ker = _mk(h, w, cin, cout)
    got = staircase_conv3x3(x, ker)
    np.testing.assert_allclose(np.asarray(got), np.asarray(stock(x, ker)),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("f", [2, 4, 8])
def test_explicit_factors(f):
    x, ker = _mk(32, 32, 16, 16)
    got = staircase_conv3x3(x, ker, f=f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(stock(x, ker)),
                               rtol=1e-5, atol=1e-5)


def test_bf16_close_to_stock_bf16():
    x, ker = _mk(48, 48, 16, 16, dtype=jnp.bfloat16)
    got = np.asarray(staircase_conv3x3(x, ker, f=8)).astype(np.float32)
    want = np.asarray(stock(x, ker)).astype(np.float32)
    # both accumulate in f32; only the bf16 output rounding differs
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_grad_matches_stock():
    x, ker = _mk(24, 24, 16, 16)

    def loss_fast(x_, w_):
        return jnp.sum(staircase_conv3x3(x_, w_, f=4) ** 2)

    def loss_stock(x_, w_):
        return jnp.sum(stock(x_, w_) ** 2)

    gx_f, gw_f = jax.grad(loss_fast, argnums=(0, 1))(x, ker)
    gx_s, gw_s = jax.grad(loss_stock, argnums=(0, 1))(x, ker)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_s),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_s),
                               rtol=1e-4, atol=1e-4)


def test_pick_pack_factor():
    # full-lane packing for the small-channel stages
    assert pick_pack_factor(192, 16, 16) == 8
    assert pick_pack_factor(96, 32, 32) == 4
    assert pick_pack_factor(48, 64, 64) == 2
    # >=128 channels: packing cannot win
    assert pick_pack_factor(12, 128, 128) == 1


def test_nondividing_width_still_exact():
    x, ker = _mk(30, 30, 16, 16)  # f=8 won't divide 30; picker adapts
    got = staircase_conv3x3(x, ker)
    np.testing.assert_allclose(np.asarray(got), np.asarray(stock(x, ker)),
                               rtol=1e-5, atol=1e-5)
