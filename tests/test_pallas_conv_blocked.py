"""Output-blocked (B8) Pallas conv tests — interpret mode on CPU.

Validates ops/pallas_conv_blocked.py against stock lax.conv_general_dilated
for the small-channel 3x3 SAME stages (the 12.5%-MXU-fill stages of
medseg/models/ebm/encoder_decoder.py:19-348's conv stack, re-designed in
models/blocks.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from cooperative_training_and_latent_space_data_augmentation_tpu.ops.pallas_conv_blocked import (
    b8_eligible,
    blocked_weights,
    conv3x3_b8,
    conv3x3_b8_ad,
    fold_dw_wall,
)


def _stock(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("n,h,w,cin,cout", [
    (2, 16, 16, 16, 16),   # square, C_out fills 128 lanes exactly
    (1, 12, 16, 8, 4),     # min C_in, tiny C_out, non-square
    (3, 8, 24, 16, 32),    # 3 blocks per row
    (2, 10, 32, 32, 16),   # wider image
])
def test_b8_matches_stock_conv(n, h, w, cin, cout, np_rng):
    x = jnp.asarray(np_rng.randn(n, h, w, cin).astype(np.float32))
    k = jnp.asarray(0.2 * np_rng.randn(3, 3, cin, cout).astype(np.float32))
    got = conv3x3_b8(x, k, interpret=True)
    want = _stock(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_b8_edge_tap_counts(np_rng):
    """All-ones input/kernel counts in-bounds taps: corners 4, edges 6,
    interior 9 — SAME zero-padding semantics, incl. the block-boundary
    columns (7->8) where the window crosses blocks."""
    h, w, c = 8, 16, 8
    x = jnp.ones((1, h, w, c), jnp.float32)
    k = jnp.ones((3, 3, c, 2), jnp.float32)
    out = np.asarray(conv3x3_b8(x, k, interpret=True))[0, :, :, 0]
    assert out[0, 0] == 4 * c and out[0, -1] == 4 * c
    assert out[0, 5] == 6 * c and out[3, 0] == 6 * c
    assert out[3, 7] == 9 * c and out[3, 8] == 9 * c  # block seam interior


def test_b8_blocks_do_not_leak_across_images(np_rng):
    h, w, c = 8, 16, 8
    x = jnp.stack([jnp.full((h, w, c), float(k + 1)) for k in range(3)])
    k = jnp.ones((3, 3, c, 16), jnp.float32)
    got = conv3x3_b8(x, k, interpret=True)
    for i in range(3):
        alone = conv3x3_b8(x[i:i + 1], k, interpret=True)
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(alone[0]),
                                   rtol=1e-6)


def test_b8_grad_matches_stock(np_rng):
    n, h, w, cin, cout = 2, 8, 16, 16, 16
    x = jnp.asarray(np_rng.randn(n, h, w, cin).astype(np.float32))
    k = jnp.asarray(0.1 * np_rng.randn(3, 3, cin, cout).astype(np.float32))
    cot = jnp.asarray(np_rng.randn(n, h, w, cout).astype(np.float32))

    def f_pallas(x, k):
        return jnp.sum(conv3x3_b8_ad(x, k, True) * cot)

    def f_stock(x, k):
        return jnp.sum(_stock(x, k) * cot)

    gx_p, gw_p = jax.grad(f_pallas, argnums=(0, 1))(x, k)
    gx_s, gw_s = jax.grad(f_stock, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_s),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_s),
                               rtol=1e-4, atol=1e-4)


def test_blocked_weights_fold_roundtrip(np_rng):
    """fold_dw_wall is the adjoint of blocked_weights' placement: folding
    the wall of a one-hot cotangent recovers each tap exactly once per
    output position."""
    cin, cout = 8, 4
    w = jnp.asarray(np_rng.randn(3, 3, cin, cout).astype(np.float32))
    wall = blocked_weights(w)
    assert wall.shape == (30 * cin, 8 * cout)
    folded = fold_dw_wall(wall, cin, cout)
    # each tap appears at 8 (j, c=j+kj) positions; fold sums them -> 8x
    np.testing.assert_allclose(np.asarray(folded), 8 * np.asarray(w),
                               rtol=1e-6)


def test_b8_sharded_matches_single(np_rng):
    from jax.sharding import NamedSharding, PartitionSpec

    from cooperative_training_and_latent_space_data_augmentation_tpu.parallel.mesh import (
        make_mesh,
    )

    n, h, w, cin, cout = 8, 8, 16, 16, 16
    x = jnp.asarray(np_rng.randn(n, h, w, cin).astype(np.float32))
    k = jnp.asarray(0.1 * np_rng.randn(3, 3, cin, cout).astype(np.float32))
    cot = jnp.asarray(np_rng.randn(n, h, w, cout).astype(np.float32))

    def loss(x, k):
        return jnp.sum(conv3x3_b8_ad(x, k, True) * cot)

    gx1, gw1 = jax.grad(loss, argnums=(0, 1))(x, k)
    mesh = make_mesh()
    xs = jax.device_put(x, NamedSharding(mesh, PartitionSpec("data")))
    ks = jax.device_put(k, NamedSharding(mesh, PartitionSpec()))
    gx8, gw8 = jax.jit(jax.grad(loss, argnums=(0, 1)))(xs, ks)
    np.testing.assert_allclose(np.asarray(gx8), np.asarray(gx1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw8), np.asarray(gw1),
                               rtol=1e-4, atol=1e-4)


def test_b8_eligibility():
    assert b8_eligible(192, 192, 16, 16)
    assert b8_eligible(48, 48, 32, 64)
    assert not b8_eligible(192, 192, 1, 16)    # C_in < 8: inc conv1
    assert not b8_eligible(24, 24, 64, 128)    # >64ch: stock/NL domain
    assert not b8_eligible(8, 12, 16, 16)      # W not divisible by 8
