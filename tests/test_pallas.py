"""Pallas kernel tests (interpret mode on the CPU backend).

Validates the fused sort-free percentile mask against the portable jnp
reference implementation in ops/masking.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cooperative_training_and_latent_space_data_augmentation_tpu.ops import masking
from cooperative_training_and_latent_space_data_augmentation_tpu.ops.pallas_kernels import (
    fused_percentile_mask,
)


def _reference_hard_mask(sal, p):
    d = sal.shape[1]
    idx = int(np.clip(np.floor(d * p), 0, d - 1))
    sorted_desc = -np.sort(-sal, axis=1)
    thresh = sorted_desc[:, idx][:, None]
    return np.where(sal > thresh, 0.0, 1.0)


def _zeros(sal):
    return jnp.zeros(sal.shape, jnp.float32)


@pytest.mark.parametrize("p", [0.0, 0.1, 1 / 3.0, 0.5, 0.99])
@pytest.mark.parametrize("shape", [(4, 128), (20, 144), (3, 7)])
def test_hard_mask_matches_sort_reference(p, shape, np_rng):
    sal = np_rng.randn(*shape).astype(np.float32)
    out = fused_percentile_mask(jnp.asarray(sal), jnp.asarray(p),
                                _zeros(sal), interpret=True)
    np.testing.assert_array_equal(np.asarray(out), _reference_hard_mask(sal, p))


def test_hard_mask_tie_semantics():
    # elements EQUAL to the threshold value stay unmasked (strict >,
    # model_util.py:230-236)
    sal = np.asarray([[5.0, 5.0, 3.0, 1.0]], np.float32)
    # p=0.25 -> idx=1 -> sorted_desc[1]=5.0 -> nothing strictly greater
    out = fused_percentile_mask(jnp.asarray(sal), jnp.asarray(0.25),
                                _zeros(sal), interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.ones_like(sal))
    # p=0.5 -> idx=2 -> thresh=3.0 -> the two 5.0s masked
    out = fused_percentile_mask(jnp.asarray(sal), jnp.asarray(0.5),
                                _zeros(sal), interpret=True)
    np.testing.assert_array_equal(np.asarray(out), [[0.0, 0.0, 1.0, 1.0]])


def test_soft_mask_matches_jnp_path_exactly(np_rng):
    # the kernel takes the SAME uniforms the jnp path draws, so soft masks
    # must be bit-identical to the portable implementation
    sal = jnp.asarray(np_rng.randn(8, 64).astype(np.float32))
    p = jnp.asarray(0.5)
    rng = jax.random.PRNGKey(3)
    soft_vals = 0.5 * jax.random.uniform(rng, sal.shape, jnp.float32)
    out = np.asarray(fused_percentile_mask(sal, p, soft_vals, interpret=True))
    ref = np.asarray(masking._threshold_mask(sal, p, 64, True, rng))
    np.testing.assert_array_equal(out, ref)
    hard = _reference_hard_mask(np.asarray(sal), 0.5)
    masked_vals = out[hard == 0.0]
    assert masked_vals.size > 0
    assert np.all((masked_vals >= 0.0) & (masked_vals < 0.5))


def test_threshold_mask_dispatch_cpu_uses_jnp(np_rng):
    # on the CPU backend _threshold_mask must take the portable path and
    # agree with the sort-based math
    sal = jnp.asarray(np_rng.randn(4, 32).astype(np.float32))
    mask = masking._threshold_mask(sal, jnp.asarray(0.3), 32, False,
                                   jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(mask),
                                  _reference_hard_mask(np.asarray(sal), 0.3))
