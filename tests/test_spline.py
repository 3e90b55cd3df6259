"""Golden tests: ops/spline.map_coordinates_cubic vs scipy order-3."""

import numpy as np
import pytest
import jax.numpy as jnp
from scipy import ndimage

from cooperative_training_and_latent_space_data_augmentation_tpu.ops.spline import (
    map_coordinates_cubic,
    prefilter_matrix,
    spline_coefficients,
)


@pytest.mark.parametrize("mode", ["mirror", "reflect", "nearest"])
def test_prefilter_matches_scipy(mode):
    rng = np.random.RandomState(0)
    x = rng.rand(17, 13).astype(np.float64)
    ref = ndimage.spline_filter(x, order=3, mode=mode)
    got = np.asarray(spline_coefficients(jnp.asarray(x[..., None]), mode))[..., 0]
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-4)


@pytest.mark.parametrize("mode", ["mirror", "reflect", "nearest"])
def test_map_coordinates_cubic_matches_scipy(mode):
    rng = np.random.RandomState(1)
    img = rng.rand(24, 20).astype(np.float64)
    # sample coords: interior + out-of-range (exercises coordinate folding)
    ys = rng.uniform(-4, 27, (16, 16))
    xs = rng.uniform(-4, 23, (16, 16))
    ref = ndimage.map_coordinates(img, [ys, xs], order=3, mode=mode)
    got = np.asarray(map_coordinates_cubic(
        jnp.asarray(img[..., None]), jnp.asarray(ys), jnp.asarray(xs),
        mode=mode))[..., 0]
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-4)


def test_map_coordinates_identity():
    """Sampling at the integer grid reproduces the image exactly (the
    prefilter inverts the B-spline blur — interpolating spline property)."""
    rng = np.random.RandomState(2)
    img = rng.rand(12, 12, 3).astype(np.float32)
    yy, xx = np.meshgrid(np.arange(12.0), np.arange(12.0), indexing="ij")
    out = np.asarray(map_coordinates_cubic(
        jnp.asarray(img), jnp.asarray(yy), jnp.asarray(xx), mode="mirror"))
    np.testing.assert_allclose(out, img, rtol=0, atol=1e-4)


def test_prefilter_matrix_small_sizes():
    for n in (1, 2, 3):
        for mode in ("mirror", "reflect", "nearest"):
            m = prefilter_matrix(n, mode)
            assert m.shape == (n, n)
            assert np.isfinite(m).all()
