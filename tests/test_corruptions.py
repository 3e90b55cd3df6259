"""Tests for the jnp TorchIO-style corruption ops (ACDC-C generator)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cooperative_training_and_latent_space_data_augmentation_tpu.ops import corruptions as C


def _phantom(hw=(64, 64)):
    yy, xx = np.mgrid[0:hw[0], 0:hw[1]].astype(np.float32)
    d = np.sqrt((yy - hw[0] / 2) ** 2 + (xx - hw[1] / 2) ** 2)
    img = np.clip(1.0 - d / (hw[0] / 2), 0, 1)
    return jnp.asarray(img)


@pytest.mark.parametrize("name", ["RandomBias", "RandomSpike", "RandomGhosting",
                                  "RandomMotion"])
def test_corruption_valid_output(name):
    img = _phantom()
    out = C.CORRUPTIONS[name](jax.random.PRNGKey(0), img)
    out = np.asarray(out)
    assert out.shape == img.shape
    assert np.isfinite(out).all()
    assert out.min() >= -1e-6 and out.max() <= 1 + 1e-6
    # actually corrupts
    assert not np.allclose(out, np.asarray(img), atol=1e-3)
    # deterministic per key
    out2 = np.asarray(C.CORRUPTIONS[name](jax.random.PRNGKey(0), img))
    np.testing.assert_allclose(out, out2, atol=1e-6)
    # varies across keys
    out3 = np.asarray(C.CORRUPTIONS[name](jax.random.PRNGKey(1), img))
    assert not np.allclose(out, out3, atol=1e-4)


def test_bias_field_is_smooth_multiplicative():
    img = _phantom()
    out = np.asarray(C.random_bias_field(jax.random.PRNGKey(2), img))
    # bias preserves gross structure: high correlation with the original
    corr = np.corrcoef(out.ravel(), np.asarray(img).ravel())[0, 1]
    assert corr > 0.9


def test_corrupt_volume_coherent():
    """One shared parameter draw per volume (like a single TorchIO transform
    per patient): identical slices get identical corruption."""
    base = _phantom()
    vol = jnp.stack([base, base, base])
    out = C.corrupt_volume(jax.random.PRNGKey(0), vol, "RandomGhosting")
    assert out.shape == vol.shape
    o = np.asarray(out)
    np.testing.assert_allclose(o[0], o[1], rtol=1e-6)
    # ...while different keys give different artifacts
    out2 = C.corrupt_volume(jax.random.PRNGKey(1), vol, "RandomGhosting")
    assert not np.allclose(o[0], np.asarray(out2)[0])


def test_corruptions_jittable():
    vol = jnp.stack([_phantom() for _ in range(2)])
    for name in C.CORRUPTIONS:
        out = C.corrupt_volume_jit(jax.random.PRNGKey(0), vol, name)
        assert np.isfinite(np.asarray(out)).all(), name
