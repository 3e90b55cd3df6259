"""Golden tests for latent masking: percentile threshold semantics must match
the reference's sort(desc)[:, int(dim*p)] indexing (model_util.py:230-244)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cooperative_training_and_latent_space_data_augmentation_tpu.ops import masking


def _linear_decoder(w):
    """Toy decoder: per-channel weighted broadcast so latent grads are analytic."""

    def decoder_fn(z):
        # z: (N, h, w, C) -> out: (N, h, w, C) elementwise scale
        return z * w

    return decoder_fn


def _numpy_channel_mask(grad, percentile, soft_vals=None):
    """Hand-computed reference: mask channels whose mean grad exceeds the value
    at sorted-descending index int(C*p)."""
    n, h, w, c = grad.shape
    sal = grad.reshape(n, h * w, c).mean(axis=1)  # N, C
    idx = int(np.floor(c * percentile))
    thresh = -np.sort(-sal, axis=1)[:, idx][:, None]
    exceed = sal > thresh
    if soft_vals is None:
        return np.where(exceed, 0.0, 1.0)
    return np.where(exceed, soft_vals, 1.0)


def test_channel_mask_hard_golden():
    rng = np.random.RandomState(0)
    z = rng.rand(2, 4, 4, 8).astype(np.float32)
    w = rng.randn(8).astype(np.float32)
    target = np.zeros((2, 4, 4, 8), np.float32)
    decoder_fn = _linear_decoder(jnp.asarray(w))

    masked, mask = masking.mask_latent_code_channel_wise(
        jnp.asarray(z), decoder_fn, jnp.asarray(target), jax.random.PRNGKey(0),
        percentile=0.5, random=False, loss_name="mse", if_soft=False)

    # analytic grad of mean((z*w - 0)^2) wrt z = 2*z*w^2 / numel
    grad = 2 * z * (w ** 2) / z.size
    expected = _numpy_channel_mask(grad, 0.5)
    np.testing.assert_allclose(np.asarray(mask).reshape(2, 8), expected, atol=1e-6)
    np.testing.assert_allclose(np.asarray(masked), z * expected[:, None, None, :],
                               atol=1e-6)


def test_spatial_mask_hard_golden():
    rng = np.random.RandomState(1)
    z = rng.rand(2, 4, 4, 8).astype(np.float32)
    w = rng.randn(8).astype(np.float32)
    target = np.zeros((2, 4, 4, 8), np.float32)
    decoder_fn = _linear_decoder(jnp.asarray(w))

    masked, mask = masking.mask_latent_code_spatial_wise(
        jnp.asarray(z), decoder_fn, jnp.asarray(target), jax.random.PRNGKey(0),
        percentile=0.25, random=False, loss_name="mse", if_soft=False)

    grad = 2 * z * (w ** 2) / z.size
    sal = grad.mean(axis=-1).reshape(2, 16)
    idx = int(np.floor(16 * 0.25))
    thresh = -np.sort(-sal, axis=1)[:, idx][:, None]
    expected = np.where(sal > thresh, 0.0, 1.0).reshape(2, 4, 4, 1)
    np.testing.assert_allclose(np.asarray(mask), expected, atol=1e-6)
    np.testing.assert_allclose(np.asarray(masked), z * expected, atol=1e-6)


def test_soft_mask_values_in_range():
    rng = np.random.RandomState(2)
    z = rng.rand(2, 4, 4, 8).astype(np.float32)
    decoder_fn = _linear_decoder(jnp.ones(8))
    _, mask = masking.mask_latent_code_channel_wise(
        jnp.asarray(z), decoder_fn, jnp.zeros_like(jnp.asarray(z)),
        jax.random.PRNGKey(3), percentile=0.5, random=False,
        loss_name="mse", if_soft=True)
    m = np.asarray(mask).ravel()
    masked_vals = m[m < 1.0]
    assert len(masked_vals) > 0
    assert np.all((masked_vals >= 0) & (masked_vals <= 0.5))  # 0.5*U(0,1)


def test_random_threshold_bounded():
    """random_threshold=True draws p ~ U(0,1)*max -> never masks more than
    int(C*max) channels (model_util.py:228-229)."""
    rng = np.random.RandomState(3)
    z = rng.rand(4, 4, 4, 16).astype(np.float32)
    decoder_fn = _linear_decoder(jnp.ones(16))
    for seed in range(5):
        _, mask = masking.mask_latent_code_channel_wise(
            jnp.asarray(z), decoder_fn, jnp.zeros_like(jnp.asarray(z)),
            jax.random.PRNGKey(seed), percentile=0.5, random=True,
            loss_name="mse", if_soft=False)
        frac_masked = 1.0 - np.asarray(mask).reshape(4, 16).mean(axis=1)
        assert np.all(frac_masked <= 0.5 + 1e-6)


def test_dropout_mask_scaling():
    z = jnp.ones((8, 4, 4, 64))
    masked, mask = masking.dropout_mask(z, jax.random.PRNGKey(0), p=0.5)
    kept = np.asarray(mask)[:, 0, 0, :]
    # survivors scaled by 1/(1-p) = 2
    m = np.asarray(masked)[:, 0, 0, :]
    np.testing.assert_allclose(m, kept * 2.0)
    assert 0.2 < kept.mean() < 0.8


def test_ce_loss_targeted_masking():
    """CE-driven masking on a seg-decoder-like function with int labels."""
    rng = np.random.RandomState(4)
    z = rng.rand(2, 4, 4, 8).astype(np.float32)
    labels = rng.randint(0, 4, (2, 4, 4)).astype(np.int32)

    def decoder_fn(code):
        return code[..., :4]  # logits = first 4 channels

    masked, mask = masking.mask_latent_code_channel_wise(
        jnp.asarray(z), decoder_fn, jnp.asarray(labels), jax.random.PRNGKey(0),
        num_classes=4, percentile=0.5, random=False, loss_name="ce", if_soft=False)
    assert masked.shape == z.shape
    assert np.isfinite(np.asarray(masked)).all()


@pytest.mark.parametrize("mask_type", ["dropout", "channel", "spatial", "random"])
def test_perturb_latent_code_dispatch(mask_type):
    rng = np.random.RandomState(5)
    z = jnp.asarray(rng.rand(2, 4, 4, 8).astype(np.float32))
    decoder_fn = _linear_decoder(jnp.ones(8))
    settings = masking.MaskSettings(loss_name="mse", mask_type=mask_type,
                                    max_threshold=0.5, random_threshold=True,
                                    if_soft=True)
    out, mask = masking.perturb_latent_code(z, decoder_fn, jnp.zeros_like(z),
                                            jax.random.PRNGKey(0), settings)
    assert out.shape == z.shape
    assert mask.shape == z.shape  # reference returns (code, mask) everywhere
    assert np.isfinite(np.asarray(out)).all()
    assert np.isfinite(np.asarray(mask)).all()


def test_perturb_latent_code_mask_matches_perturbation():
    """The returned mask must BE the applied perturbation: masked == z*mask
    (reference returns (code, mask) pairs, advanced...py:300-350)."""
    rng = np.random.RandomState(7)
    z = jnp.asarray(rng.rand(2, 4, 4, 8).astype(np.float32) + 0.5)
    decoder_fn = _linear_decoder(jnp.ones(8))
    for mask_type in ("channel", "spatial"):
        settings = masking.MaskSettings(loss_name="mse", mask_type=mask_type,
                                        max_threshold=0.5,
                                        random_threshold=False, if_soft=False)
        out, mask = masking.perturb_latent_code(
            z, decoder_fn, jnp.zeros_like(z), jax.random.PRNGKey(0), settings)
        np.testing.assert_allclose(np.asarray(out), np.asarray(z * mask),
                                   rtol=1e-6)
        m = np.asarray(mask)
        assert set(np.unique(m)) <= {0.0, 1.0}
        assert (m == 0).any() and (m == 1).any()


def test_perturb_latent_code_is_jittable():
    z = jnp.ones((2, 4, 4, 8))
    decoder_fn = _linear_decoder(jnp.ones(8))
    settings = masking.MaskSettings(mask_type="random")

    @jax.jit
    def step(z, key):
        return masking.perturb_latent_code(z, decoder_fn, jnp.zeros_like(z),
                                           key, settings)[0]

    out1 = step(z, jax.random.PRNGKey(0))
    out2 = step(z, jax.random.PRNGKey(1))
    assert out1.shape == z.shape
    # different keys -> different branches/thresholds (almost surely)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_no_gradient_leak_through_perturbation():
    """Hard-example generation must not backprop into upstream producers of z
    (if_detach=True semantics, advanced...py:501,515)."""
    decoder_fn = _linear_decoder(jnp.ones(8))
    settings = masking.MaskSettings(mask_type="channel", random_threshold=False,
                                    if_soft=False)

    def fn(x):
        z = x * 3.0  # pretend encoder
        out, _ = masking.perturb_latent_code(z, decoder_fn, jnp.zeros_like(z),
                                             jax.random.PRNGKey(0), settings)
        return jnp.sum(out)

    g = jax.grad(fn)(jnp.ones((1, 4, 4, 8)))
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_channel_mask_cross_checked_against_torch_autograd():
    """End-to-end parity with the reference algorithm executed in torch:
    same linear decoder, same mse loss, same percentile indexing
    (model_util.mask_latent_code_channel_wise:180-255)."""
    import torch

    rng = np.random.RandomState(7)
    n, h, w, c = 2, 3, 3, 8
    code_np = rng.randn(n, h, w, c).astype(np.float32)
    weight_np = rng.randn(c, 2).astype(np.float32)  # latent ch -> 2 outputs
    target_np = rng.randn(n, h, w, 2).astype(np.float32)
    percentile = 0.4

    # --- torch reference math (NCHW mental model not needed: mean grads
    # per channel over N are layout-independent)
    code_t = torch.tensor(code_np, requires_grad=True)
    out_t = torch.tensordot(code_t, torch.tensor(weight_np), dims=([3], [0]))
    loss_t = torch.mean((out_t - torch.tensor(target_np)) ** 2)
    (grad_t,) = torch.autograd.grad(loss_t, code_t)
    saliency_t = grad_t.reshape(n, h * w, c).mean(dim=1)  # N, C
    idx = int(c * percentile)
    sorted_desc, _ = torch.sort(saliency_t, dim=1, descending=True)
    thresh = sorted_desc[:, idx].unsqueeze(1)
    expected_mask = (saliency_t <= thresh).float().numpy()  # 1 keep, 0 drop

    # --- ours
    def decoder_fn(z):
        return jnp.tensordot(z, jnp.asarray(weight_np), axes=([3], [0]))

    masked, mask = masking.mask_latent_code_channel_wise(
        jnp.asarray(code_np), decoder_fn, jnp.asarray(target_np),
        jax.random.PRNGKey(0), percentile=percentile, random=False,
        loss_name="mse", if_soft=False)
    np.testing.assert_array_equal(
        np.asarray(mask).reshape(n, c), expected_mask)
    np.testing.assert_allclose(
        np.asarray(masked), code_np * expected_mask[:, None, None, :],
        rtol=1e-6)
