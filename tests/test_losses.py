"""Golden-value tests for the loss library, cross-checked against torch-CPU
implementations of the documented reference semantics
(medseg/models/custom_loss.py, model_util.cross_entropy_2D)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from cooperative_training_and_latent_space_data_augmentation_tpu.ops import losses


@pytest.fixture
def logits_labels(np_rng):
    logits = np_rng.randn(3, 8, 8, 4).astype(np.float32)
    labels = np_rng.randint(0, 4, (3, 8, 8)).astype(np.int32)
    return logits, labels


def _to_torch_nchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


def test_cross_entropy_2d_hard_target(logits_labels):
    logits, labels = logits_labels
    ours = float(losses.cross_entropy_2d(jnp.asarray(logits), jnp.asarray(labels)))
    # reference semantics: sum NLL / numel (model_util.py:104-115)
    t = F.nll_loss(
        F.log_softmax(_to_torch_nchw(logits), dim=1),
        torch.from_numpy(labels.astype(np.int64)), reduction="sum"
    ) / labels.size
    np.testing.assert_allclose(ours, float(t), rtol=1e-5)


def test_cross_entropy_2d_soft_target(logits_labels):
    logits, _ = logits_labels
    target = np.random.RandomState(1).randn(3, 8, 8, 4).astype(np.float32)
    ours = float(losses.cross_entropy_2d(jnp.asarray(logits), jnp.asarray(target)))
    # ref: -SUM over classes, mean over pixels (custom_loss.py:737-740 —
    # the training-reachable variant; model_util's class-MEAN variant is
    # documented in the cross_entropy_2d docstring)
    log_p = F.log_softmax(_to_torch_nchw(logits), dim=1)
    q = F.softmax(_to_torch_nchw(target), dim=1)
    t = -torch.mean(torch.sum(q * log_p, dim=1))
    np.testing.assert_allclose(ours, float(t), rtol=1e-5)


def test_cross_entropy_weighted(logits_labels):
    logits, labels = logits_labels
    w = np.array([0.1, 0.5, 0.2, 0.2], np.float32)
    ours = float(losses.cross_entropy_2d(jnp.asarray(logits), jnp.asarray(labels), weight=w))
    # custom_loss.cross_entropy_2D:733-735: w / w.sum() * C (the variant
    # reachable from every training config via basic_loss_fn)
    tw = torch.from_numpy(w) / torch.from_numpy(w).sum() * 4
    t = F.nll_loss(
        F.log_softmax(_to_torch_nchw(logits), dim=1),
        torch.from_numpy(labels.astype(np.int64)), weight=tw, reduction="sum"
    ) / labels.size
    np.testing.assert_allclose(ours, float(t), rtol=1e-5)


def test_soft_dice_perfect_prediction():
    labels = np.zeros((2, 8, 8), np.int32)
    labels[:, :4] = 1
    labels[:, 6:] = 2  # every class present (absent classes score dice
    # 2*smooth/smooth = 2 in the reference arithmetic, by design)
    # extreme logits -> probs ~ one-hot -> dice ~ 1 -> loss ~ 0
    logits = (np.eye(3, dtype=np.float32)[labels] * 2 - 1) * 50.0
    loss = float(losses.soft_dice_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert loss == pytest.approx(0.0, abs=1e-3)


def test_foreground_dice_ignores_background(logits_labels):
    logits, labels = logits_labels
    full = losses.soft_dice_loss(jnp.asarray(logits), jnp.asarray(labels))
    fg = losses.selective_soft_dice_loss(jnp.asarray(logits), jnp.asarray(labels), [1, 2, 3])
    assert float(full) != float(fg)


def test_focal_equals_ce_at_gamma0(logits_labels):
    logits, labels = logits_labels
    focal = float(losses.focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=0.0))
    ce = float(losses.cross_entropy_2d(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(focal, ce, rtol=1e-5)


def test_kl_divergence_identity(logits_labels):
    logits, _ = logits_labels
    kl = float(losses.kl_divergence(jnp.asarray(logits), jnp.asarray(logits)))
    assert kl == pytest.approx(0.0, abs=1e-6)
    other = np.random.RandomState(2).randn(*logits.shape).astype(np.float32)
    assert float(losses.kl_divergence(jnp.asarray(logits), jnp.asarray(other))) > 0


def test_entropy_loss_bounds(logits_labels):
    logits, _ = logits_labels
    # reference EntropyLoss returns raw nats; normalize=True -> [0, 1]
    ent = float(losses.entropy_loss(jnp.asarray(logits), normalize=True))
    assert 0.0 <= ent <= 1.0
    uniform = jnp.zeros_like(jnp.asarray(logits))
    assert float(losses.entropy_loss(uniform, normalize=True)) == pytest.approx(1.0, abs=1e-5)
    assert float(losses.entropy_loss(uniform)) == pytest.approx(float(np.log(4)), abs=1e-5)


def test_contour_loss_zero_for_match():
    labels = np.zeros((1, 16, 16), np.int32)
    labels[:, 4:12, 4:12] = 1
    probs = np.eye(2, dtype=np.float32)[labels]
    loss = float(losses.contour_loss(jnp.asarray(probs), jnp.asarray(labels), 2))
    assert loss == pytest.approx(0.0, abs=1e-6)
    shifted = np.roll(labels, 3, axis=1)
    probs_shift = np.eye(2, dtype=np.float32)[shifted]
    assert float(losses.contour_loss(jnp.asarray(probs_shift), jnp.asarray(labels), 2)) > 0


def test_basic_loss_fn_dispatch(logits_labels):
    logits, labels = logits_labels
    for lt in ["cross entropy", "weighted cross entropy", "dice", "weighted dice",
               "foreground dice", "focal", "contour_smooth"]:
        val = float(losses.basic_loss_fn(jnp.asarray(logits), jnp.asarray(labels), lt))
        assert np.isfinite(val), lt


def test_consistency_and_misc(logits_labels):
    logits, labels = logits_labels
    other = np.random.RandomState(3).randn(*logits.shape).astype(np.float32)
    v = losses.calc_segmentation_consistency(
        jnp.asarray(logits), jnp.asarray(other),
        divergence_types=("kl", "mse", "ce", "contour"),
        divergence_weights=(1.0, 1.0, 1.0, 0.5))
    assert np.isfinite(float(v))
    a = jnp.asarray(logits)
    assert np.isfinite(float(losses.calc_angular_loss(a, jnp.asarray(other))))
    assert np.isfinite(float(losses.style_loss(a, jnp.asarray(other))))
    assert np.isfinite(float(losses.brier_loss(a, jnp.asarray(labels))))
    z = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
    assert np.isfinite(float(losses.nt_xent_loss(z, z + 0.1)))


def test_hierarchical_loss(logits_labels):
    logits, labels = logits_labels
    rng = np.random.RandomState(1)
    preds = [jnp.asarray(rng.randn(3, 8, 8, c).astype(np.float32)) for c in (2, 3, 4)]
    loss = losses.hierarchical_loss(preds, jnp.asarray(labels))
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_latent_consistency_losses(np_rng):
    z = [jnp.asarray(np_rng.randn(2, 4, 4, 8).astype(np.float32)) for _ in range(3)]
    l = losses.intra_subject_latent_consistency_loss(z)
    assert float(l) > 0
    # identical views -> zero spread
    same = [z[0], z[0], z[0]]
    assert float(losses.intra_subject_latent_consistency_loss(same)) == pytest.approx(0.0)
    x = jnp.asarray(np_rng.randn(4, 8, 8, 1).astype(np.float32))
    assert float(losses.inter_template_consistency_loss(x)) > 0
    uniform = jnp.ones((4, 8, 8, 1))
    assert float(losses.inter_template_consistency_loss(uniform)) == pytest.approx(0.0)


def test_laplacian_smoothness_zero_for_match(logits_labels):
    _, labels = logits_labels
    probs = jax.nn.one_hot(jnp.asarray(labels), 4)
    loss = losses.laplacian_smoothness_loss(probs, jnp.asarray(labels), num_classes=4)
    assert float(loss) == pytest.approx(0.0, abs=1e-8)
    # a wrong prediction raises it
    wrong = jnp.roll(probs, 1, axis=-1)
    assert float(losses.laplacian_smoothness_loss(
        wrong, jnp.asarray(labels), num_classes=4)) > 0


def test_soft_dice_loss_3d(np_rng):
    logits = jnp.asarray(np_rng.randn(2, 3, 8, 8, 4).astype(np.float32))
    labels = jnp.asarray(np_rng.randint(0, 4, (2, 3, 8, 8)).astype(np.int32))
    loss = losses.soft_dice_loss_3d(logits, labels)
    assert 0 <= float(loss) <= 1.05  # smooth 0.01 can nudge above 1 slightly


def test_zncc_loss(np_rng):
    t = jnp.asarray(np_rng.rand(1, 8, 8, 1).astype(np.float32))
    # perfect match -> 0; scaled copy (cosine-invariant) -> ~0
    assert float(losses.zncc_loss(t, t)) == pytest.approx(0.0, abs=1e-5)
    assert float(losses.zncc_loss(t, 3.0 * t)) == pytest.approx(0.0, abs=1e-5)
    other = jnp.asarray(np_rng.rand(4, 8, 8, 1).astype(np.float32))
    assert float(losses.zncc_loss(t, other)) > 0
