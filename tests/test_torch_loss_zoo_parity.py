"""Golden parity: ops/losses vs the IMPORTED reference loss module.

`medseg.models.custom_loss` imports cleanly on this image, so every loss the
rebuild ships is pinned directly against the reference implementation (CPU,
use_gpu=False wherever the reference exposes it).  Reference entries that
cannot run at all are skipped with the reason documented:
InterTemplateConsistencyLoss (unconditional torch.cuda tensor, :289-307),
SoftDiceLoss3D (broken super() call, :399-404), and the consistency
'contour' branch (calls contour_loss with use_gpu defaulted True, :956-967 —
its math is reproduced manually below instead).
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

torch = pytest.importorskip("torch")

from medseg.models import custom_loss as ref  # noqa: E402

from cooperative_training_and_latent_space_data_augmentation_tpu.ops import (  # noqa: E402
    losses,
)

RNG = np.random.RandomState(21)
N, H, W, C = 3, 8, 8, 4


@pytest.fixture(scope="module")
def data():
    logits = RNG.randn(N, H, W, C).astype(np.float32)
    other = RNG.randn(N, H, W, C).astype(np.float32)
    labels = RNG.randint(0, C, (N, H, W)).astype(np.int64)
    return logits, other, labels


def nchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


def t_lbl(labels):
    return torch.from_numpy(labels)


def close(got, expected, atol=1e-5):
    np.testing.assert_allclose(float(got), float(expected), rtol=0, atol=atol)


@pytest.mark.parametrize("loss_type", [
    "cross entropy", "weighted cross entropy", "dice", "weighted dice",
    "foreground dice", "focal"])
def test_basic_loss_fn_golden(data, loss_type):
    logits, _, labels = data
    with torch.no_grad():
        expected = ref.basic_loss_fn(nchw(logits), t_lbl(labels),
                                     loss_type=loss_type, use_gpu=False)
    got = losses.basic_loss_fn(jnp.asarray(logits),
                               jnp.asarray(labels.astype(np.int32)), loss_type)
    close(got, expected)


def test_basic_loss_fn_contour_smooth_reference_is_broken(data):
    """The reference dispatcher's 'contour_smooth' branch passes a
    num_classes kwarg contour_loss does not accept (custom_loss.py:36-37) —
    a TypeError on every call.  The rebuild implements the intended
    behavior; the contour math itself is pinned by test_contour_loss_golden."""
    logits, _, labels = data
    with pytest.raises(TypeError):
        ref.basic_loss_fn(nchw(logits), t_lbl(labels),
                          loss_type="contour_smooth", use_gpu=False)
    got = losses.basic_loss_fn(jnp.asarray(logits),
                               jnp.asarray(labels.astype(np.int32)),
                               "contour_smooth")
    with torch.no_grad():
        expected = ref.contour_loss(torch.softmax(nchw(logits), dim=1),
                                    t_lbl(labels), use_gpu=False)
    close(got, expected)


def test_cross_entropy_2d_soft_and_weighted(data):
    logits, other, labels = data
    with torch.no_grad():
        exp_soft = ref.cross_entropy_2D(nchw(logits), nchw(other))
        w = torch.tensor([0.2, 0.25, 0.3, 0.25])
        exp_w = ref.cross_entropy_2D(nchw(logits), t_lbl(labels), weight=w)
        exp_soft_w = ref.cross_entropy_2D(nchw(logits), nchw(other),
                                          weight=np.array([0.2, 0.25, 0.3, 0.25]))
    close(losses.cross_entropy_2d(jnp.asarray(logits), jnp.asarray(other)),
          exp_soft)
    close(losses.cross_entropy_2d(jnp.asarray(logits),
                                  jnp.asarray(labels.astype(np.int32)),
                                  weight=[0.2, 0.25, 0.3, 0.25]), exp_w)
    close(losses.cross_entropy_2d(jnp.asarray(logits), jnp.asarray(other),
                                  weight=[0.2, 0.25, 0.3, 0.25]), exp_soft_w)


def test_cross_entropy_3d_golden():
    logits = RNG.randn(2, 3, 6, 6, C).astype(np.float32)  # NDHWC
    labels = RNG.randint(0, C, (2, 3, 6, 6)).astype(np.int64)
    xt = torch.from_numpy(np.moveaxis(logits, -1, 1).copy())  # NCDHW
    with torch.no_grad():
        expected = ref.cross_entropy_3D(xt, torch.from_numpy(labels))
        w = torch.tensor([0.1, 0.2, 0.3, 0.4])
        expected_w = ref.cross_entropy_3D(xt, torch.from_numpy(labels), weight=w)
    close(losses.cross_entropy_3d(jnp.asarray(logits),
                                  jnp.asarray(labels.astype(np.int32))), expected)
    close(losses.cross_entropy_3d(jnp.asarray(logits),
                                  jnp.asarray(labels.astype(np.int32)),
                                  weight=[0.1, 0.2, 0.3, 0.4]), expected_w)


def test_entropy_focal_brier_smoothl1_golden(data):
    logits, other, labels = data
    with torch.no_grad():
        close(losses.entropy_loss(jnp.asarray(logits)),
              ref.EntropyLoss()(nchw(logits)))
        close(losses.focal_loss(jnp.asarray(logits),
                                jnp.asarray(labels.astype(np.int32)),
                                gamma=2.0, alpha=[0.1, 0.2, 0.3, 0.4]),
              ref.FocalLoss(gamma=2.0, alpha=[0.1, 0.2, 0.3, 0.4])(
                  nchw(logits), t_lbl(labels)))
        close(losses.brier_loss(jnp.asarray(logits),
                                jnp.asarray(labels.astype(np.int32))),
              ref.CustomBrierLoss(n_classes=C, use_gpu=False)(
                  nchw(logits), t_lbl(labels)))
        close(losses.smooth_l1_loss(jnp.asarray(logits), jnp.asarray(other)),
              ref.smooth_l1_loss(nchw(logits), nchw(other)))


def test_angular_correlation_triplet_style_golden(data):
    logits, other, labels = data
    third = RNG.randn(*logits.shape).astype(np.float32)
    with torch.no_grad():
        close(losses.calc_angular_loss(jnp.asarray(logits), jnp.asarray(other)),
              ref.calc_angular_loss(nchw(logits), nchw(other)))
        close(losses.calc_correlation_loss(jnp.asarray(logits),
                                           jnp.asarray(other)),
              ref.calc_correlation_loss(nchw(logits), nchw(other)))
        # ref.style_loss is 3-D-only (gram_matrix_3D unpack crashes on 4-D
        # input, custom_loss.py:127-130); compare against its math with the
        # 2-D gram it pairs with
        gdiff = ref.gram_matrix_2D(nchw(logits)) - ref.gram_matrix_2D(nchw(other))
        close(losses.style_loss(jnp.asarray(logits), jnp.asarray(other)),
              torch.mean(gdiff * gdiff), atol=1e-6)
        exp_trip = ref.calc_triplet_loss(nchw(logits), nchw(other), nchw(third),
                                         distance_func=ref.calc_angular_loss,
                                         margin=1.0)
    got_trip = jnp.maximum(
        losses.calc_angular_loss(jnp.asarray(logits), jnp.asarray(other))
        - losses.calc_angular_loss(jnp.asarray(logits), jnp.asarray(third))
        + 1.0, 0.0)
    close(got_trip, exp_trip)


def test_kl_and_consistency_golden(data):
    logits, other, labels = data
    with torch.no_grad():
        close(losses.kl_divergence(jnp.asarray(other), jnp.asarray(logits)),
              ref.kl_divergence(reference=nchw(other), pred=nchw(logits)))
        # reference crash surface documented: scales beyond [0] hit a
        # full-resolution default mask against pooled maps (custom_loss.py:
        # 911-928); the 'Dice' branch reshapes input to (N,C,-1) BEFORE
        # multiplying by the 4-D mask (:369-384) and dies even at scale 0.
        # Golden comparison: kl/ce/mse at scale 0; the Dice branch's intent
        # (mask of ones = no-op) is pinned against SoftDiceLoss directly.
        exp = ref.calc_segmentation_consistency(
            output=nchw(logits), reference=nchw(other),
            divergence_types=["kl", "ce", "mse"],
            divergence_weights=[1.0, 0.7, 0.5], scales=[0])
        exp_dice = ref.SoftDiceLoss(n_classes=C, use_gpu=False)(
            nchw(logits), nchw(other), is_gt=False)
        exp_mse = ref.calc_segmentation_mse_consistency(nchw(logits), nchw(other))
        exp_kl = ref.calc_segmentation_kl_consistency(nchw(logits), nchw(other))
    got = losses.calc_segmentation_consistency(
        jnp.asarray(logits), jnp.asarray(other),
        divergence_types=("kl", "ce", "mse"),
        divergence_weights=(1.0, 0.7, 0.5), scales=(0,))
    close(got, exp, atol=2e-5)
    close(losses.calc_segmentation_consistency(
        jnp.asarray(logits), jnp.asarray(other), divergence_types=("Dice",),
        divergence_weights=(1.0,)), exp_dice)
    close(losses.mse_segmentation_consistency(jnp.asarray(logits),
                                              jnp.asarray(other)), exp_mse)
    close(losses.calc_segmentation_consistency(
        jnp.asarray(logits), jnp.asarray(other), divergence_types=("kl",),
        divergence_weights=(1.0,)), exp_kl)


def test_consistency_contour_branch_golden(data):
    """The reference's contour branch can't run on CPU (use_gpu default);
    reproduce its math with contour_loss(use_gpu=False) per class."""
    logits, other, labels = data
    sp = torch.softmax(nchw(logits), dim=1)
    sr = torch.softmax(nchw(other), dim=1)
    with torch.no_grad():
        loss = 0.0
        for i in range(1, C):
            loss = loss + ref.contour_loss(
                input=sp[:, [i]], target=sr[:, [i]], use_gpu=False,
                ignore_background=False, one_hot_target=False)
        expected = loss / (C - 1)
    got = losses.calc_segmentation_consistency(
        jnp.asarray(logits), jnp.asarray(other), divergence_types=("contour",),
        divergence_weights=(1.0,), num_classes=C)
    close(got, expected)


def test_contour_loss_golden(data):
    logits, _, labels = data
    probs = jax.nn.softmax(jnp.asarray(logits), -1)
    with torch.no_grad():
        expected = ref.contour_loss(
            input=torch.softmax(nchw(logits), dim=1), target=t_lbl(labels),
            use_gpu=False, ignore_background=True, one_hot_target=True)
    close(losses.contour_loss(probs, jnp.asarray(labels.astype(np.int32)), C),
          expected)


def test_laplacian_golden(data):
    logits, _, labels = data
    probs = jax.nn.softmax(jnp.asarray(logits), -1)
    with torch.no_grad():
        expected = ref.laplacian_smoothness_loss(
            input=torch.softmax(nchw(logits), dim=1), target=t_lbl(labels),
            num_classes=C, use_gpu=False)
    close(losses.laplacian_smoothness_loss(
        probs, jnp.asarray(labels.astype(np.int32)), C), expected)


def test_hierarchical_golden(data):
    logits, _, labels = data
    p1 = RNG.randn(N, H, W, 2).astype(np.float32)
    p2 = RNG.randn(N, H, W, 3).astype(np.float32)
    with torch.no_grad():
        expected = ref.get_hierachical_loss(
            [nchw(p1), nchw(p2), nchw(logits)], t_lbl(labels),
            weights=[1.0, 0.5, 2.0], use_gpu=False)
    got = losses.hierarchical_loss(
        [jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(logits)],
        jnp.asarray(labels.astype(np.int32)), weights=(1.0, 0.5, 2.0))
    close(got, expected)


def test_zncc_golden():
    template = RNG.rand(1, H, W, 1).astype(np.float32)
    image = RNG.rand(N, H, W, 1).astype(np.float32)
    for zero_mean in (False, True):
        with torch.no_grad():
            expected = ref.CustomNormalizedCrossCorrelationLoss(
                use_gpu=False, zero_mean=zero_mean)(nchw(template), nchw(image))
        close(losses.zncc_loss(jnp.asarray(template), jnp.asarray(image),
                               zero_mean=zero_mean), expected)


def test_nt_xent_golden():
    z1 = RNG.randn(6, 16).astype(np.float32)
    z2 = RNG.randn(6, 16).astype(np.float32)
    with torch.no_grad():
        expected = ref.contrastive_loss(tau=0.5, normalize=True)(
            torch.from_numpy(z1), torch.from_numpy(z2))
    got = losses.nt_xent_loss(jnp.asarray(z1), jnp.asarray(z2), temperature=0.5)
    close(got, expected, atol=1e-4)


def test_pairwise_contrastive_golden():
    a = RNG.randn(6, 16).astype(np.float32)
    b = RNG.randn(6, 16).astype(np.float32)
    lbl = RNG.randint(0, 2, (6,)).astype(np.float32)
    with torch.no_grad():
        # reference label semantics: 1 = same class (pull), 0 = different (push)
        expected = ref.ContrastiveLoss(margin=2.0)(
            torch.from_numpy(a), torch.from_numpy(b), torch.from_numpy(lbl))
    got = losses.contrastive_loss(jnp.asarray(a), jnp.asarray(b),
                                  jnp.asarray(lbl), margin=2.0)
    close(got, expected, atol=1e-4)


def test_intra_subject_consistency_golden():
    views = [RNG.randn(N, 4, 4, 8).astype(np.float32) for _ in range(3)]
    with torch.no_grad():
        expected = ref.IntraSubjectLatentConsistencyLoss()(
            [nchw(v) for v in views])
    got = losses.intra_subject_latent_consistency_loss(
        [jnp.asarray(v) for v in views])
    close(got, expected)
