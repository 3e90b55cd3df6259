"""Segmentation loss library (pure jnp; NHWC logits, NHW integer labels).

Re-design of ``medseg/models/custom_loss.py`` (1013 LoC).  The cooperative
training path only uses ``cross_entropy_2d`` (custom_loss.py:706-770 /
model_util.py:104-135) via ``basic_loss_fn`` with 'cross entropy'
(advanced_triplet_recon_segmentation_model.py:440-466); the rest is the
capability-parity loss zoo for baselines/ablations.

Conventions: ``logits`` are NHWC (C = classes); ``target`` is either an NHW
int label map or NHWC *logits* of a soft reference (softmaxed internally,
exactly like the reference's 4-D branch).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def one_hot(labels, num_classes: int, dtype=jnp.float32):
    """NHW int -> NHWC one-hot (model_util.make_one_hot :168-177, NHWC)."""
    return jax.nn.one_hot(labels, num_classes, dtype=dtype)


def cross_entropy_2d(logits, target, weight=None, size_average: bool = True):
    """Pixelwise CE (model_util.cross_entropy_2D:104-135).

    * NHW int target: mean (or sum) NLL under log-softmax; optional class
      weights softmax-normalized * C for stability (matching :110-115).
    * NHWC soft target: target is *logits* of the reference distribution;
      loss = -mean_over_pixels(mean_over_classes(q * log p)) (:116-132).
    """
    c = logits.shape[-1]
    log_p = jax.nn.log_softmax(logits, axis=-1)
    if target.ndim == logits.ndim - 1:
        tgt = one_hot(target, c, dtype=log_p.dtype)
        nll = -(tgt * log_p)
        if weight is not None:
            w = jax.nn.softmax(jnp.asarray(weight, log_p.dtype)) * c
            nll = nll * w
        loss = jnp.sum(nll)
        if size_average:
            loss = loss / (target.size + 1e-10)
        return loss
    elif target.ndim == logits.ndim:
        q = jax.nn.softmax(target, axis=-1)
        plogq = q * log_p
        if weight is None:
            # mean over classes then mean over all pixels (ref :122)
            loss = -jnp.mean(jnp.mean(plogq, axis=-1))
        else:
            w = jax.nn.softmax(jnp.asarray(weight, log_p.dtype)) * c
            loss = -sum(jnp.mean(plogq[..., i] * w[i]) for i in range(c))
        return loss
    raise ValueError(f"bad target rank {target.ndim} for logits rank {logits.ndim}")


def cross_entropy_3d(logits, target, weight=None):
    """3-D variant (custom_loss.cross_entropy_3D:133-153); NDHWC logits."""
    return cross_entropy_2d(logits, target, weight=weight)


def soft_dice_loss(logits, target, num_classes: Optional[int] = None,
                   weight=None, eps: float = 1e-7, square_denom: bool = False):
    """Soft Dice over softmax probs (custom_loss.SoftDiceLoss:356-397).

    target: NHW int labels or NHWC one-hot/probs.
    """
    c = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    if target.ndim == logits.ndim - 1:
        tgt = one_hot(target, c, dtype=probs.dtype)
    else:
        tgt = target
    axes = tuple(range(1, logits.ndim - 1))  # spatial
    inter = jnp.sum(probs * tgt, axis=axes)
    if square_denom:
        denom = jnp.sum(probs * probs, axis=axes) + jnp.sum(tgt * tgt, axis=axes)
    else:
        denom = jnp.sum(probs, axis=axes) + jnp.sum(tgt, axis=axes)
    dice = (2.0 * inter + eps) / (denom + eps)  # N, C
    if weight is not None:
        dice = dice * jnp.asarray(weight, dice.dtype)
    return 1.0 - jnp.mean(dice)


def selective_soft_dice_loss(logits, target, class_ids: Sequence[int], eps: float = 1e-7):
    """Dice restricted to given classes (SelectiveSoftDiceLoss:440-472);
    'foreground dice' uses class_ids = 1..C-1."""
    c = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    tgt = one_hot(target, c, dtype=probs.dtype) if target.ndim == logits.ndim - 1 else target
    idx = jnp.asarray(class_ids)
    probs = jnp.take(probs, idx, axis=-1)
    tgt = jnp.take(tgt, idx, axis=-1)
    axes = tuple(range(1, logits.ndim - 1))
    inter = jnp.sum(probs * tgt, axis=axes)
    denom = jnp.sum(probs, axis=axes) + jnp.sum(tgt, axis=axes)
    return 1.0 - jnp.mean((2.0 * inter + eps) / (denom + eps))


def focal_loss(logits, target, gamma: float = 2.0, alpha=None):
    """Focal loss (custom_loss.FocalLoss:222-255)."""
    c = logits.shape[-1]
    log_p = jax.nn.log_softmax(logits, axis=-1)
    tgt = one_hot(target, c, dtype=log_p.dtype)
    log_pt = jnp.sum(tgt * log_p, axis=-1)
    pt = jnp.exp(log_pt)
    w = (1.0 - pt) ** gamma
    if alpha is not None:
        a = jnp.take(jnp.asarray(alpha, log_p.dtype), target)
        w = w * a
    return -jnp.mean(w * log_pt)


def entropy_loss(logits, eps: float = 1e-12):
    """Mean per-pixel entropy of predictions, normalized by log C
    (custom_loss.EntropyLoss:156-171)."""
    p = jax.nn.softmax(logits, axis=-1)
    ent = -jnp.sum(p * jnp.log(p + eps), axis=-1)
    return jnp.mean(ent) / jnp.log(logits.shape[-1])


def kl_divergence(p_logit, q_logit):
    """KL(softmax(p) || softmax(q)) mean over pixels (custom_loss:863-890).
    No eps needed: log_softmax is numerically stable."""
    p = jax.nn.softmax(p_logit, axis=-1)
    return jnp.mean(jnp.sum(
        p * (jax.nn.log_softmax(p_logit, axis=-1) - jax.nn.log_softmax(q_logit, axis=-1)),
        axis=-1))


def brier_loss(logits, target):
    """Brier score (custom_loss:495-512)."""
    c = logits.shape[-1]
    p = jax.nn.softmax(logits, axis=-1)
    tgt = one_hot(target, c, dtype=p.dtype)
    return jnp.mean(jnp.sum((p - tgt) ** 2, axis=-1))


def smooth_l1_loss(pred, target, beta: float = 1.0):
    """Huber / smooth-L1 (custom_loss:310-318)."""
    diff = jnp.abs(pred - target)
    return jnp.mean(jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta))


def _pairwise_spatial_cosine(a, b, eps: float):
    """Cosine similarity per (N, C) pair over flattened spatial dims (NHWC)."""
    n, h, w, c = a.shape
    av = a.transpose(0, 3, 1, 2).reshape(n, c, -1)
    bv = b.transpose(0, 3, 1, 2).reshape(n, c, -1)
    return jnp.sum(av * bv, -1) / (
        jnp.linalg.norm(av, axis=-1) * jnp.linalg.norm(bv, axis=-1) + eps)


def calc_angular_loss(a, b, eps: float = 1e-8):
    """1 - cosine similarity over flattened spatial dims (custom_loss:43-55);
    NHWC tensors, similarity per (N, C) vector pair."""
    return jnp.mean(1.0 - _pairwise_spatial_cosine(a, b, eps))


def calc_correlation_loss(a, b, eps: float = 1e-8):
    """Encourage dissimilarity: mean |cos| between spatial vectors (custom_loss:57-68)."""
    return jnp.mean(jnp.abs(_pairwise_spatial_cosine(a, b, eps)))


def gram_matrix(x):
    """Channel Gram matrix (custom_loss:101-115); NHWC -> N,C,C."""
    n, h, w, c = x.shape
    f = x.reshape(n, h * w, c)
    return jnp.einsum("npc,npd->ncd", f, f) / (h * w * c)


def style_loss(a, b):
    """MSE between Gram matrices (custom_loss:117-130)."""
    return jnp.mean((gram_matrix(a) - gram_matrix(b)) ** 2)


def contour_loss(probs, target, num_classes: int, foreground_only: bool = True):
    """Sobel-gradient MSE on per-class probability maps (custom_loss.contour_loss
    :784-861): penalizes boundary mismatch between soft prediction and one-hot GT.

    ``probs``: NHWC softmax probabilities.
    """
    tgt = one_hot(target, num_classes, dtype=probs.dtype)
    sobel_x = jnp.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], probs.dtype)
    sobel_y = sobel_x.T

    def grad2d(x_nhwc, k):
        # depthwise conv via lax.conv_general_dilated with feature_group_count
        c = x_nhwc.shape[-1]
        kernel = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
        return jax.lax.conv_general_dilated(
            x_nhwc, kernel, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)

    cls = slice(1, num_classes) if foreground_only else slice(0, num_classes)
    p, t = probs[..., cls], tgt[..., cls]
    loss = ((grad2d(p, sobel_x) - grad2d(t, sobel_x)) ** 2
            + (grad2d(p, sobel_y) - grad2d(t, sobel_y)) ** 2)
    return jnp.mean(loss)


def calc_triplet_loss(anchor, positive, negative, margin: float = 1.0):
    """Triplet margin loss on flattened embeddings (custom_loss:71-80)."""
    d_ap = jnp.linalg.norm((anchor - positive).reshape(anchor.shape[0], -1), axis=1)
    d_an = jnp.linalg.norm((anchor - negative).reshape(anchor.shape[0], -1), axis=1)
    return jnp.mean(jnp.maximum(d_ap - d_an + margin, 0.0))


def contrastive_loss(a, b, label, margin: float = 2.0):
    """Pairwise contrastive loss (custom_loss.ContrastiveLoss:83-98);
    label=0 similar, 1 dissimilar."""
    d = jnp.linalg.norm((a - b).reshape(a.shape[0], -1), axis=1)
    return jnp.mean((1 - label) * d ** 2 + label * jnp.maximum(margin - d, 0.0) ** 2)


def nt_xent_loss(z1, z2, temperature: float = 0.5):
    """NT-Xent contrastive loss over two views (custom_loss.contrastive_loss:664-704)."""
    n = z1.shape[0]
    z = jnp.concatenate([z1.reshape(n, -1), z2.reshape(n, -1)], axis=0)
    z = z / (jnp.linalg.norm(z, axis=1, keepdims=True) + 1e-8)
    sim = z @ z.T / temperature
    mask = jnp.eye(2 * n, dtype=bool)
    sim = jnp.where(mask, -jnp.inf, sim)
    pos = jnp.concatenate([jnp.arange(n) + n, jnp.arange(n)])
    return jnp.mean(-sim[jnp.arange(2 * n), pos] + jax.nn.logsumexp(sim, axis=1))


def mse_segmentation_consistency(pred_logit, ref_logit):
    """MSE between softmaxed maps (custom_loss:772-776)."""
    return jnp.mean((jax.nn.softmax(pred_logit, -1) - jax.nn.softmax(ref_logit, -1)) ** 2)


def calc_segmentation_consistency(pred_logit, ref_logit, divergence_types=("kl", "contour"),
                                  divergence_weights=(1.0, 0.5), num_classes: int = 4,
                                  scales=(0,)):
    """Multi-scale multi-divergence consistency (custom_loss:892-974).

    Supported divergences: kl | ce | mse | contour.
    """
    total = 0.0
    for scale in scales:
        p, r = pred_logit, ref_logit
        if scale > 0:
            k = 2 ** scale
            p = jax.lax.reduce_window(p, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1),
                                      "VALID") / (k * k)
            r = jax.lax.reduce_window(r, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1),
                                      "VALID") / (k * k)
        for name, w in zip(divergence_types, divergence_weights):
            if name == "kl":
                loss = kl_divergence(r, p)
            elif name == "ce":
                loss = cross_entropy_2d(p, r)
            elif name == "mse":
                loss = mse_segmentation_consistency(p, r)
            elif name == "contour":
                loss = contour_loss(jax.nn.softmax(p, -1),
                                    jnp.argmax(r, -1), num_classes)
            else:
                raise NotImplementedError(name)
            total = total + w * loss
    return total / len(scales)


def soft_dice_loss_3d(logits, target, weight=None, eps: float = 1e-7):
    """3-D soft Dice (custom_loss.SoftDiceLoss3D:399-438): NDHWC logits.

    The generic :func:`soft_dice_loss` already reduces over all spatial
    axes, so the 3-D case is the same computation at ndim=5.
    """
    assert logits.ndim == 5, "expect NDHWC"
    return soft_dice_loss(logits, target, weight=weight, eps=eps)


def hierarchical_loss(multi_preds, target, weights=(1.0, 1.0, 1.0)):
    """3-level hierarchical CE (custom_loss.get_hierachical_loss:183-219).

    ``multi_preds``: [binary object logits (C=2), biventricle logits (C=3),
    final logits (C=4)], NHWC; ``target``: NHW int in {0..3}.

    The level remaps reproduce the reference EXACTLY (get_hierachical_loss
    :193-205), including its idiosyncrasies under the {0:BG,1:LV,2:MYO,3:RV}
    map: level 1 keeps only class 1 as "object" (classes >1 -> 0); level 2
    folds classes <=2 (incl. background) into 1 and class 3 into 2, so class
    0 is never a level-2 target.  Callers using a different class ordering
    (as the loss's original experiments did) get the intended hierarchy.
    """
    assert len(multi_preds) == len(weights)
    # level 1: binary_object_target[target > 1] = 0 (reference :192-196)
    binary_target = jnp.where(target > 1, 0, target)
    object_loss = cross_entropy_2d(multi_preds[0], binary_target)
    # level 2: [target <= 2] = 1, [target > 2] = 2 (reference :199-202)
    biv_target = jnp.where(target <= 2, 1, 2)
    biventricle_loss = cross_entropy_2d(multi_preds[1], biv_target)
    # level 3: full labels with myocardium-emphasizing class weights
    final_loss = cross_entropy_2d(multi_preds[2], target,
                                  weight=jnp.asarray([0.2, 0.25, 0.3, 0.25]))
    return (weights[0] * object_loss + weights[1] * biventricle_loss
            + weights[2] * final_loss)


def intra_subject_latent_consistency_loss(latents):
    """L2 spread of k views' latents around their mean
    (custom_loss.IntraSubjectLatentConsistencyLoss:259-287).

    ``latents``: list of k arrays (N, ...) from different views.
    """
    n = latents[0].shape[0]
    stack = jnp.stack([z.reshape(n, -1) for z in latents], axis=0)  # k,N,F
    bias = stack - jnp.mean(stack, axis=0, keepdims=True)
    return jnp.mean(bias * bias)


def inter_template_consistency_loss(x, weight: float = 1.0):
    """L2 spread of per-sample templates around the batch mean
    (custom_loss.InterTemplateConsistencyLoss:289-307).  x: (N, H, W, C)."""
    bias = x - jnp.mean(x, axis=0, keepdims=True)
    return weight * jnp.mean(bias * bias)


def laplacian_smoothness_loss(probs, target, num_classes: int,
                              size_average: bool = True):
    """MSE between Laplacian responses of predicted and GT foreground maps
    (custom_loss.laplacian_smoothness_loss:321-353).

    ``probs``: NHWC class probabilities; ``target``: NHW int labels.  The
    reference's fixed kernel [[1,0,1],[1,-8,1],[1,0,1]] is applied as a
    dense cross-channel conv over the foreground classes.
    """
    fg = num_classes - 1
    tgt = one_hot(target, num_classes, probs.dtype)[..., 1:]
    pred = probs[..., 1:]
    k = jnp.asarray([[1., 0., 1.], [1., -8., 1.], [1., 0., 1.]], probs.dtype)
    # reference: out_ch=in_ch=fg dense kernel with the SAME spatial filter
    # replicated everywhere (np.repeat over both channel axes).
    kernel = jnp.tile(k[:, :, None, None], (1, 1, fg, fg))  # HWIO

    def lap(x):
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    diff = lap(pred) - lap(tgt)
    loss = diff * diff
    return jnp.mean(loss) if size_average else loss


def zncc_loss(template, image, zero_mean: bool = False, eps: float = 1e-6):
    """(Zero-)normalized cross-correlation loss, 1 - cosine(template, image)
    (custom_loss.CustomNormalizedCrossCorrelationLoss:514-662).

    ``template``: (1, H, W, C) broadcast against ``image``: (N, H, W, C).
    Returns mean over the batch of 1 - NCC in [0, 2].
    """
    if zero_mean:
        template = template - jnp.mean(template, axis=(1, 2), keepdims=True)
        image = image - jnp.mean(image, axis=(1, 2), keepdims=True)
    n = image.shape[0]
    t = jnp.broadcast_to(template, image.shape).reshape(n, -1)
    im = image.reshape(n, -1)
    t = t / (jnp.linalg.norm(t, axis=1, keepdims=True) + eps)
    im = im / (jnp.linalg.norm(im, axis=1, keepdims=True) + eps)
    ncc = jnp.sum(t * im, axis=1)
    return jnp.mean(1.0 - ncc)


def basic_loss_fn(pred, target, loss_type: str = "cross entropy", class_weights=None):
    """Supervised-loss dispatcher (custom_loss.basic_loss_fn:8-40)."""
    num_classes = pred.shape[-1]
    if class_weights is None:
        class_weights = [1.0 / num_classes] * num_classes
    if loss_type == "cross entropy":
        return cross_entropy_2d(pred, target)
    if loss_type == "weighted cross entropy":
        return cross_entropy_2d(pred, target, weight=class_weights)
    if loss_type == "dice":
        return soft_dice_loss(pred, target)
    if loss_type == "weighted dice":
        return soft_dice_loss(pred, target, weight=class_weights)
    if loss_type == "foreground dice":
        return selective_soft_dice_loss(pred, target, list(range(1, num_classes)))
    if loss_type == "focal":
        return focal_loss(pred, target, gamma=2.0)
    if loss_type == "contour_smooth":
        return contour_loss(jax.nn.softmax(pred, -1), target, num_classes)
    raise NotImplementedError(loss_type)
