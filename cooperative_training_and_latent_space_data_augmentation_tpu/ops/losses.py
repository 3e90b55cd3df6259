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
    """Pixelwise CE (custom_loss.cross_entropy_2D:706-770 — the variant every
    training config reaches via basic_loss_fn).

    * NHW int target: mean (or sum) NLL under log-softmax; class weights
      normalized to sum C via ``w / w.sum() * C`` (:733-735).
    * NHWC soft target: target is *logits* of the reference distribution;
      loss = -sum_over_classes(q * log p) averaged over PIXELS (:737-752).

    (model_util.cross_entropy_2D:104-135 is a second reference variant with
    different weighted/soft arithmetic — softmax weight normalization and a
    class-MEAN soft reduction; its only reachable uses are UNWEIGHTED with
    hard labels, where the two variants coincide.)
    """
    c = logits.shape[-1]
    log_p = jax.nn.log_softmax(logits, axis=-1)
    if weight is not None:
        w = jnp.asarray(weight, log_p.dtype)
        w = w / jnp.sum(w) * c
    if target.ndim == logits.ndim - 1:
        tgt = one_hot(target, c, dtype=log_p.dtype)
        nll = -(tgt * log_p)
        if weight is not None:
            nll = nll * w
        loss = jnp.sum(nll)
        if size_average:
            loss = loss / (target.size + 1e-10)
        return loss
    elif target.ndim == logits.ndim:
        q = jax.nn.softmax(target, axis=-1)
        plogq = q * log_p
        if weight is None:
            # SUM over classes, mean over pixels: the reference divides the
            # total by mask_region_size = number of PIXELS (:729-740)
            loss = -jnp.mean(jnp.sum(plogq, axis=-1))
        else:
            # weighted per-class sums, divided by the pixel count (:741-752)
            loss = -jnp.sum(plogq * w) / (target.size / c)
        return loss
    raise ValueError(f"bad target rank {target.ndim} for logits rank {logits.ndim}")


def cross_entropy_3d(logits, target, weight=None, size_average: bool = True):
    """3-D variant (custom_loss.cross_entropy_3D:133-155); NDHWC logits.

    Unlike cross_entropy_2D, the reference's 3-D version passes raw class
    weights to nll_loss WITHOUT softmax normalization and divides the
    weighted sum by the plain element count."""
    c = logits.shape[-1]
    log_p = jax.nn.log_softmax(logits, axis=-1)
    tgt = one_hot(target, c, dtype=log_p.dtype)
    nll = -jnp.sum(tgt * log_p, axis=-1)
    if weight is not None:
        nll = nll * jnp.take(jnp.asarray(weight, log_p.dtype), target)
    loss = jnp.sum(nll)
    if size_average:
        loss = loss / target.size
    return loss


def soft_dice_loss(logits, target, num_classes: Optional[int] = None,
                   weight=None, smooth: float = 0.01,
                   square_denom: bool = False, target_is_soft_logits: bool = False):
    """Soft Dice over softmax probs (custom_loss.SoftDiceLoss:356-397).

    target: NHW int labels or NHWC one-hot/probs (pass
    ``target_is_soft_logits=True`` for raw-logit targets, the reference's
    ``is_gt=False`` 4-d arm).  Exact reference arithmetic:
    ``2*(inter + smooth) / (union + smooth)``, smooth 0.01.

    ``weight`` is an EXTENSION: the reference's forward accepts a weight
    argument and silently never uses it (:366-397), so its 'weighted dice'
    equals plain 'dice'; pass a weight here only if you want real class
    weighting.
    """
    c = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    if target.ndim == logits.ndim - 1:
        tgt = one_hot(target, c, dtype=probs.dtype)
    elif target_is_soft_logits:
        tgt = jax.nn.softmax(target, axis=-1)
    else:
        tgt = target
    axes = tuple(range(1, logits.ndim - 1))  # spatial
    inter = jnp.sum(probs * tgt, axis=axes) + smooth
    if square_denom:
        denom = jnp.sum(probs * probs, axis=axes) + jnp.sum(tgt * tgt, axis=axes) + smooth
    else:
        denom = jnp.sum(probs, axis=axes) + jnp.sum(tgt, axis=axes) + smooth
    dice = 2.0 * inter / denom  # N, C
    if weight is not None:
        dice = dice * jnp.asarray(weight, dice.dtype)
    return 1.0 - jnp.mean(dice)


def selective_soft_dice_loss(logits, target, class_ids: Sequence[int],
                             smooth: float = 0.01):
    """Dice restricted to given classes (SelectiveSoftDiceLoss:440-472);
    'foreground dice' uses class_ids = 1..C-1.  Reference arithmetic:
    ``(2*inter + smooth) / (union + smooth)``, smooth 0.01."""
    c = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    tgt = one_hot(target, c, dtype=probs.dtype) if target.ndim == logits.ndim - 1 else target
    idx = jnp.asarray(class_ids)
    probs = jnp.take(probs, idx, axis=-1)
    tgt = jnp.take(tgt, idx, axis=-1)
    axes = tuple(range(1, logits.ndim - 1))
    inter = jnp.sum(probs * tgt, axis=axes)
    denom = jnp.sum(probs, axis=axes) + jnp.sum(tgt, axis=axes)
    return 1.0 - jnp.mean((2.0 * inter + smooth) / (denom + smooth))


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


def entropy_loss(logits, normalize: bool = False):
    """Mean per-pixel predictive entropy (custom_loss.EntropyLoss:156-171 —
    the reference returns raw nats); ``normalize=True`` divides by log C
    for a [0, 1] range."""
    p = jax.nn.softmax(logits, axis=-1)
    ent = -jnp.sum(p * jax.nn.log_softmax(logits, axis=-1), axis=-1)
    out = jnp.mean(ent)
    return out / jnp.log(logits.shape[-1]) if normalize else out


def kl_divergence(p_logit, q_logit):
    """KL(softmax(p) || softmax(q)) mean over pixels (custom_loss:863-890).
    No eps needed: log_softmax is numerically stable."""
    p = jax.nn.softmax(p_logit, axis=-1)
    return jnp.mean(jnp.sum(
        p * (jax.nn.log_softmax(p_logit, axis=-1) - jax.nn.log_softmax(q_logit, axis=-1)),
        axis=-1))


def brier_loss(logits, target):
    """Brier score (custom_loss.CustomBrierLoss:495-512).  Reference
    normalization: the squared error is SUMMED over pixels and divided by
    batch*num_classes (not a per-pixel mean)."""
    c = logits.shape[-1]
    n = logits.shape[0]
    p = jax.nn.softmax(logits, axis=-1)
    tgt = one_hot(target, c, dtype=p.dtype)
    return jnp.sum((p - tgt) ** 2) / (float(n) * float(c))


def smooth_l1_loss(pred, target, beta: float = 1.0 / 9.0):
    """Huber / smooth-L1 (custom_loss:310-318; reference default beta=1/9)."""
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
    """Encourage dissimilarity: mean cosine between spatial vectors
    (custom_loss:56-68 — the raw mean, which CAN be negative; the reference
    takes no absolute value)."""
    return jnp.mean(_pairwise_spatial_cosine(a, b, eps))


def gram_matrix(x):
    """Channel Gram matrix (custom_loss:101-115); NHWC -> N,C,C."""
    n, h, w, c = x.shape
    f = x.reshape(n, h * w, c)
    return jnp.einsum("npc,npd->ncd", f, f) / (h * w * c)


def style_loss(a, b):
    """MSE between Gram matrices (custom_loss:117-130)."""
    return jnp.mean((gram_matrix(a) - gram_matrix(b)) ** 2)


def contour_loss(probs, target, num_classes: int, foreground_only: bool = True,
                 one_hot_target: bool = True):
    """Sobel-gradient MSE on class probability maps (custom_loss.contour_loss
    :784-861): penalizes boundary mismatch between soft prediction and GT.

    ``probs``: NHWC softmax probabilities.  ``target``: NHW int labels
    (``one_hot_target=True``) or NHWC soft maps.

    Exact reference arithmetic: the torch version repeats one Sobel filter
    over BOTH channel axes of a dense Conv2d (:870-885), so every output
    channel is the Sobel response of the SUM over class channels — each
    replicated ``object_classes`` times, which leaves the MSE mean
    unchanged.  Computed here on the summed map directly.
    """
    if one_hot_target:
        tgt = one_hot(target, num_classes, dtype=probs.dtype)
    else:
        tgt = target
    sobel_x = jnp.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], probs.dtype)
    sobel_y = jnp.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], probs.dtype)

    def grad2d(x_nhw1, k):
        return jax.lax.conv_general_dilated(
            x_nhw1, k[:, :, None, None], window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    cls = slice(1, num_classes) if foreground_only else slice(0, num_classes)
    p = jnp.sum(probs[..., cls], axis=-1, keepdims=True)
    t = jnp.sum(tgt[..., cls], axis=-1, keepdims=True)
    loss = (jnp.mean((grad2d(p, sobel_x) - grad2d(t, sobel_x)) ** 2)
            + jnp.mean((grad2d(p, sobel_y) - grad2d(t, sobel_y)) ** 2))
    return 0.5 * loss


def calc_triplet_loss(anchor, positive, negative, margin: float = 1.0):
    """Triplet margin loss on flattened embeddings (custom_loss:71-80)."""
    d_ap = jnp.linalg.norm((anchor - positive).reshape(anchor.shape[0], -1), axis=1)
    d_an = jnp.linalg.norm((anchor - negative).reshape(anchor.shape[0], -1), axis=1)
    return jnp.mean(jnp.maximum(d_ap - d_an + margin, 0.0))


def contrastive_loss(a, b, label, margin: float = 2.0, eps: float = 1e-9):
    """Pairwise contrastive loss (custom_loss.ContrastiveLoss:83-98);
    reference semantics: label=1 same class (pull via squared distance),
    label=0 different (push to margin); 0.5 * mean."""
    d2 = jnp.sum((b - a).reshape(a.shape[0], -1) ** 2, axis=1)
    push = jnp.maximum(margin - jnp.sqrt(d2 + eps), 0.0) ** 2
    return jnp.mean(0.5 * (label * d2 + (1.0 - label) * push))


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
    """MSE between softmaxed maps (custom_loss.calc_segmentation_mse_consistency
    :772-776): routed through the consistency 'mse' branch, i.e. summed
    squared error / (N*H*W)."""
    return calc_segmentation_consistency(pred_logit, ref_logit,
                                         divergence_types=("mse",),
                                         divergence_weights=(1.0,))


def calc_segmentation_consistency(pred_logit, ref_logit, divergence_types=("kl", "contour"),
                                  divergence_weights=(1.0, 0.5), num_classes: int = 4,
                                  scales=(0,)):
    """Multi-scale multi-divergence consistency (custom_loss:892-974).

    Supported divergences: kl | ce | mse | Dice | contour.  Exact reference
    arithmetic per branch: mse = summed squared error / (N*H*W) (:946-955),
    contour = per-foreground-class single-channel contour losses averaged
    (:956-967), each scale's term weighted by 2**scale (:971), result
    averaged over scales.
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
                n, h, wd = p.shape[0], p.shape[1], p.shape[2]
                loss = jnp.sum(
                    (jax.nn.softmax(p, -1) - jax.nn.softmax(r, -1)) ** 2
                ) / (n * h * wd)
            elif name == "Dice":
                loss = soft_dice_loss(p, r, target_is_soft_logits=True)
            elif name == "contour":
                sp = jax.nn.softmax(p, -1)
                sr = jax.nn.softmax(r, -1)
                loss = 0.0
                for i in range(1, num_classes):
                    loss = loss + contour_loss(
                        sp[..., i:i + 1], sr[..., i:i + 1], num_classes=1,
                        foreground_only=False, one_hot_target=False)
                loss = loss / max(num_classes - 1, 1)
            else:
                raise NotImplementedError(name)
            total = total + (2 ** scale) * w * loss
    return total / len(scales)


def soft_dice_loss_3d(logits, target, weight=None, smooth: float = 0.01):
    """3-D soft Dice (custom_loss.SoftDiceLoss3D:399-438): NDHWC logits.

    The generic :func:`soft_dice_loss` already reduces over all spatial
    axes, so the 3-D case is the same computation at ndim=5.  (The
    reference class itself cannot be constructed — its __init__ calls
    super(SoftDiceLoss, ...) from SoftDiceLoss3D, a TypeError.)
    """
    assert logits.ndim == 5, "expect NDHWC"
    return soft_dice_loss(logits, target, weight=weight, smooth=smooth)


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
        # realized reference behavior: SoftDiceLoss.forward ACCEPTS a weight
        # argument and never uses it (custom_loss.py:366-397), so 'weighted
        # dice' trains identically to 'dice'; reproduced for parity (pass a
        # weight to soft_dice_loss directly for real class weighting).
        return soft_dice_loss(pred, target)
    if loss_type == "foreground dice":
        return selective_soft_dice_loss(pred, target, list(range(1, num_classes)))
    if loss_type == "focal":
        return focal_loss(pred, target, gamma=2.0)
    if loss_type == "contour_smooth":
        return contour_loss(jax.nn.softmax(pred, -1), target, num_classes)
    raise NotImplementedError(loss_type)
