"""Latent-space masking: hard-example generation ops (pure jnp + jax.grad).

The algorithmic heart of the framework — a TPU-native re-design of
``medseg/models/model_util.py:180-318`` and
``advanced_triplet_recon_segmentation_model.perturb_latent_code`` (:300-350):

  * ``dropout_mask``            <- F.dropout2d branch (:332-336)
  * ``mask_latent_code_channel_wise``  <- model_util.py:180-255
  * ``mask_latent_code_spatial_wise``  <- model_util.py:258-318
  * ``perturb_latent_code``     <- the dispatcher, with 'random' drawing
    uniformly among {dropout, spatial, channel} via ``lax.switch``.

Everything here is pure and jit-safe: gradients w.r.t. the latent code come
from ``jax.grad`` through a caller-supplied ``decoder_fn`` (whose parameters
the caller must ``stop_gradient`` — mirroring set_grad(..., False) at
advanced...py:486-487); thresholds use sorted saliency exactly like the
reference's ``sort(desc)[:, int(dim*p)]`` indexing (model_util.py:230-236).
This lets the whole hard-example generation stack fuse into the jitted
cooperative train step (one XLA graph, no host round-trips).

Latent codes are NHWC (N, h, w, C) — channel masking masks the last axis,
spatial masking masks (h, w).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class MaskSettings(NamedTuple):
    """Static masking configuration (config's `latent_DA.{image,shape} code`)."""

    loss_name: str = "mse"          # mse | ce | corr
    mask_type: str = "random"       # random | dropout | spatial | channel
    max_threshold: float = 0.5
    random_threshold: bool = True
    if_soft: bool = True


def _task_loss(decoder_fn: Callable, code, target, loss_name: str, num_classes: int):
    """Task loss whose latent-gradient drives targeted masking
    (model_util.py:212-221, 273-281).

    target: image (NHWC float) for 'mse'/'corr', or NHW int labels for 'ce'
    (one-hotted for 'mse'/'corr' like make_one_hot at :207-210).
    """
    out = decoder_fn(code)
    if loss_name == "corr":
        gt = target if target.ndim == out.ndim else jax.nn.one_hot(
            target, num_classes, dtype=out.dtype)
        return jnp.mean(out * gt)
    if loss_name == "mse":
        gt = target if target.ndim == out.ndim else jax.nn.one_hot(
            target, num_classes, dtype=out.dtype)
        return jnp.mean((out - gt) ** 2)
    if loss_name == "ce":
        from cooperative_training_and_latent_space_data_augmentation_tpu.ops.losses import (
            cross_entropy_2d,
        )
        return cross_entropy_2d(out, target)
    raise NotImplementedError(loss_name)


USE_PALLAS_MASK = True  # fused TPU kernel for the percentile mask (C22)


def _threshold_mask(saliency, percentile, dim: int, if_soft: bool,
                    rng: Optional[jax.Array]):
    """Descending-sort percentile threshold -> {0 | 0.5*U(0,1) | 1} mask.

    Exactly mirrors model_util.py:230-244/292-306 including the
    ``int(dim * p)`` index semantics (elements with saliency strictly greater
    than the value at that sorted index are masked).
    ``saliency``: (N, dim).  Returns (N, dim) float mask.

    On TPU this dispatches to the fused sort-free Pallas kernel
    (ops/pallas_kernels.fused_percentile_mask); the jnp path below is the
    portable reference implementation.
    """
    if USE_PALLAS_MASK and jax.default_backend() == "tpu":
        from cooperative_training_and_latent_space_data_augmentation_tpu.ops.pallas_kernels import (
            fused_percentile_mask,
        )
        if if_soft:
            assert rng is not None
            soft_vals = 0.5 * jax.random.uniform(rng, saliency.shape, jnp.float32)
        else:
            soft_vals = jnp.zeros(saliency.shape, jnp.float32)
        return fused_percentile_mask(saliency, percentile,
                                     soft_vals).astype(saliency.dtype)
    idx = jnp.clip(jnp.floor(dim * percentile).astype(jnp.int32), 0, dim - 1)
    sorted_desc = -jnp.sort(-saliency, axis=1)
    thresh = jax.lax.dynamic_index_in_dim(sorted_desc, idx, axis=1, keepdims=True)
    exceed = saliency > thresh
    if if_soft:
        assert rng is not None
        soft_vals = 0.5 * jax.random.uniform(rng, saliency.shape, saliency.dtype)
        mask = jnp.where(exceed, soft_vals, jnp.ones_like(saliency))
    else:
        mask = jnp.where(exceed, jnp.zeros_like(saliency), jnp.ones_like(saliency))
    return mask


def _resolve_percentile(rng: Optional[jax.Array], percentile: float, random: bool):
    """p ~ U(0,1) * percentile when random (model_util.py:228-229)."""
    if random:
        assert rng is not None
        return jax.random.uniform(rng, ()) * percentile
    return jnp.asarray(percentile)


def mask_latent_code_channel_wise(code, decoder_fn: Callable, target, rng,
                                  num_classes: int = 2, percentile: float = 1 / 3.0,
                                  random: bool = False, loss_name: str = "corr",
                                  if_soft: bool = False):
    """Targeted channel masking (model_util.mask_latent_code_channel_wise:180-255).

    Gradient of the task loss w.r.t. the code, averaged per channel ->
    (N, C) saliency; channels above the top-p percentile value are masked
    (hard: 0, soft: 0.5*U(0,1)).  Returns (masked_code, mask[N,1,1,C]).
    """
    k_thr, k_soft = jax.random.split(rng)
    code = jax.lax.stop_gradient(code)
    grad = jax.grad(lambda z: _task_loss(decoder_fn, z, target, loss_name,
                                         num_classes))(code)
    n, h, w, c = code.shape
    saliency = jnp.mean(grad.reshape(n, h * w, c), axis=1)  # N, C
    p = _resolve_percentile(k_thr, percentile, random)
    mask = _threshold_mask(saliency, p, c, if_soft, k_soft)
    mask = mask.reshape(n, 1, 1, c)
    return code * mask, mask


def mask_latent_code_spatial_wise(code, decoder_fn: Callable, target, rng,
                                  num_classes: int = 2, percentile: float = 1 / 3.0,
                                  random: bool = False, loss_name: str = "corr",
                                  if_soft: bool = False):
    """Targeted spatial masking (model_util.mask_latent_code_spatial_wise:258-318).

    Saliency = channel-mean gradient -> (N, h*w); top-p locations masked.
    Returns (masked_code, mask[N,h,w,1]).
    """
    k_thr, k_soft = jax.random.split(rng)
    code = jax.lax.stop_gradient(code)
    grad = jax.grad(lambda z: _task_loss(decoder_fn, z, target, loss_name,
                                         num_classes))(code)
    n, h, w, c = code.shape
    saliency = jnp.mean(grad, axis=-1).reshape(n, h * w)
    p = _resolve_percentile(k_thr, percentile, random)
    mask = _threshold_mask(saliency, p, h * w, if_soft, k_soft)
    mask = mask.reshape(n, h, w, 1)
    return code * mask, mask


def dropout_mask(code, rng, p: float = 0.5):
    """Random channel dropout (F.dropout2d branch, advanced...py:332-336).

    Drops whole channels per sample with probability p and scales survivors
    by 1/(1-p) (torch dropout2d semantics).  Returns (masked_code, mask) where
    the mask is the *binary keep mask* broadcast over (h, w).

    Note: the reference recovers its returned mask by elementwise comparison
    ``masked == code`` which, due to the 1/(1-p) rescale, marks rescaled
    survivors as dropped; the mask is only a diagnostic byproduct there
    (never used downstream), so we return the true keep mask instead.
    """
    n, h, w, c = code.shape
    keep = jax.random.bernoulli(rng, 1.0 - p, (n, 1, 1, c)).astype(code.dtype)
    scale = 1.0 / (1.0 - p) if p < 1.0 else 0.0
    return code * keep * scale, jnp.broadcast_to(keep, code.shape)


def perturb_latent_code(code, decoder_fn: Callable, target, rng,
                        settings: MaskSettings, num_classes: int = 4,
                        return_branch: bool = False):
    """Latent-code perturbation dispatcher
    (advanced_triplet_recon_segmentation_model.perturb_latent_code:300-350).

    ``settings.mask_type == 'random'`` draws uniformly among
    {dropout, spatial, channel} per call (ref shuffles a 3-list, :325-329)
    via ``lax.switch`` so it stays inside the jitted step.

    The caller is responsible for passing a ``decoder_fn`` with
    stop-gradiented parameters and frozen BN statistics (set_grad(False) +
    _disable_tracking_bn_stats in the reference).  Returns
    ``(masked_code, mask)`` like the reference (mask broadcast to the code
    shape); both are stop-gradiented (`if_detach=True` semantics at
    advanced...py:501,515).

    ``return_branch=True`` additionally returns the executed branch index
    (int32 scalar: 0=dropout, 1=spatial, 2=channel; the static branches
    report their fixed index) — the saliency-BN-update deviation arm
    (SALIENCY_BN_UPDATE=1, train/cooperative.py) needs it because the
    reference's SALIENCY forward tracks BN running stats
    (model_util.py:214-218 runs the raw train-mode decoder) and only the
    saliency branches (spatial/channel) run that forward.
    """
    k_branch, k_op = jax.random.split(rng)
    thr = settings.max_threshold

    # Like the reference, every branch returns (masked_code, mask); masks are
    # broadcast to the full code shape so the lax.switch branches agree
    # (dropout/channel masks span channels, spatial masks span (h, w)).
    def do_dropout(k):
        masked, mask = dropout_mask(code, k, p=thr)
        return masked, mask

    def do_spatial(k):
        masked, mask = mask_latent_code_spatial_wise(
            code, decoder_fn, target, k, num_classes=num_classes,
            percentile=thr, random=settings.random_threshold,
            loss_name=settings.loss_name, if_soft=settings.if_soft)
        return masked, jnp.broadcast_to(mask, code.shape)

    def do_channel(k):
        masked, mask = mask_latent_code_channel_wise(
            code, decoder_fn, target, k, num_classes=num_classes,
            percentile=thr, random=settings.random_threshold,
            loss_name=settings.loss_name, if_soft=settings.if_soft)
        return masked, jnp.broadcast_to(mask, code.shape)

    if settings.mask_type == "dropout":
        masked, mask = do_dropout(k_op)
        branch = jnp.int32(0)
    elif settings.mask_type == "spatial":
        masked, mask = do_spatial(k_op)
        branch = jnp.int32(1)
    elif settings.mask_type == "channel":
        masked, mask = do_channel(k_op)
        branch = jnp.int32(2)
    elif settings.mask_type == "random":
        branch = jax.random.randint(k_branch, (), 0, 3)
        masked, mask = jax.lax.switch(
            branch, [do_dropout, do_spatial, do_channel], k_op)
    else:
        raise NotImplementedError(settings.mask_type)
    out = (jax.lax.stop_gradient(masked), jax.lax.stop_gradient(mask))
    return out + (branch,) if return_branch else out
