"""Tensor/image utilities (pure jnp, NHWC).

Re-design of ``medseg/common_utils/basic_operations.py``: construct_input
(:110-158), rescale_intensity (:242-254), z_score_intensity (:257-272),
crop_or_pad (:173-219), recover_image (:161-170), random in/outpainting
(:275-334), shuffle_tensor (:87-107).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def one_hot(labels, num_classes: int, dtype=jnp.float32):
    return jax.nn.one_hot(labels, num_classes, dtype=dtype)


def construct_input(segmentation, num_classes: Optional[int] = None, image=None,
                    apply_softmax: bool = True, temperature: float = 2.0,
                    is_labelmap: bool = False, smooth_label: bool = False,
                    rng: Optional[jax.Array] = None):
    """Build the STN input from logits or a label map
    (basic_operations.construct_input:110-158).

    * logits (NHWC): temperature-softmax ``softmax(logits / T)``.
    * label map (NHW int): one-hot; optional label smoothing with
      alpha ~ U(0, 0.1) noise toward uniform.
    * optional channel-concat of the image.
    """
    assert not (apply_softmax and is_labelmap)
    if not is_labelmap:
        seg = segmentation
        if apply_softmax:
            seg = jax.nn.softmax(seg / temperature, axis=-1)
    else:
        assert num_classes is not None, "please specify num_classes"
        seg = one_hot(segmentation, num_classes)
        if smooth_label:
            assert rng is not None
            alpha = jax.random.uniform(rng, ()) * 0.1
            seg = (1.0 - alpha) * seg + alpha / num_classes
    if image is not None:
        return jnp.concatenate([seg, image], axis=-1)
    return seg


def rescale_intensity(x, new_min: float = 0.0, new_max: float = 1.0, eps: float = 1e-20):
    """Per-sample min-max rescale over all non-batch dims
    (basic_operations.rescale_intensity:242-254)."""
    n = x.shape[0]
    flat = x.reshape(n, -1)
    mn = jnp.min(flat, axis=1).reshape((n,) + (1,) * (x.ndim - 1))
    mx = jnp.max(flat, axis=1).reshape((n,) + (1,) * (x.ndim - 1))
    return (x - mn) / (mx - mn + eps) * (new_max - new_min) + new_min


def z_score_intensity(x, eps: float = 1e-20):
    """Per-sample z-score normalization (basic_operations:257-272)."""
    n = x.shape[0]
    flat = x.reshape(n, -1)
    mean = jnp.mean(flat, axis=1).reshape((n,) + (1,) * (x.ndim - 1))
    std = jnp.std(flat, axis=1).reshape((n,) + (1,) * (x.ndim - 1))
    return (x - mean) / (std + eps)


def center_crop_or_pad(image, crop_hw: Tuple[int, int], pad_value: float = 0.0):
    """Center crop/pad the spatial dims of (..., H, W) arrays to crop_hw
    (basic_operations.crop_or_pad:173-219).  Static-shape, jit-safe."""
    h, w = image.shape[-2], image.shape[-1]
    new_h, new_w = crop_hw
    # pad first if needed
    pad_h = max(0, new_h - h)
    pad_w = max(0, new_w - w)
    if pad_h or pad_w:
        pads = [(0, 0)] * (image.ndim - 2) + [
            (pad_h // 2 + pad_h % 2, pad_h // 2),
            (pad_w // 2 + pad_w % 2, pad_w // 2),
        ]
        image = jnp.pad(image, pads, constant_values=pad_value)
        h, w = image.shape[-2], image.shape[-1]
    h_s = (h - new_h) // 2
    w_s = (w - new_w) // 2
    return image[..., h_s:h_s + new_h, w_s:w_s + new_w]


def center_crop_or_pad_nhwc(image, crop_hw: Tuple[int, int], pad_value: float = 0.0,
                            channel_last: bool = True):
    """Center crop/pad along H, W.

    ``channel_last=True`` (default): NHWC or HWC input — H, W are axes
    -3, -2.  ``channel_last=False``: NHW / HW input — H, W are the LAST two
    axes (moveaxis would otherwise treat W as a channel axis and crop the
    batch dimension instead).
    """
    if not channel_last:
        return center_crop_or_pad(image, crop_hw, pad_value)
    moved = jnp.moveaxis(image, -1, 0)  # C(.., H, W)
    out = center_crop_or_pad(moved, crop_hw, pad_value)
    return jnp.moveaxis(out, 0, -1)


def recover_image(image, h_s: int, w_s: int, origin_h: int, origin_w: int):
    """Paste a cropped (N, H, W) image back into the original canvas
    (basic_operations.recover_image:161-170)."""
    n, h, w = image.shape
    canvas = jnp.zeros((n, origin_h, origin_w), image.dtype)
    return canvas.at[:, h_s:h_s + h, w_s:w_s + w].set(image)


def shuffle_tensor(rng, x):
    """Batch roll by a random shift (basic_operations.shuffle_tensor:87-107)."""
    shift = jax.random.randint(rng, (), 1, x.shape[0])
    return jnp.roll(x, shift, axis=0)


def _block_noise_mask(rng, hw: Tuple[int, int], n_blocks: int,
                      min_frac: float, max_frac: float):
    """Union of n random rectangles as a {0,1} HxW mask (Model-Genesis style)."""
    h, w = hw
    keys = jax.random.split(rng, n_blocks * 4).reshape(n_blocks, 4, 2)
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    mask = jnp.zeros((h, w), jnp.float32)
    for i in range(n_blocks):
        kh, kw, ky, kx = keys[i]
        bh = jax.random.randint(kh, (), int(h * min_frac), max(int(h * max_frac), int(h * min_frac) + 1))
        bw = jax.random.randint(kw, (), int(w * min_frac), max(int(w * max_frac), int(w * min_frac) + 1))
        y0 = jax.random.randint(ky, (), 3, h - int(h * max_frac) - 3)
        x0 = jax.random.randint(kx, (), 3, w - int(w * max_frac) - 3)
        block = ((ys >= y0) & (ys < y0 + bh) & (xs >= x0) & (xs < x0 + bw))
        mask = jnp.maximum(mask, block.astype(jnp.float32))
    return mask


def random_inpainting(rng, image, n_blocks: int = 5,
                      min_frac: float = 0.1, max_frac: float = 0.25):
    """Replace random blocks with uniform noise
    (basic_operations.random_inpainting:275-305).  NHWC input."""
    k_mask, k_noise = jax.random.split(rng)
    masks = jax.vmap(lambda k: _block_noise_mask(k, image.shape[1:3], n_blocks,
                                                 min_frac, max_frac))(
        jax.random.split(k_mask, image.shape[0]))
    masks = masks[..., None]
    noise = jax.random.uniform(k_noise, image.shape, image.dtype)
    return image * (1 - masks) + noise * masks


def sharpen_predictions(logits_or_probs, temperature: float = 0.5,
                        apply_softmax: bool = True):
    """MixMatch-style prediction sharpening (model_util.py:361-368).

    NHWC class axis (-1).  ``apply_softmax`` mirrors the reference, which
    always softmaxes its input first.
    """
    p = jax.nn.softmax(logits_or_probs, axis=-1) if apply_softmax else logits_or_probs
    cal = p ** (1.0 / temperature)
    return cal / jnp.sum(cal, axis=-1, keepdims=True)


def filter_unlabelled_predictions(probs, threshold: float = 0.8):
    """Per-pixel confidence maps from max class prob (model_util.py:343-358).

    Returns 1.0 where the max class probability exceeds ``threshold`` and
    0.0 elsewhere, broadcast over the class axis (NHWC).  The reference's
    in-place `[foreground_predictions > 0] = 1` line degenerates to all-ones
    on softmax inputs (every prob > 0); we implement the documented intent
    — a binary confidence gate — instead of the bug.
    """
    probs = jax.lax.stop_gradient(probs)
    max_prob = jnp.max(probs, axis=-1, keepdims=True)
    conf = jnp.where(max_prob > threshold, 1.0, 0.0)
    return jnp.broadcast_to(conf, probs.shape)


def unit_norm(x, use_p_norm: bool = False, eps: float = 1e-10):
    """Per-sample abs-max rescale, optional l2 normalize (model_util.py:396-411)."""
    n = x.shape[0]
    abs_max = jnp.max(jnp.abs(x.reshape(n, -1)), axis=1)
    abs_max = abs_max.reshape((n,) + (1,) * (x.ndim - 1))
    x = x / (eps + abs_max)
    if use_p_norm:
        norm = jnp.sqrt(jnp.sum(x.reshape(n, -1) ** 2, axis=1))
        norm = norm.reshape((n,) + (1,) * (x.ndim - 1))
        x = x / (eps + norm)
    return x


def random_outpainting(rng, image, n_blocks: int = 5,
                       min_frac: float = 0.25, max_frac: float = 0.4):
    """Keep random blocks, noise everywhere else
    (basic_operations.random_outpainting:307-334).  NHWC input."""
    k_mask, k_noise = jax.random.split(rng)
    masks = jax.vmap(lambda k: _block_noise_mask(k, image.shape[1:3], n_blocks,
                                                 min_frac, max_frac))(
        jax.random.split(k_mask, image.shape[0]))
    masks = masks[..., None]
    noise = jax.random.uniform(k_noise, image.shape, image.dtype)
    return image * masks + noise * (1 - masks)
