"""On-device data augmentation (pure jnp, vmapped per sample, jit-safe).

TPU-native re-design of the reference's CPU transform pipeline
(medseg/dataset_loader/transform.py:46-112 + _utils/{affine,intensity,
elastic}_transform.py).  The reference runs ~12 numpy/scipy/torchsample
stages per sample in DataLoader worker processes; here the whole policy is a
single jitted function over the batch, so augmentation rides the TPU instead
of bottlenecking on host CPUs.

Stage mapping (reference order preserved: pad -> flip -> bias v1 -> bias v2 ->
brightness/contrast -> affine -> group rotation -> elastic -> coarse elastic ->
center crop -> percentile min-max normalize):

  * ``random_flip``        <- MyRandomFlip (affine_transform.py)
  * ``bias_field_v1``      <- MyRandomPurtarbation (intensity_transform.py:272-370):
    multi-scale Gaussian-smoothed random field, mean-normalized, clipped to
    [1-magnitude, 1+magnitude], multiplied in, then per-image min-max rescale.
  * ``bias_field_v2``      <- MyRandomPurtarbationV2 (:373-546): coarse-grid
    1+U(-m, m) knots smoothly upsampled (B-spline there, bicubic here).
  * ``brightness_contrast``<- RandomBrightnessFluctuation (:114-162):
    scale~U(0.8,1.2), shift~U(-0.1,0.1), clipped to the original range.
  * ``random_gamma``       <- RandomGamma (:68-111).  (Note: the reference
    composes gamma configs but never wires RandomGamma into the pipeline;
    we wire it so the gamma policies actually work.)
  * one fused geometric warp <- ts.RandomAffine (rot/shift/shear/zoom) +
    MyRandomChoiceRotate (45-degree group) + MyElasticTransform (Simard dense
    field: alpha=H*U(1.5,2), sigma=H*U(0.1,0.2)*0.75) + coarse 3x3 N(0,10)
    grid (elastic_transform.py:16-172).  The reference resamples 2-4 times
    with order-3 splines; we compose all geometry into ONE order-3 cubic
    B-spline gather (scipy-parity sampling via ops/spline.py; labels:
    per-class warp with the reference's >=0.5 ascending overwrite,
    elastic_transform.py:86-96).  Single-composition vs sequential
    resampling remains the one (quality-favoring) deviation: it avoids the
    reference's accumulated interpolation blur.
  * ``percentile_normalize`` <- MyNormalizeMedicPercentile (:216-269).

Gaussian smoothing of dense elastic fields with a *traced* sigma uses an FFT
Gaussian (circular boundary) instead of scipy's constant-padded kernel —
distributionally equivalent away from edges and far cheaper on TPU.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field, replace
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------- policy cfg
@dataclass(frozen=True)
class AugmentPolicy:
    """Mirror of the reference policy dicts (transform.py:115-314)."""

    # geometric
    flip_h: bool = False
    flip_v: bool = False
    flip_p: float = 0.0
    shift_val: Tuple[float, float] = (0.0, 0.0)
    rotate_val: float = 0.0
    scale_val: Tuple[float, float] = (1.0, 1.0)
    shear_val: float = 0.0
    rotate_groups: Tuple[float, ...] = ()
    # intensity
    intensity_prob: float = 0.0
    contrast_range: Tuple[float, float] = (0.8, 1.2)
    brightness_range: Tuple[float, float] = (-0.1, 0.1)
    gamma_prob: float = 0.0
    gamma_range: Tuple[float, float] = (0.8, 1.2)
    # elastic
    elastic_prob: float = 0.0
    elastic_prob_v2: float = 0.0
    # bias field v1
    perturb_prob: float = 0.0
    max_sigma: float = 16.0
    multi_control_points: Tuple[int, ...] = (4,)
    perturb_magnitude: float = 0.3
    add_noise: bool = False
    noise_epsilon: float = 0.01
    # bias field v2
    perturb_v2_prob: float = 0.0
    perturb_v2_magnitude: float = 0.2
    ms_control_point_spacing: Tuple[int, ...] = (32,)
    perturb_v2_add_noise: bool = False
    perturb_v2_noise_epsilon: float = 0.01


def _p(**kw) -> AugmentPolicy:
    return AugmentPolicy(**kw)


_ACDC_AFFINE = dict(flip_h=True, flip_v=True, flip_p=0.2, shift_val=(0.1, 0.1),
                    rotate_val=15.0, scale_val=(0.8, 1.1),
                    rotate_groups=tuple(45.0 * i for i in range(8)))

# policy registry (transform.py:16-42 + the policy methods :115-314)
POLICIES: Dict[str, AugmentPolicy] = {
    "no_aug": _p(),
    "scale": _p(scale_val=(0.8, 1.2)),
    "gamma": _p(gamma_prob=0.5),
    "gamma_scale": _p(gamma_prob=0.5, scale_val=(0.9, 1.1)),
    "affine": _p(shift_val=(0.1, 0.1), rotate_val=15.0, scale_val=(0.9, 1.1)),
    "elastic": _p(elastic_prob=1.0),
    "elastic_v2": _p(elastic_prob_v2=1.0),
    "elastic_scale": _p(elastic_prob=0.5, scale_val=(0.9, 1.1)),
    "gamma_elastic": _p(gamma_prob=0.5, elastic_prob=0.5),
    "affine_elastic": _p(shift_val=(0.1, 0.1), rotate_val=15.0,
                         scale_val=(0.9, 1.1), elastic_prob=0.5),
    "affine_gamma": _p(shift_val=(0.1, 0.1), rotate_val=15.0,
                       scale_val=(0.9, 1.1), gamma_prob=0.5),
    "affine_gamma_elastic": _p(shift_val=(0.1, 0.1), rotate_val=15.0,
                               scale_val=(0.9, 1.1), gamma_prob=0.5,
                               elastic_prob=0.5),
    "ACDC_affine": _p(**_ACDC_AFFINE),
    "ACDC_affine_intensity": _p(**_ACDC_AFFINE, intensity_prob=0.5),
    "ACDC_affine_elastic": _p(**_ACDC_AFFINE, elastic_prob=0.5),
    "ACDC_affine_elastic_intensity": _p(**_ACDC_AFFINE, intensity_prob=0.5,
                                        elastic_prob=0.5),
    "ACDC_affine_elastic_intensity_v2": _p(**_ACDC_AFFINE, intensity_prob=0.5,
                                           elastic_prob_v2=0.5),
    "ACDC_affine_perturb": _p(**_ACDC_AFFINE, perturb_prob=0.5, max_sigma=16,
                              multi_control_points=(2, 4, 8), add_noise=True),
    "ACDC_affine_perturb_v2": _p(**_ACDC_AFFINE, perturb_v2_prob=0.5,
                                 perturb_v2_magnitude=0.3,
                                 ms_control_point_spacing=(64, 1),
                                 perturb_v2_add_noise=True),
    "ACDC_affine_elastic_bias": _p(**_ACDC_AFFINE, perturb_v2_prob=0.5,
                                   perturb_v2_magnitude=0.3,
                                   ms_control_point_spacing=(64, 1),
                                   perturb_v2_add_noise=True, elastic_prob=0.5),
    "ACDC_affine_all": _p(**_ACDC_AFFINE, perturb_v2_prob=0.5,
                          perturb_v2_magnitude=0.3,
                          ms_control_point_spacing=(64, 1),
                          perturb_v2_add_noise=True, elastic_prob=0.5,
                          intensity_prob=0.5),
    "Atrial_basic": _p(flip_h=True, flip_v=True, flip_p=0.5,
                       shift_val=(0.1, 0.1), rotate_val=10.0,
                       scale_val=(0.7, 1.3), gamma_range=(0.8, 2.0),
                       gamma_prob=0.5),
    "Atrial_perturb": _p(flip_h=True, flip_v=True, flip_p=0.5,
                         shift_val=(0.1, 0.1), rotate_val=10.0,
                         scale_val=(0.7, 1.3), gamma_range=(0.8, 2.0),
                         gamma_prob=0.5, perturb_prob=0.5, max_sigma=16,
                         multi_control_points=(2, 4, 8)),
    "Prostate_affine_elastic_intensity": _p(flip_h=True, flip_v=True, flip_p=0.5,
                                            shift_val=(0.1, 0.1), rotate_val=15.0,
                                            scale_val=(0.8, 1.2),
                                            intensity_prob=0.5, elastic_prob=0.5),
}


def get_policy(name: str) -> AugmentPolicy:
    if name not in POLICIES:
        raise KeyError(f"unknown augmentation policy {name!r}; have {sorted(POLICIES)}")
    return POLICIES[name]


# ------------------------------------------------------------ basic helpers
def pad_to(x, pad_hw: Tuple[int, int], value: float = 0.0):
    """Center-pad spatial dims of HWC/HW arrays to at least pad_hw
    (ts.PadNumpy)."""
    h, w = x.shape[0], x.shape[1]
    ph = max(0, pad_hw[0] - h)
    pw = max(0, pad_hw[1] - w)
    pads = [(ph // 2 + ph % 2, ph // 2), (pw // 2 + pw % 2, pw // 2)]
    pads += [(0, 0)] * (x.ndim - 2)
    return jnp.pad(x, pads, constant_values=value)


def center_crop(x, crop_hw: Tuple[int, int]):
    """Center crop spatial dims of HWC/HW arrays (MySpecialCrop crop_type=0)."""
    h, w = x.shape[0], x.shape[1]
    hs = (h - crop_hw[0]) // 2
    ws = (w - crop_hw[1]) // 2
    return x[hs:hs + crop_hw[0], ws:ws + crop_hw[1]]


def percentile_normalize(x, perc: Tuple[float, float] = (0.0, 100.0),
                         min_val: float = 0.0, max_val: float = 1.0,
                         eps: float = 1e-8):
    """Percentile-clipped min-max to [min_val, max_val]
    (MyNormalizeMedicPercentile, intensity_transform.py:216-269)."""
    lo = jnp.percentile(x, perc[0])
    hi = jnp.percentile(x, perc[1])
    x = jnp.clip(x, lo, hi)
    # low-anchored affine ((x-lo)/(hi-lo+eps) form): a constant/blank slice
    # maps to min_val, matching the reference's normalization behavior.
    a = (max_val - min_val) / (hi - lo + eps)
    return (x - lo) * a + min_val


def fft_gaussian_blur(x, sigma):
    """2-D Gaussian blur with traced sigma via rFFT (circular boundary).

    Replaces scipy.ndimage.gaussian_filter for dense elastic fields: the
    transfer function of a Gaussian is exp(-2 pi^2 sigma^2 f^2).
    """
    h, w = x.shape
    fy = jnp.fft.fftfreq(h)[:, None]
    fx = jnp.fft.rfftfreq(w)[None, :]
    transfer = jnp.exp(-2.0 * (math.pi ** 2) * (sigma ** 2) * (fy ** 2 + fx ** 2))
    return jnp.fft.irfft2(jnp.fft.rfft2(x) * transfer, s=(h, w))


# -------------------------------------------------------------- warp engine
def _bilinear_sample(img_hwc, ys, xs):
    """Bilinear gather at float coords (H,W) grids; zero outside."""
    h, w, c = img_hwc.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def gather(yi, xi):
        valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))[..., None]
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        return img_hwc[yc, xc] * valid

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def warp_image(img_hwc, ys, xs, order: int = 3):
    """Warp an HWC image at sample coords; zero outside the source frame.

    ``order=3`` (default) is the reference's interpolation order: cubic
    B-spline sampling with 'reflect' coefficient extension, exactly scipy's
    map_coordinates(order=3, mode='reflect') used by the elastic stage
    (elastic_transform.py:95) — realized via two MXU prefilter matmuls
    (ops/spline.py).  Zero fill outside keeps the torchsample affine's
    zero padding for the composed single warp.  ``order=1`` is the cheap
    bilinear path."""
    if order == 1:
        return _bilinear_sample(img_hwc, ys, xs)
    from cooperative_training_and_latent_space_data_augmentation_tpu.ops.spline import (
        map_coordinates_cubic,
    )

    h, w = img_hwc.shape[0], img_hwc.shape[1]
    out = map_coordinates_cubic(img_hwc, ys, xs, mode="reflect")
    valid = ((ys >= 0) & (ys <= h - 1) & (xs >= 0) & (xs <= w - 1))[..., None]
    return jnp.where(valid, out, 0.0).astype(img_hwc.dtype)


def warp_label(label_hw, ys, xs, num_classes: int, order: int = 3):
    """Per-class label warp (elastic_transform.py:86-92): warp each class
    indicator, then overwrite ``result[score_c >= 0.5] = c`` in ascending
    class order (highest overlapping class wins, exactly like the reference
    loop).  ``order=3`` uses scipy-parity cubic sampling with mode='nearest'
    (the reference's label mode); ``order=1`` reduces to one-hot bilinear.
    Outside the source frame scores are zeroed -> background, matching the
    affine's zero fill."""
    # class 0's ascending overwrite writes 0 into a 0-initialized result —
    # a no-op — so only classes 1..C-1 need warping (25 % less prefilter +
    # gather payload at C=4)
    onehot = jax.nn.one_hot(label_hw, num_classes, dtype=jnp.float32)[..., 1:]
    if order == 1:
        scores = _bilinear_sample(onehot, ys, xs)
    else:
        from cooperative_training_and_latent_space_data_augmentation_tpu.ops.spline import (
            map_coordinates_cubic,
        )

        scores = map_coordinates_cubic(onehot, ys, xs, mode="nearest")
    h, w = label_hw.shape
    valid = (ys >= 0) & (ys <= h - 1) & (xs >= 0) & (xs <= w - 1)
    result = jnp.zeros(ys.shape, label_hw.dtype)
    for c in range(1, num_classes):
        hit = (scores[..., c - 1] >= 0.5) & valid
        result = jnp.where(hit, jnp.asarray(c, label_hw.dtype), result)
    return result


def _fused_warp_enabled() -> bool:
    """Trace-time switch for the fused single-gather image+label warp
    (FUSED_WARP env, default ON; FUSED_WARP=0 for the two-gather control)."""
    return os.environ.get("FUSED_WARP", "1") == "1"


_WARP_PAD = 12  # scipy 'nearest' edge pre-pad (ops/spline.py map_coordinates_cubic)


def _fused_warp_coeffs(img_hwc, label_hw, num_classes: int):
    """Channel-concatenated spline-coefficient stack for the fused warp.

    * label channels: exactly warp_label's scipy-'nearest' construction —
      one-hot classes 1..C-1, edge-pad 12, mirror prefilter, 2-wide
      'reflect' pad (ops/spline.py map_coordinates_cubic mode='nearest').
    * image channel: warp_image's 'reflect' prefilter + 2-wide 'symmetric'
      pad, embedded at offset +12 inside the label's padded frame so that
      original tap t sits at padded row t+14 in BOTH stacks; in-domain
      coordinates therefore share indices AND B-spline weights (the +12
      integer shift preserves fractional parts, and reflect/mirror folds
      are the identity inside the domain).  Rows the two boundary
      extensions would disagree on are only fetched for out-of-domain
      coordinates, and both outputs mask those to zero/background.
    """
    from cooperative_training_and_latent_space_data_augmentation_tpu.ops.spline import (
        spline_coefficients,
    )

    pad = _WARP_PAD
    onehot = jax.nn.one_hot(label_hw, num_classes, dtype=jnp.float32)[..., 1:]
    lbl_ext = jnp.pad(onehot, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    lbl_cfp = jnp.pad(spline_coefficients(lbl_ext, "mirror"),
                      ((2, 2), (2, 2), (0, 0)), mode="reflect")
    img_cfp = jnp.pad(spline_coefficients(img_hwc, "reflect"),
                      ((2, 2), (2, 2), (0, 0)), mode="symmetric")
    img_big = jnp.pad(img_cfp, ((pad, pad), (pad, pad), (0, 0)))
    return jnp.concatenate([img_big.astype(jnp.float32), lbl_cfp], axis=-1)


def _fused_warp_prep(ys, xs, h: int, w: int):
    """Clip sample coords into the padded frame, split into integer tap
    start (in the 2-padded coefficient frame) + the 4 cubic B-spline tap
    weights per axis.  Elementwise — works for any leading batch shape."""
    from cooperative_training_and_latent_space_data_augmentation_tpu.ops.spline import (
        _bspline_weights,
    )

    pad = _WARP_PAD
    hl, wl = h + 2 * pad, w + 2 * pad
    yl = jnp.clip(ys + pad, 0.0, hl - 1.0)
    xl = jnp.clip(xs + pad, 0.0, wl - 1.0)
    y0 = jnp.floor(yl)
    x0 = jnp.floor(xl)
    wy = jnp.stack(_bspline_weights(yl - y0), axis=-1)        # (..., 4)
    wx = jnp.stack(_bspline_weights(xl - x0), axis=-1)
    # window/gather start row for tap a is iy + a in the 2-padded frame
    iy = y0.astype(jnp.int32) + 1
    ix = x0.astype(jnp.int32) + 1
    return iy, ix, wy, wx


def _fused_warp_gather_eval(big, iy, ix, wy, wx):
    """Per-pixel (4,4,C)-slice gather evaluation (one sample)."""
    c = big.shape[-1]
    idx = jnp.stack([iy.reshape(-1), ix.reshape(-1)], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(offset_dims=(1, 2, 3),
                                        collapsed_slice_dims=(),
                                        start_index_map=(0, 1))
    g = jax.lax.gather(big, idx, dn, slice_sizes=(4, 4, c))
    out = jnp.einsum("nabc,na,nb->nc", g, wy.reshape(-1, 4), wx.reshape(-1, 4))
    return out.reshape(iy.shape + (c,))


def _fused_warp_post(out, ys, xs, h: int, w: int, n_img: int,
                     num_classes: int, img_dtype, lbl_dtype):
    """Zero-fill the image outside the source frame; reference >=0.5
    ascending per-class overwrite for the label.  Elementwise/batched."""
    valid = (ys >= 0) & (ys <= h - 1) & (xs >= 0) & (xs <= w - 1)
    img_out = jnp.where(valid[..., None], out[..., :n_img],
                        0.0).astype(img_dtype)
    result = jnp.zeros(ys.shape, lbl_dtype)
    for cc in range(1, num_classes):
        hit = (out[..., n_img + cc - 1] >= 0.5) & valid
        result = jnp.where(hit, jnp.asarray(cc, lbl_dtype), result)
    return img_out, result


def warp_image_and_label(img_hwc, label_hw, ys, xs, num_classes: int):
    """Fused order-3 image + per-class label warp sharing ONE gather.

    XLA-TPU gathers pay per INDEX, and warp_image + warp_label each issue a
    192^2-index (4,4,C) neighborhood gather at the same sample coordinates —
    the dominant cost of the device augmentation pipeline.  This fuses both
    into a single gather over a channel-concatenated coefficient array
    (see :func:`_fused_warp_coeffs` for the exactness argument) — pinned
    bit-exact against the separate warps in tests/test_augment.py.

    Returns (warped image HWC, warped label HW) at ys.shape resolution.
    """
    h, w = label_hw.shape
    big = _fused_warp_coeffs(img_hwc, label_hw, num_classes)
    iy, ix, wy, wx = _fused_warp_prep(ys, xs, h, w)
    out = _fused_warp_gather_eval(big, iy, ix, wy, wx)
    return _fused_warp_post(out, ys, xs, h, w, img_hwc.shape[-1],
                            num_classes, img_hwc.dtype, label_hw.dtype)


def _tiled_warp_enabled() -> bool:
    """Trace-time switch for the tile-local matmul warp evaluation
    (TILED_WARP env, default ON; TILED_WARP=0 for the per-pixel gather)."""
    return os.environ.get("TILED_WARP", "1") == "1"


_TILE = 16     # output tile edge (16x16 output pixels per window)
_WINDOW = 48   # source window edge per tile (covers the tile's taps)


def _tilize(a, n: int, gy: int, gx: int, t: int):
    """(N, gy*t, gx*t, *extra) -> (N, gy*gx, t*t, *extra)."""
    extra = a.shape[3:]
    a = a.reshape(n, gy, t, gx, t, *extra)
    a = jnp.moveaxis(a, 3, 2)
    return a.reshape(n, gy * gx, t * t, *extra)


def _untilize(a, n: int, gy: int, gx: int, t: int):
    """(N, gy*gx, t*t, *extra) -> (N, gy*t, gx*t, *extra)."""
    extra = a.shape[3:]
    a = a.reshape(n, gy, gx, t, t, *extra)
    a = jnp.moveaxis(a, 2, 3)
    return a.reshape(n, gy * t, gx * t, *extra)


def _fused_warp_tiled_eval(big, iy, ix, wy, wx, window: int = _WINDOW,
                           tile: int = _TILE):
    """Tile-local MXU evaluation of the fused warp for a BATCH of samples.

    The per-pixel (4,4,C) neighborhood gather retires ~18M indices/s on
    v5e (gather-issue-rate bound, RESULTS.md round 4) — 20 ms of the 21 ms
    device-augmentation batch.  The warp coordinates are smooth (affine +
    blurred elastic), so a 16x16 tile of OUTPUT pixels reads from a small
    contiguous source window: this path dynamic-slices ONE
    (window, window, C) block per tile (256x fewer gather indices) and
    evaluates all 16 cubic taps as dense one-hot row/column-selector
    contractions that ride the MXU:

        T1[p, x, c]  = sum_r rowsel[p, r] * win[r, x, c]   (one matmul/tile)
        out[p, c]    = sum_x colsel[p, x] * T1[p, x, c]

    rowsel[p, r] = sum_a wy[p, a] * [r == ry[p] + a] places each pixel's 4
    y-tap weights on its window rows (likewise colsel on x).  Same taps,
    same weights as the gather path — only the 16-term summation order
    differs (float32 reorder tolerance; a label flip requires a class score
    within ~1e-6 of the 0.5 threshold).

    Returns (out, ok): ok is False when some tile's source spread exceeds
    the static window (possible only in the far tail of the elastic
    distribution — the policy-bounded affine spread of a 16-tile is
    <=1.77*15+1 rows) so callers can lax.cond to the exact gather path.
    """
    n, oh, ow = iy.shape
    gy, gx = oh // tile, ow // tile
    hb, wb, c = big.shape[1], big.shape[2], big.shape[3]

    ty = _tilize(iy, n, gy, gx, tile)                    # (n, G, P)
    tx = _tilize(ix, n, gy, gx, tile)
    twy = _tilize(wy, n, gy, gx, tile)                   # (n, G, P, 4)
    twx = _tilize(wx, n, gy, gx, tile)
    by = jnp.minimum(ty.min(axis=2), hb - window)        # (n, G)
    bx = jnp.minimum(tx.min(axis=2), wb - window)
    ry = ty - by[..., None]                              # (n, G, P) >= 0
    rx = tx - bx[..., None]
    ok = jnp.logical_and((ry <= window - 4).all(), (rx <= window - 4).all())

    def slice_tiles(b, bys, bxs):
        return jax.vmap(lambda y0, x0: jax.lax.dynamic_slice(
            b, (y0, x0, 0), (window, window, c)))(bys, bxs)

    win = jax.vmap(slice_tiles)(big, by, bx)             # (n, G, win, win, C)

    rr = jnp.arange(window, dtype=ry.dtype)
    dy = rr[None, None, None, :] - ry[..., None]         # (n, G, P, win)
    dx = rr[None, None, None, :] - rx[..., None]
    rowsel = jnp.zeros(dy.shape, jnp.float32)
    colsel = jnp.zeros(dx.shape, jnp.float32)
    for a in range(4):
        rowsel = rowsel + jnp.where(dy == a, twy[..., a, None], 0.0)
        colsel = colsel + jnp.where(dx == a, twx[..., a, None], 0.0)

    # HIGHEST: the default (bf16-pass) matmul precision costs ~2^-9 relative
    # error — enough to flip labels near the 0.5 threshold; full f32 keeps
    # the tiled path inside true float-reorder distance of the gather path.
    winf = win.reshape(n, gy * gx, window, window * c)
    t1 = jnp.einsum("ngpr,ngrk->ngpk", rowsel, winf,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    t1 = t1.reshape(n, gy * gx, tile * tile, window, c)
    out_t = (t1 * colsel[..., None]).sum(axis=3)         # (n, G, P, C)
    return _untilize(out_t, n, gy, gx, tile), ok


def warp_image_and_label_batch(imgs_nhwc, labels_nhw, ys, xs,
                               num_classes: int):
    """Batched fused warp with tile-local MXU evaluation + exact fallback.

    Evaluates via :func:`_fused_warp_tiled_eval`; a BATCH-LEVEL ``lax.cond``
    falls back to the per-pixel gather path when any tile's source spread
    exceeds the static window, so results are always exact order-3
    interpolation regardless of how extreme the sampled warp is.  (The cond
    sits OUTSIDE the per-sample vmap on purpose: a vmapped cond degrades to
    executing both branches.)
    """
    h, w = labels_nhw.shape[1], labels_nhw.shape[2]
    big = jax.vmap(
        lambda i, l: _fused_warp_coeffs(i, l, num_classes))(imgs_nhwc,
                                                            labels_nhw)
    iy, ix, wy, wx = _fused_warp_prep(ys, xs, h, w)

    oh, ow = ys.shape[1], ys.shape[2]
    usable = (_tiled_warp_enabled() and oh % _TILE == 0 and ow % _TILE == 0
              and big.shape[1] >= _WINDOW and big.shape[2] >= _WINDOW)
    if not usable:
        out = jax.vmap(_fused_warp_gather_eval)(big, iy, ix, wy, wx)
    else:
        out_tiled, ok = _fused_warp_tiled_eval(big, iy, ix, wy, wx)
        out = jax.lax.cond(
            ok,
            lambda: out_tiled,
            lambda: jax.vmap(_fused_warp_gather_eval)(big, iy, ix, wy, wx),
        )
    return _fused_warp_post(out, ys, xs, h, w, imgs_nhwc.shape[-1],
                            num_classes, imgs_nhwc.dtype, labels_nhw.dtype)


def _affine_inverse_matrix(key, policy: AugmentPolicy, h: int, w: int):
    """Random inverse affine (rotation+group-rotation, shear, zoom, shift)
    about the image center (ts.RandomAffine + MyRandomChoiceRotate)."""
    k_rot, k_shift, k_shear, k_zoom, k_group = jax.random.split(key, 5)
    deg = jax.random.uniform(k_rot, (), minval=-policy.rotate_val,
                             maxval=policy.rotate_val)
    if policy.rotate_groups:
        groups = jnp.asarray(policy.rotate_groups)
        gi = jax.random.randint(k_group, (), 0, len(policy.rotate_groups))
        deg = deg + groups[gi]
    theta = -deg * math.pi / 180.0  # inverse rotation
    shear = -jax.random.uniform(k_shear, (), minval=-policy.shear_val,
                                maxval=policy.shear_val) * math.pi / 180.0
    zoom = jax.random.uniform(k_zoom, (), minval=policy.scale_val[0],
                              maxval=policy.scale_val[1])
    ty = jax.random.uniform(k_shift, (), minval=-policy.shift_val[0],
                            maxval=policy.shift_val[0]) * h
    tx = jax.random.uniform(jax.random.fold_in(k_shift, 1), (),
                            minval=-policy.shift_val[1],
                            maxval=policy.shift_val[1]) * w
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.array([[cos, -sin], [sin, cos]])
    shear_m = jnp.array([[1.0, jnp.tan(shear)], [0.0 * shear, 1.0]])
    inv_zoom = 1.0 / zoom
    mat = rot @ shear_m * inv_zoom
    return mat, jnp.array([ty, tx])


def _base_grid(h: int, w: int):
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return ys, xs


def _elastic_field(key, h: int, w: int, policy: AugmentPolicy):
    """Simard dense displacement (elastic_transform.MyElasticTransform:16-101):
    dx,dy ~ U(-1,1) blurred with sigma=H*U(0.1,0.2)*3/4, scaled by
    alpha=H*U(1.5,2)."""
    k_a, k_s, k_dx, k_dy = jax.random.split(key, 4)
    alpha = h * jax.random.uniform(k_a, (), minval=1.5, maxval=2.0)
    sigma = h * jax.random.uniform(k_s, (), minval=0.1, maxval=0.2) * 0.75
    dx = jax.random.uniform(k_dx, (h, w), minval=-1.0, maxval=1.0)
    dy = jax.random.uniform(k_dy, (h, w), minval=-1.0, maxval=1.0)
    # scipy's gaussian_filter is normalized; the FFT Gaussian preserves that.
    dx = fft_gaussian_blur(dx, sigma) * alpha
    dy = fft_gaussian_blur(dy, sigma) * alpha
    return dy, dx


def _coarse_elastic_field(key, h: int, w: int, mu: float = 0.0, sigma: float = 10.0):
    """3x3 coarse N(mu, sigma) grid upsampled bicubically
    (MyElasticTransformCoarseGrid:105-172)."""
    k1, k2 = jax.random.split(key)
    dx = jax.image.resize(jax.random.normal(k1, (3, 3)) * sigma + mu, (h, w), "bicubic")
    dy = jax.image.resize(jax.random.normal(k2, (3, 3)) * sigma + mu, (h, w), "bicubic")
    return dy, dx


# ----------------------------------------------------------- intensity ops
def random_flip(key, img_hwc, label_hw, policy: AugmentPolicy):
    """MyRandomFlip: per-axis coin with probability flip_p."""
    k_h, k_v = jax.random.split(key)
    if policy.flip_h and policy.flip_p > 0:
        do = jax.random.uniform(k_h, ()) < policy.flip_p
        img_hwc = jnp.where(do, img_hwc[:, ::-1], img_hwc)
        label_hw = jnp.where(do, label_hw[:, ::-1], label_hw)
    if policy.flip_v and policy.flip_p > 0:
        do = jax.random.uniform(k_v, ()) < policy.flip_p
        img_hwc = jnp.where(do, img_hwc[::-1], img_hwc)
        label_hw = jnp.where(do, label_hw[::-1], label_hw)
    return img_hwc, label_hw


# Amplitude gain matching the reference's *realized* V1 field.  The torch
# reference (intensity_transform.py:334-338) builds each per-scale field via
# ``Image.fromarray(float32_grid, mode='L')`` — deprecated PIL behavior that
# REINTERPRETS the float32 bytes as uint8, so the Gaussian-smoothed grid is
# replaced by byte noise.  With the intended mode ('F') the field degenerates
# to a constant 1.0 (measured: post-clip std = 0.000) — i.e. the byte quirk
# IS the augmentation that trained the published models.  The JAX rebuild
# keeps the intended structure (random coarse grids, bicubic upsample,
# 1/cp scale weights, sigma=max_sigma blur, mean normalization, clip) and
# scales the pre-clip fluctuation so the post-clip statistics match the
# realized reference distribution (lifted-construction targets, 100 draws at
# 224^2, magnitude 0.3: std 0.235, clip fractions 0.24/0.21, autocorr
# half-length 48-64 px; this gain gives 0.236/0.23/0.22/64 — validated by
# tests/test_augment_fields.py).
_V1_REALIZED_GAIN = 1.75


def bias_field_v1_field(key, h: int, w: int, policy: AugmentPolicy):
    """The V1 multiplicative bias field itself (MyRandomPurtarbation,
    intensity_transform.py:300-345): per-scale random control grids ->
    bicubic upsample -> 1/cp weights -> sum -> Gaussian(max_sigma) blur ->
    normalize to mean 1 -> clip to [1 +/- magnitude]."""
    keys = jax.random.split(key, len(policy.multi_control_points))
    total = jnp.zeros((h, w))
    for i, cp in enumerate(sorted(policy.multi_control_points)):
        # No grid-level blur: the reference's gaussian_filter(grid, 2*cp) is
        # destroyed by the PIL byte-reinterpretation (see _V1_REALIZED_GAIN),
        # so the realized per-scale fields are unsmoothed noise grids.
        field = jax.random.uniform(keys[i], (cp, cp))
        interp = jax.image.resize(field, (h, w), "bicubic")
        interp = interp / (interp.sum() * cp + 1e-12)
        total = total + interp
    total = fft_gaussian_blur(total, jnp.asarray(policy.max_sigma))
    total = total / (total.sum() + 1e-12) * (h * w)  # ~identity field
    total = 1.0 + _V1_REALIZED_GAIN * (total - 1.0)
    return jnp.clip(total, 1.0 - policy.perturb_magnitude,
                    1.0 + policy.perturb_magnitude)


def bias_field_v1(key, img_hwc, policy: AugmentPolicy):
    """Multi-scale multiplicative bias + rescale + noise
    (MyRandomPurtarbation, intensity_transform.py:272-370)."""
    h, w, c = img_hwc.shape
    k_field, k_noise = jax.random.split(key)
    total = bias_field_v1_field(k_field, h, w, policy)
    out = img_hwc * total[:, :, None]
    mn, mx = out.min(), out.max()
    out = (out - mn) / (mx - mn + 1e-8)
    if policy.add_noise:
        noise = jax.random.normal(k_noise, (h, w, c)) * policy.noise_epsilon
        out = jnp.clip(out + noise, 0.0, 1.0)
    return out


def _bspline_weight_matrix(n_out: int, n_coef: int, spacing: float) -> np.ndarray:
    """Uniform cubic B-spline evaluation weights: W[o, i] = B3(o/spacing - i),
    rows renormalized at the boundary.  Static (shape-only) -> computed in
    numpy at trace time and baked into the jitted graph as a constant; the
    field evaluation itself is then one small matmul per axis (MXU-friendly).
    """
    o = np.arange(n_out, dtype=np.float64)[:, None] / spacing
    i = np.arange(n_coef, dtype=np.float64)[None, :]
    t = np.abs(o - i)
    w = np.where(t < 1, (4 - 6 * t**2 + 3 * t**3) / 6,
                 np.where(t < 2, (2 - t)**3 / 6, 0.0))
    w = w / w.sum(axis=1, keepdims=True)
    return w.astype(np.float32)


def bias_field_v2_field(key, h: int, w: int, policy: AugmentPolicy):
    """The V2 B-spline bias field (MyRandomPurtarbationV2,
    intensity_transform.py:420-520).

    Reference construction (note: the torch class HARDCODES
    ``ms_control_point_spacing=[64]`` regardless of its constructor arg,
    intensity_transform.py:405): extend the canvas to h + 1.5*spacing, place
    1 + U(-m, m) knots every ``spacing`` px, evaluate a bicubic spline at
    every pixel, normalize the extended field to mean 1, center-crop back,
    clip to [1 +/- m].  The scipy smoothing spline (s=3) is replaced by a
    uniform cubic B-spline with the knots as coefficients — validated
    distributionally (mean/std/clip-fraction/autocorrelation) against the
    scipy construction by tests/test_augment_fields.py.
    """
    spacing = max(int(policy.ms_control_point_spacing[0]), 1)
    m = abs(policy.perturb_v2_magnitude)
    ext_h = int(round(h + spacing * 1.5))
    ext_w = int(round(w + spacing * 1.5))
    n_h = len(range(-(ext_h // 2), ext_h // 2 + 1, spacing))
    n_w = len(range(-(ext_w // 2), ext_w // 2 + 1, spacing))
    knots = 1.0 + jax.random.uniform(key, (n_h, n_w), minval=-m, maxval=m)
    w_y = jnp.asarray(_bspline_weight_matrix(ext_h, n_h, spacing))
    w_x = jnp.asarray(_bspline_weight_matrix(ext_w, n_w, spacing))
    z = w_y @ knots @ w_x.T
    z = z / (z.sum() + 1e-12) * (ext_h * ext_w)  # mean 1 on the EXTENDED field
    off_h, off_w = (ext_h - h) // 2, (ext_w - w) // 2
    z = jax.lax.dynamic_slice(z, (off_h, off_w), (h, w))
    return jnp.clip(z, 1.0 - m, 1.0 + m)


def bias_field_v2(key, img_hwc, policy: AugmentPolicy):
    """Coarse-knot B-spline multiplicative bias + rescale + noise
    (MyRandomPurtarbationV2:373-546)."""
    h, w, c = img_hwc.shape
    k_field, k_noise = jax.random.split(key)
    bias = bias_field_v2_field(k_field, h, w, policy)
    out = img_hwc * bias[:, :, None]
    mn, mx = out.min(), out.max()
    out = (out - mn) / (mx - mn + 1e-8)
    if policy.perturb_v2_add_noise:
        noise = jax.random.normal(k_noise, (h, w, c)) * policy.perturb_v2_noise_epsilon
        out = jnp.clip(out + noise, 0.0, 1.0)
    return out


def brightness_contrast(key, img_hwc, policy: AugmentPolicy):
    """scale/shift with range preservation (RandomBrightnessFluctuation:114-162)."""
    k_s, k_b = jax.random.split(key)
    scale = jax.random.uniform(k_s, (), minval=policy.contrast_range[0],
                               maxval=policy.contrast_range[1])
    bright = jax.random.uniform(k_b, (), minval=policy.brightness_range[0],
                                maxval=policy.brightness_range[1])
    mn, mx = img_hwc.min(), img_hwc.max()
    return jnp.clip(img_hwc * scale + bright, mn, mx)


def random_gamma(key, img_hwc, policy: AugmentPolicy):
    """x ** (1/gamma) with range preservation (RandomGamma:68-111)."""
    gamma = jax.random.uniform(key, (), minval=policy.gamma_range[0],
                               maxval=policy.gamma_range[1])
    mn, mx = img_hwc.min(), img_hwc.max()
    return jnp.clip(jnp.maximum(img_hwc, 0.0) ** (1.0 / gamma), mn, mx)


# ------------------------------------------------------------ full pipeline
def _needs_geometry(policy: AugmentPolicy) -> bool:
    return bool(policy.rotate_val > 0 or policy.shift_val != (0.0, 0.0)
                or policy.scale_val != (1.0, 1.0) or policy.shear_val > 0
                or policy.rotate_groups or policy.elastic_prob > 0
                or policy.elastic_prob_v2 > 0)


def _seq_warp_enabled() -> bool:
    """Deviation-A/B arm (PARITY.md deviation ledger): SEQ_WARP=1 resamples
    the geometry SEQUENTIALLY like the reference — one order-3 resample for
    the affine/group-rotation, then a second for the elastic field
    (elastic_transform.py:16-101 applied after the torchsample affine) —
    instead of the shipped single composed resample.  Quality experiment
    only (two gathers; accumulates the reference's interpolation blur)."""
    return os.environ.get("SEQ_WARP", "0") == "1"


def _augment_pre_warp(key, img_hwc, label_hw, policy: AugmentPolicy,
                      pad_hw: Tuple[int, int], crop_hw: Tuple[int, int],
                      raw_geometry: bool = False):
    """Everything before the geometric warp for ONE sample: pad, flips,
    intensity stages, and (when the policy has geometry) the fused warp's
    sample coordinates.  Returns (img at pad_hw, lbl at pad_hw, ya, xa);
    ya/xa are None when the policy needs no geometry.

    ``raw_geometry=True`` (SEQ_WARP arm) returns the UNCOMPOSED pieces
    instead: (img, lbl, (mat, trans, dy_full, dx_full)) with the gated
    elastic displacement at pad resolution — same key draws, same fields."""
    img = pad_to(img_hwc, pad_hw)
    lbl = pad_to(label_hw, pad_hw)
    h, w = img.shape[0], img.shape[1]

    (k_flip, k_b1, k_b2, k_bc, k_gamma, k_affine, k_elastic, k_coarse,
     k_p1, k_p2, k_pbc, k_pg, k_pe, k_pe2) = jax.random.split(key, 14)

    # flips
    img, lbl = random_flip(k_flip, img, lbl, policy)

    # intensity stages (each gated by its probability; computed then selected)
    if policy.perturb_prob > 0:
        out = bias_field_v1(k_b1, img, policy)
        img = jnp.where(jax.random.uniform(k_p1, ()) < policy.perturb_prob, out, img)
    if policy.perturb_v2_prob > 0:
        out = bias_field_v2(k_b2, img, policy)
        img = jnp.where(jax.random.uniform(k_p2, ()) < policy.perturb_v2_prob, out, img)
    if policy.intensity_prob > 0:
        out = brightness_contrast(k_bc, img, policy)
        img = jnp.where(jax.random.uniform(k_pbc, ()) < policy.intensity_prob, out, img)
    if policy.gamma_prob > 0:
        out = random_gamma(k_gamma, img, policy)
        img = jnp.where(jax.random.uniform(k_pg, ()) < policy.gamma_prob, out, img)

    if not _needs_geometry(policy):
        return (img, lbl, None) if raw_geometry else (img, lbl, None, None)

    if raw_geometry:
        h_, w_ = img.shape[0], img.shape[1]
        mat, trans = _affine_inverse_matrix(k_affine, policy, h_, w_)
        dy_full = jnp.zeros((h_, w_), jnp.float32)
        dx_full = jnp.zeros((h_, w_), jnp.float32)
        if policy.elastic_prob > 0:
            dy, dx = _elastic_field(k_elastic, h_, w_, policy)
            do = jax.random.uniform(k_pe, ()) < policy.elastic_prob
            dy_full = dy_full + jnp.where(do, dy, 0.0)
            dx_full = dx_full + jnp.where(do, dx, 0.0)
        if policy.elastic_prob_v2 > 0:
            dy, dx = _coarse_elastic_field(k_coarse, h_, w_)
            do = jax.random.uniform(k_pe2, ()) < policy.elastic_prob_v2
            dy_full = dy_full + jnp.where(do, dy, 0.0)
            dx_full = dx_full + jnp.where(do, dx, 0.0)
        return img, lbl, (mat, trans, dy_full, dx_full)

    # one fused geometric warp: affine(+group rotation) then elastic offsets
    # The center crop is COMPOSED into the warp's output grid: gathers
    # and tap weights are evaluated only at the crop_hw pixels that
    # survive (26 % fewer at 224^2 -> 192^2), bit-identical to warping
    # the full grid and cropping after (the random fields/matrices are
    # generated at pad resolution and sliced, so every sampled
    # coordinate is unchanged; pinned by tests/test_augment.py).
    oy = (h - crop_hw[0]) // 2
    ox = (w - crop_hw[1]) // 2
    ys, xs = _base_grid(crop_hw[0], crop_hw[1])
    ys = ys + oy
    xs = xs + ox
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    mat, trans = _affine_inverse_matrix(k_affine, policy, h, w)
    yc = ys - cy - trans[0]
    xc = xs - cx - trans[1]
    ya = mat[0, 0] * yc + mat[0, 1] * xc + cy
    xa = mat[1, 0] * yc + mat[1, 1] * xc + cx
    if policy.elastic_prob > 0:
        dy, dx = _elastic_field(k_elastic, h, w, policy)
        do = jax.random.uniform(k_pe, ()) < policy.elastic_prob
        ya = ya + jnp.where(do, center_crop(dy, crop_hw), 0.0)
        xa = xa + jnp.where(do, center_crop(dx, crop_hw), 0.0)
    if policy.elastic_prob_v2 > 0:
        dy, dx = _coarse_elastic_field(k_coarse, h, w)
        do = jax.random.uniform(k_pe2, ()) < policy.elastic_prob_v2
        ya = ya + jnp.where(do, center_crop(dy, crop_hw), 0.0)
        xa = xa + jnp.where(do, center_crop(dx, crop_hw), 0.0)
    return img, lbl, ya, xa


def augment_sample(key, img_hwc, label_hw, policy: AugmentPolicy,
                   pad_hw: Tuple[int, int] = (224, 224),
                   crop_hw: Tuple[int, int] = (192, 192),
                   num_classes: int = 4):
    """Full training augmentation for ONE sample (image HWC float [0,1],
    label HW int).  Returns (image HWC float, label HW int) at crop_hw."""
    if _seq_warp_enabled() and _needs_geometry(policy):
        # deviation-A/B arm: the reference's SEQUENTIAL resampling — affine
        # resample at pad resolution, THEN elastic resample composed with
        # the crop (same key draws as the shipped single-composition path)
        img, lbl, geom = _augment_pre_warp(key, img_hwc, label_hw, policy,
                                           pad_hw, crop_hw,
                                           raw_geometry=True)
        mat, trans, dy_full, dx_full = geom
        h, w = img.shape[0], img.shape[1]
        ys0, xs0 = _base_grid(h, w)
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
        yc = ys0 - cy - trans[0]
        xc = xs0 - cx - trans[1]
        ya1 = mat[0, 0] * yc + mat[0, 1] * xc + cy
        xa1 = mat[1, 0] * yc + mat[1, 1] * xc + cx
        img, lbl = warp_image_and_label(img, lbl, ya1, xa1, num_classes)
        oy = (h - crop_hw[0]) // 2
        ox = (w - crop_hw[1]) // 2
        ys2, xs2 = _base_grid(crop_hw[0], crop_hw[1])
        ys2 = ys2 + oy + center_crop(dy_full, crop_hw)
        xs2 = xs2 + ox + center_crop(dx_full, crop_hw)
        img, lbl = warp_image_and_label(img, lbl, ys2, xs2, num_classes)
        img = percentile_normalize(img)
        return img, lbl.astype(jnp.int32)
    img, lbl, ya, xa = _augment_pre_warp(key, img_hwc, label_hw, policy,
                                         pad_hw, crop_hw)
    if ya is None:
        img = center_crop(img, crop_hw)
        lbl = center_crop(lbl, crop_hw)
    elif _fused_warp_enabled():
        img, lbl = warp_image_and_label(img, lbl, ya, xa, num_classes)
    else:
        img = warp_image(img, ya, xa)
        lbl = warp_label(lbl, ya, xa, num_classes)

    img = percentile_normalize(img)
    return img, lbl.astype(jnp.int32)


def augment_batch(keys, images_nhwc, labels_nhw, policy: AugmentPolicy,
                  pad_hw: Tuple[int, int] = (224, 224),
                  crop_hw: Tuple[int, int] = (192, 192),
                  num_classes: int = 4):
    """Batch augmentation = vmap(augment_sample) with the geometric warp
    LIFTED OUT of the vmap so it can run the tile-local MXU evaluation with
    a batch-level exact fallback (warp_image_and_label_batch) — a lax.cond
    under vmap would execute both branches.  Key schedule, stage math, and
    outputs match vmap(augment_sample) (warp values to float32 reorder
    tolerance; pinned in tests/test_augment.py)."""
    one = lambda k, i, l: _augment_pre_warp(k, i, l, policy, pad_hw, crop_hw)
    if _seq_warp_enabled() or not (_needs_geometry(policy)
                                   and _fused_warp_enabled()
                                   and _tiled_warp_enabled()):
        return jax.vmap(
            lambda k, i, l: augment_sample(k, i, l, policy, pad_hw, crop_hw,
                                           num_classes))(keys, images_nhwc,
                                                         labels_nhw)
    img, lbl, ya, xa = jax.vmap(one)(keys, images_nhwc, labels_nhw)
    img, lbl = warp_image_and_label_batch(img, lbl, ya, xa, num_classes)
    img = jax.vmap(percentile_normalize)(img)
    return img, lbl.astype(jnp.int32)


def eval_transform_sample(img_hwc, label_hw=None,
                          pad_hw: Tuple[int, int] = (224, 224),
                          crop_hw: Tuple[int, int] = (192, 192)):
    """Validate/test transform: pad -> center crop -> min-max normalize
    (transform.py:88-112)."""
    img = percentile_normalize(center_crop(pad_to(img_hwc, pad_hw), crop_hw))
    if label_hw is None:
        return img
    lbl = center_crop(pad_to(label_hw, pad_hw), crop_hw).astype(jnp.int32)
    return img, lbl


class Transformations:
    """API-parity facade over the device augmentation pipeline
    (transform.Transformations:7-112): ``get_transformation()`` returns the
    reference's four named pipelines as *batched jitted device functions*.

      'train'        (key, images NHWC, labels NHW) -> (images, labels)
      'aug_validate' same as 'train' (transform.py:98)
      'validate'     (images, labels) -> (images, labels)  pad-crop-normalize
      'test'         (images,) -> images                   image-only

    Unlike the reference's per-sample CPU torchsample compose, these vmap
    over the batch on device.
    """

    def __init__(self, data_aug_policy_name: str = "ACDC_affine_elastic_intensity",
                 pad_size=(224, 224), crop_size=(192, 192), num_classes: int = 4):
        self.policy_name = data_aug_policy_name
        self.pad_hw = tuple(pad_size[:2])
        self.crop_hw = tuple(crop_size[:2])
        self.num_classes = num_classes

    def get_transformation(self):
        train = make_batch_augment(self.policy_name, self.pad_hw, self.crop_hw,
                                   num_classes=self.num_classes)
        validate = make_batch_eval_transform(self.pad_hw, self.crop_hw)

        @jax.jit
        def test(images):
            # image-only pipeline (transform.py:100-109): label arg omitted
            return jax.vmap(
                lambda i: eval_transform_sample(i, None, self.pad_hw,
                                                self.crop_hw))(images)

        return {"train": train, "validate": validate, "test": test,
                "aug_validate": train}


def motion_estimation(rng, label_nhw, shift: float = 1.0):
    """Inter-slice motion simulation for label stacks
    (affine_transform.motion_estimation:109-134): each slice gets an
    independent random translation ``clip(N(0,1),-3,3)*shift`` applied with
    nearest-neighbor (order-0) sampling and zero fill.

    label_nhw: (N, H, W) int labels.  Returns the shifted stack.
    """
    n, h, w = label_nhw.shape
    shifts = jnp.clip(jax.random.normal(rng, (n, 2)), -3.0, 3.0) * shift

    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]

    def one(slice_hw, dyx):
        # order-0: round source coordinates, zero outside
        sy = jnp.round(ys + dyx[0]).astype(jnp.int32)
        sx = jnp.round(xs + dyx[1]).astype(jnp.int32)
        valid = (sy >= 0) & (sy < h) & (sx >= 0) & (sx < w)
        sy = jnp.clip(sy, 0, h - 1)
        sx = jnp.clip(sx, 0, w - 1)
        out = slice_hw[sy, sx]
        return jnp.where(valid, out, 0)

    return jax.vmap(one)(label_nhw, shifts)


def clahe(image_hw: "np.ndarray", clip_limit: float = 0.01, nbins: int = 256,
          tile_grid: Tuple[int, int] = (8, 8)) -> "np.ndarray":
    """Contrast-limited adaptive histogram equalization, self-contained
    numpy (host-side; the reference wraps skimage ``equalize_adapthist``,
    intensity_transform.MyRandomImageContrastTransform:12-65, which is
    disabled by default in every policy).

    Tile histograms are clipped at ``clip_limit * tile_size`` with the
    excess redistributed, per-tile CDF mappings are bilinearly blended.
    Input any float range; output rescaled to the input's [min, max].
    """
    import numpy as np

    img = np.asarray(image_hw, np.float64)
    lo, hi = img.min(), img.max()
    if hi - lo < 1e-12:
        return np.asarray(image_hw).copy()
    norm = (img - lo) / (hi - lo)
    h, w = norm.shape
    gh, gw = tile_grid
    bins = np.minimum((norm * (nbins - 1)).astype(np.int64), nbins - 1)

    # per-tile clipped-CDF lookup tables
    ys = np.linspace(0, h, gh + 1).astype(int)
    xs = np.linspace(0, w, gw + 1).astype(int)
    luts = np.zeros((gh, gw, nbins))
    for i in range(gh):
        for j in range(gw):
            tile = bins[ys[i]:ys[i + 1], xs[j]:xs[j + 1]]
            hist = np.bincount(tile.ravel(), minlength=nbins).astype(np.float64)
            limit = max(clip_limit * tile.size, 1.0)
            excess = np.clip(hist - limit, 0, None).sum()
            hist = np.minimum(hist, limit) + excess / nbins
            cdf = np.cumsum(hist)
            luts[i, j] = (cdf - cdf[0]) / max(cdf[-1] - cdf[0], 1e-12)

    # bilinear blend of the 4 surrounding tile mappings per pixel
    cy = (ys[:-1] + ys[1:]) / 2.0
    cx = (xs[:-1] + xs[1:]) / 2.0
    py = np.clip(np.interp(np.arange(h), cy, np.arange(gh)), 0, gh - 1)
    px = np.clip(np.interp(np.arange(w), cx, np.arange(gw)), 0, gw - 1)
    y0 = np.floor(py).astype(int); y1 = np.minimum(y0 + 1, gh - 1)
    x0 = np.floor(px).astype(int); x1 = np.minimum(x0 + 1, gw - 1)
    fy = (py - y0)[:, None]
    fx = (px - x0)[None, :]

    def lut_at(ti, tj):
        return luts[ti[:, None], tj[None, :], bins]

    out = ((1 - fy) * (1 - fx) * lut_at(y0, x0)
           + (1 - fy) * fx * lut_at(y0, x1)
           + fy * (1 - fx) * lut_at(y1, x0)
           + fy * fx * lut_at(y1, x1))
    return (out * (hi - lo) + lo).astype(np.asarray(image_hw).dtype)


def make_batch_augment(policy_name: str, pad_hw=(224, 224), crop_hw=(192, 192),
                       num_classes: int = 4):
    """Jitted, vmapped batch augmentation: (key, images NHWC, labels NHW) ->
    (images NHWC at crop, labels NHW at crop)."""
    policy = get_policy(policy_name)

    @jax.jit
    def run(key, images, labels):
        keys = jax.random.split(key, images.shape[0])
        return augment_batch(keys, images, labels, policy, pad_hw, crop_hw,
                             num_classes)

    return run


def make_batch_eval_transform(pad_hw=(224, 224), crop_hw=(192, 192)):
    @jax.jit
    def run(images, labels):
        return jax.vmap(
            lambda i, l: eval_transform_sample(i, l, pad_hw, crop_hw))(images, labels)

    return run


def _train_batch_body(key, images, labels, policy, pad_hw, crop_hw,
                      num_classes, keep_orig):
    labels = labels.astype(jnp.int32)
    keys = jax.random.split(key, images.shape[0])
    aug_i, aug_l = augment_batch(keys, images, labels, policy, pad_hw,
                                 crop_hw, num_classes)
    if not keep_orig:
        return {"image": aug_i, "label": aug_l}
    orig_i, orig_l = jax.vmap(
        lambda i, l: eval_transform_sample(i, l, pad_hw, crop_hw))(
            images, labels)
    return {"image": jnp.concatenate([aug_i, orig_i], axis=0),
            "label": jnp.concatenate([aug_l, orig_l], axis=0)}


def make_batch_train_pipeline(policy_name: str, pad_hw=(224, 224),
                              crop_hw=(192, 192), num_classes: int = 4,
                              keep_orig: bool = True):
    """ONE-dispatch training batch assembly: (key, images, labels) ->
    {'image', 'label'} at crop resolution, with the keep_orig
    [augmented || original] concatenation fused into the same jit.

    Exists because per-op dispatch over the tunneled TPU backend is an RPC
    round trip: the previous epoch loop issued augment + eval-transform +
    2x eager ``concatenate`` per iteration (~4 round trips); this is the
    whole per-iteration device-side input pipeline in one.
    """
    policy = get_policy(policy_name)

    @jax.jit
    def run(key, images, labels):
        return _train_batch_body(key, images, labels, policy, pad_hw,
                                 crop_hw, num_classes, keep_orig)

    return run


def make_batch_train_pipeline_indexed(policy_name: str, pad_hw=(224, 224),
                                      crop_hw=(192, 192),
                                      num_classes: int = 4,
                                      keep_orig: bool = True):
    """Device-resident-dataset variant: (key, images_ALL, labels_ALL, idx)
    -> batch.  The whole (padded) dataset lives on device; per iteration the
    host sends only the index vector, and gather + augment + concat run as
    one dispatch — no per-step sample transfer over the tunnel at all."""
    policy = get_policy(policy_name)

    @jax.jit
    def run(key, images_all, labels_all, idx):
        images = jnp.take(images_all, idx, axis=0)
        labels = jnp.take(labels_all, idx, axis=0)
        return _train_batch_body(key, images, labels, policy, pad_hw,
                                 crop_hw, num_classes, keep_orig)

    return run
