"""Residual conv building blocks (flax.linen, NHWC).

TPU-native re-design of the reference's ``medseg/models/ebm/encoder_decoder.py``
building blocks:

  * ``ResConvDown``  <- res_convdown (encoder_decoder.py:19-68): stride-2 3x3
    conv downsample -> residual [conv3-BN-LeakyReLU(0.2)-conv3-BN] with a 1x1
    conv shortcut -> LeakyReLU(0.2), optional channel dropout.
  * ``ResUp``        <- res_up_family (encoder_decoder.py:285-348): upsample
    (NN / bilinear / transposed-conv k2s2 "Conv2" / k4s2p1 "Conv4") followed by
    the same residual pattern.
  * ``ConvBlock``    <- the "inc" double conv (encoder_decoder.py:370-378).

Differences by design (not omissions):
  * NHWC layout (TPU conv-native) instead of NCHW.
  * Norm state is functional: BatchNorm running stats live in the
    ``batch_stats`` collection; callers choose whether to merge updates back,
    which subsumes the reference's ``_disable_tracking_bn_stats`` context
    manager (medseg/models/model_util.py:414-451).
  * Spectral norm (`if_SN`) is not carried over: it is dead in every active
    reference config (`if_SN=False` at advanced_triplet_recon_segmentation_model.py:93-106).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from cooperative_training_and_latent_space_data_augmentation_tpu.ops.pallas_conv import (
    Conv as FastConv,  # nn.Conv drop-in; CHW-lanes Pallas kernel for eligible
    # small-channel 3x3 s1 stages (falls back to the staircase drop-in, then
    # stock nn.Conv, by toggle/eligibility)
    _eligible_channels,
    chw_phase_merge,
    chw_phase_split,
    chw_to_nhwc,
    nhwc_to_chw,
    pallas_path_available,
    pallas_s2_enabled,
)

# Torch BatchNorm2d defaults: momentum=0.1 (i.e. flax momentum 0.9), eps=1e-5.
BN_MOMENTUM = 0.9
BN_EPS = 1e-5

conv_kernel_init = nn.initializers.he_normal()  # reference init_weights(init_type='kaiming')


def _fused_chw_ok(x, features: int) -> bool:
    """Trace-time gate for the CHW-resident fused block paths: the Pallas
    kernel must be available AND every conv in the chain (c_in->features,
    features->features) inside its measured win region."""
    return (pallas_path_available()
            and x.ndim == 4
            and _eligible_channels(x.shape[-1], features)
            and _eligible_channels(features, features))


def chw_chain_ok(c_in: int, features: int) -> bool:
    """Trace-time gate for CHW STAGE CHAINING (encoder_decoder.py drivers):
    like :func:`_fused_chw_ok` but on channel counts (the activation may
    already be CHW-resident from the previous stage)."""
    return (pallas_path_available()
            and _eligible_channels(c_in, features)
            and _eligible_channels(features, features))


def s2_chain_ok(c_in: int, features: int, h: int, w: int) -> bool:
    """Gate for the stride-2 phase-kernel downsample path in ResConvDown."""
    return (pallas_s2_enabled()
            and chw_chain_ok(c_in, features)
            and _eligible_channels(c_in, c_in)
            and h % 2 == 0 and w % 2 == 0)


def bn_scale_init(key, shape, dtype=jnp.float32):
    """BN scale init: normal(mean=1.0, std=0.02) like the reference's
    init_weights (medseg/models/init_weight.py, 'kaiming' branch)."""
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


def leaky_relu(x, negative_slope: float = 0.2):
    return nn.leaky_relu(x, negative_slope=negative_slope)


class BatchNorm(nn.Module):
    """BatchNorm2d equivalent over the channel (last) axis of NHWC tensors.

    ``use_running_average=True``  -> eval mode (torch .eval()).
    ``use_running_average=False`` -> train mode: normalizes with batch stats
    and *emits* updated running stats into the mutable ``batch_stats``
    collection.  Freezing stats (= the reference's
    ``_disable_tracking_bn_stats``) is done by the caller simply discarding
    the emitted updates.

    Implemented directly (not via flax ``nn.BatchNorm``) for exact torch
    running-stat semantics: torch normalizes with the *biased* batch variance
    but updates ``running_var`` with the *unbiased* (Bessel-corrected)
    variance; flax's built-in stores the biased one.  Verified against
    ``nn.BatchNorm2d`` by the weight-transplant tests
    (tests/test_torch_parity.py).
    """

    @nn.compact
    def __call__(self, x, use_running_average: bool, channel_axis: int = -1):
        """``channel_axis=-1`` is NHWC (the default everywhere);
        ``channel_axis=1`` serves the CHW-resident fused block paths
        ((N, C, H*W) activations — see _ResCore).  The parameter/stat tree
        is identical either way: shapes are (C,)."""
        c_ax = channel_axis % x.ndim
        feats = x.shape[c_ax]
        # Stats and affine math always in float32: under bf16 mixed
        # precision the norm is the numerically sensitive op, and XLA fuses
        # the casts into the surrounding convs anyway.
        scale = self.param("scale", bn_scale_init, (feats,))
        bias = self.param("bias", nn.initializers.zeros, (feats,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feats,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feats,), jnp.float32))
        x32 = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(a for a in range(x.ndim) if a != c_ax)
            mean = jnp.mean(x32, axis=reduce_axes)
            bshape = [1] * x.ndim
            bshape[c_ax] = feats
            var = jnp.mean(jnp.square(x32 - mean.reshape(bshape)),
                           axis=reduce_axes)
            if not self.is_initializing():
                n = x.size // feats
                unbiased = var * (n / (n - 1.0)) if n > 1 else var
                m = BN_MOMENTUM
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * unbiased
        bshape = [1] * x.ndim
        bshape[c_ax] = feats
        y = ((x32 - mean.reshape(bshape))
             * jax.lax.rsqrt(var.reshape(bshape) + BN_EPS)
             * scale.reshape(bshape) + bias.reshape(bshape))
        return y.astype(x.dtype)


class Norm(nn.Module):
    """Switchable 2-D norm over the channel (last) axis of NHWC tensors.

    ``kind``: 'batch' (torch nn.BatchNorm2d), 'instance' (torch
    nn.InstanceNorm2d defaults: no affine, no running stats), or 'none'.
    Mirrors the reference's ``norm=`` constructor argument threaded through
    every block (medseg/models/segmentation_models/unet_parts.py:78-116).
    """

    kind: str = "batch"

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        # Norm statistics always in float32 (same mixed-precision policy as
        # BatchNorm above): if bf16 compute ever reaches the UNet baselines,
        # the normalization math must not silently follow it down.
        if self.kind == "batch":
            return BatchNorm()(x, use_running_average)
        if self.kind == "instance":
            return nn.InstanceNorm(epsilon=BN_EPS, use_bias=False,
                                   use_scale=False, dtype=jnp.float32)(x)
        if self.kind == "none":
            return x
        raise NotImplementedError(f"unknown norm kind {self.kind!r}")


class SNConv(nn.Module):
    """Conv with optional spectral normalization (power iteration).

    The reference wraps convs in torch ``spectral_norm`` when ``if_SN``
    (unet_parts.py:276-282); flax's ``nn.SpectralNorm`` keeps the power-
    iteration vector in the ``batch_stats`` collection, which rides the
    same functional-state plumbing as BN running stats.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    padding: Any = "SAME"
    if_SN: bool = False
    dtype: Optional[jnp.dtype] = None  # compute dtype (bf16 mixed precision)

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride), padding=self.padding,
                       kernel_init=conv_kernel_init, dtype=self.dtype or x.dtype)
        if self.if_SN:
            return nn.SpectralNorm(conv)(x, update_stats=train)
        return conv(x)


class ConvTranspose(nn.ConvTranspose):
    """``nn.ConvTranspose`` drop-in with a CHW-lanes entry for the k2s2
    'Conv2' upsample (image decoder, encoder_decoder.py:296-300).

    A stride-2 kernel-2 transposed conv scatters each input pixel into a
    disjoint 2x2 block: y[2r+a, 2c+b, o] = sum_i x[r, c, i] k[1-a, 1-b, i, o]
    — i.e. four channel matmuls followed by a phase merge, which keeps the
    activation in the (N, C, H*W) kernel layout (no NHWC round trip).
    NAMED ``ConvTranspose`` so flax auto-naming keeps the parameter tree
    identical to the stock path.
    """

    @nn.compact
    def __call__(self, x, chw: Optional[tuple] = None):
        if chw is None:
            return super().__call__(x)
        h, w_cols = chw
        ks = self.kernel_size
        ks = (ks, ks) if isinstance(ks, int) else tuple(ks)
        strides = self.strides or 1
        strides = ((strides, strides) if isinstance(strides, int)
                   else tuple(strides))
        assert ks == (2, 2) and strides == (2, 2), (ks, strides)
        assert x.ndim == 3 and x.shape[2] == h * w_cols, (x.shape, chw)
        n, c_in, L = x.shape
        kernel = self.param("kernel", self.kernel_init,
                            (*ks, c_in, self.features), self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype)
        # (N, a, b, C_out, L) with the flip baked in -> phase-major (N, 4*C_out, L)
        yp = jnp.einsum("abio,nil->nabol", kernel[::-1, ::-1], x,
                        preferred_element_type=jnp.float32)
        yp = yp.reshape(n, 4 * self.features, L).astype(x.dtype)
        y = chw_phase_merge(yp, h, w_cols)
        if bias is not None:
            y = y + bias[:, None].astype(y.dtype)
        return y


class ConvBlock(nn.Module):
    """Double conv: conv3-BN-LeakyReLU(0.2)-conv3-BN (no trailing act).

    Mirrors MyEncoder.inc (encoder_decoder.py:370-378); the caller applies
    LeakyReLU afterwards exactly like the reference's forward
    (encoder_decoder.py:404-405).
    """

    features: int
    dtype: Optional[jnp.dtype] = None  # compute dtype (bf16 for MXU speed)

    @nn.compact
    def __call__(self, x, train: bool, keep_chw: bool = False):
        dt = self.dtype or x.dtype
        conv1 = FastConv(self.features, (3, 3), padding="SAME",
                         kernel_init=conv_kernel_init, dtype=dt)
        bn1 = BatchNorm()
        conv2 = FastConv(self.features, (3, 3), padding="SAME",
                         kernel_init=conv_kernel_init, dtype=dt)
        bn2 = BatchNorm()
        if _fused_chw_ok(x, self.features):
            # CHW-resident chain: ONE layout transpose in, one out, instead
            # of one per conv — BN/LReLU run on the (N, C, H*W) activations
            # between the two Pallas convs.  ``keep_chw=True`` (stage
            # chaining: the caller verified the gate) skips the trailing
            # transpose and returns (N, C, H*W).
            n, hh, ww, _ = x.shape
            h = nhwc_to_chw(x)
            h = conv1(h, chw=(hh, ww))
            h = bn1(h, use_running_average=not train, channel_axis=1)
            h = leaky_relu(h)
            h = conv2(h, chw=(hh, ww))
            h = bn2(h, use_running_average=not train, channel_axis=1)
            return h if keep_chw else chw_to_nhwc(h, hh, ww)
        assert not keep_chw, "keep_chw caller must verify the fused gate"
        x = conv1(x)
        x = bn1(x, use_running_average=not train)
        x = leaky_relu(x)
        x = conv2(x)
        x = bn2(x, use_running_average=not train)
        return x


class _ResCore(nn.Module):
    """Shared residual core: LeakyReLU(conv1x1(x) + [conv3-BN-LReLU-conv3-BN](x))."""

    features: int
    dropout: Optional[float] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool,
                 chw: Optional[tuple] = None, keep_chw: bool = False):
        dt = self.dtype or x.dtype
        # FastConv (class name "Conv") for the 1x1 shortcut keeps the flax
        # auto-names identical to the previous nn.Conv ("Conv_0"); its
        # NHWC path for a 1x1 kernel IS stock nn.Conv.
        sc_conv = FastConv(self.features, (1, 1), kernel_init=conv_kernel_init,
                           dtype=dt)
        conv1 = FastConv(self.features, (3, 3), padding="SAME",
                         kernel_init=conv_kernel_init, dtype=dt)
        bn1 = BatchNorm()
        conv2 = FastConv(self.features, (3, 3), padding="SAME",
                         kernel_init=conv_kernel_init, dtype=dt)
        bn2 = BatchNorm()
        if chw is not None or _fused_chw_ok(x, self.features):
            # CHW-resident residual core: one transpose in/out for the whole
            # [1x1-shortcut || conv3-BN-LReLU-conv3-BN] chain (the NHWC path
            # below pays one per conv); the shortcut is a channel matmul in
            # this layout, and the residual add + LReLU stay in (N, C, H*W).
            # ``chw=(h, w)`` means x is ALREADY (N, C, H*W) (stage chaining —
            # the caller verified the gate); ``keep_chw=True`` returns that
            # layout.
            if chw is not None:
                hh, ww = chw
                xc = x
            else:
                n, hh, ww, _ = x.shape
                xc = nhwc_to_chw(x)
            sc = sc_conv(xc, chw=(hh, ww))
            h = conv1(xc, chw=(hh, ww))
            h = bn1(h, use_running_average=not train, channel_axis=1)
            h = leaky_relu(h)
            h = conv2(h, chw=(hh, ww))
            h = bn2(h, use_running_average=not train, channel_axis=1)
            out = leaky_relu(sc.astype(h.dtype) + h)
            if not keep_chw:
                out = chw_to_nhwc(out, hh, ww)
            drop_dims = (2,) if keep_chw else (1, 2)
        else:
            assert not keep_chw, "keep_chw caller must verify the fused gate"
            shortcut = sc_conv(x)
            h = conv1(x)
            h = bn1(h, use_running_average=not train)
            h = leaky_relu(h)
            h = conv2(h)
            h = bn2(h, use_running_average=not train)
            out = leaky_relu(shortcut.astype(h.dtype) + h)
            drop_dims = (1, 2)
        if self.dropout is not None and self.dropout > 0:
            # Channel dropout (torch nn.Dropout2d): drop whole feature maps —
            # in CHW layout that is broadcasting over the flat pixel dim.
            out = nn.Dropout(
                rate=self.dropout,
                broadcast_dims=drop_dims,  # share mask over H, W
                deterministic=not train,
            )(out)
        return out


class ResConvDown(nn.Module):
    """Stride-2 downsample + residual block (res_convdown, encoder_decoder.py:19-68)."""

    features: int
    dropout: Optional[float] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool,
                 chw: Optional[tuple] = None, keep_chw: bool = False):
        # torch Conv2d(in, in, 3, stride=2, padding=1): for even inputs this
        # takes pixels at odd offsets; SAME padding with stride 2 matches the
        # output size (H/2) for even H.
        dt = self.dtype or x.dtype
        if chw is not None:
            hh, ww = chw
            c_in = x.shape[1]
        elif x.ndim == 4:
            _, hh, ww, c_in = x.shape
        if chw is not None or s2_chain_ok(c_in, self.features, hh, ww):
            # Phase-kernel downsample (ops/pallas_conv.py stride-2 path): the
            # phase split replaces the NHWC boundary transpose, the conv runs
            # on the MXU, and the stage stays CHW-resident into the residual
            # core.  FastConv is still auto-named "Conv_0" — identical
            # parameter tree.
            xc = x if chw is not None else nhwc_to_chw(x)
            xp = chw_phase_split(xc, hh, ww)
            h = FastConv(c_in, (3, 3), strides=(2, 2),
                         padding=((1, 1), (1, 1)),
                         kernel_init=conv_kernel_init, dtype=dt)(
                             xp, phase_chw=(hh, ww))
            return _ResCore(self.features, self.dropout, self.dtype)(
                h, train, chw=(hh // 2, ww // 2), keep_chw=keep_chw)
        assert not keep_chw, "keep_chw caller must verify s2_chain_ok"
        x = nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    kernel_init=conv_kernel_init, dtype=dt)(x)
        return _ResCore(self.features, self.dropout, self.dtype)(x, train)


def upsample_nearest(x, factor: int = 2):
    n, h, w, c = x.shape
    x = jnp.repeat(x, factor, axis=1)
    x = jnp.repeat(x, factor, axis=2)
    return x


def upsample_nearest_chw(x_chw, H: int, W: int, factor: int = 2):
    """Nearest-neighbor x2 on (N, C, H*W) activations without leaving the
    CHW-lanes layout (no NHWC round trip): reshape + repeat on the spatial
    axes, channels stay on the sublane dim."""
    n, c, L = x_chw.shape
    x = x_chw.reshape(n, c, H, W)
    x = jnp.repeat(jnp.repeat(x, factor, axis=2), factor, axis=3)
    return x.reshape(n, c, H * W * factor * factor)


def upsample_bilinear_chw(x_chw, H: int, W: int, factor: int = 2):
    """align_corners=True bilinear x`factor` on (N, C, H*W) (same sampling
    grid as :func:`upsample_bilinear`, spatial gathers on the trailing axes
    of the reshaped (N, C, H, W) view)."""
    n, c, L = x_chw.shape
    x = x_chw.reshape(n, c, H, W)
    oh, ow = H * factor, W * factor

    def coords(out_n, in_n):
        if out_n == 1 or in_n == 1:
            return jnp.zeros((out_n,), jnp.float32)
        return jnp.arange(out_n, dtype=jnp.float32) * ((in_n - 1) / (out_n - 1))

    ys, xs = coords(oh, H), coords(ow, W)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    fy = (ys - y0).reshape(1, 1, oh, 1).astype(x.dtype)
    fx = (xs - x0).reshape(1, 1, 1, ow).astype(x.dtype)
    top = x[:, :, y0][:, :, :, x0] * (1 - fx) + x[:, :, y0][:, :, :, x1] * fx
    bot = x[:, :, y1][:, :, :, x0] * (1 - fx) + x[:, :, y1][:, :, :, x1] * fx
    out = top * (1 - fy) + bot * fy
    return out.reshape(n, c, oh * ow)


def upsample_bilinear(x, factor: int = 2):
    """align_corners=True bilinear upsample (torch nn.UpsamplingBilinear2d).

    jax.image.resize uses half-pixel centers (align_corners=False), so the
    corner-aligned sampling grid is built explicitly: out coord i maps to
    input coord i * (in-1)/(out-1).
    """
    n, h, w, c = x.shape
    oh, ow = h * factor, w * factor

    def coords(out_n, in_n):
        if out_n == 1 or in_n == 1:
            return jnp.zeros((out_n,), jnp.float32)
        return jnp.arange(out_n, dtype=jnp.float32) * ((in_n - 1) / (out_n - 1))

    ys, xs = coords(oh, h), coords(ow, w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fy = (ys - y0).reshape(1, oh, 1, 1).astype(x.dtype)
    fx = (xs - x0).reshape(1, 1, ow, 1).astype(x.dtype)
    top = x[:, y0][:, :, x0] * (1 - fx) + x[:, y0][:, :, x1] * fx
    bot = x[:, y1][:, :, x0] * (1 - fx) + x[:, y1][:, :, x1] * fx
    return top * (1 - fy) + bot * fy


class ResUp(nn.Module):
    """Upsample + residual block (res_up_family, encoder_decoder.py:285-348).

    ``up_type``: 'NN' | 'bilinear' | 'Conv2' (transposed conv k2s2) |
    'Conv4' (transposed conv k4s2p1).
    """

    features: int
    up_type: str = "NN"
    dropout: Optional[float] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool,
                 chw: Optional[tuple] = None, keep_chw: bool = False):
        if chw is not None:
            # CHW-resident stage chaining (caller verified chw_chain_ok and
            # an upsample type with a CHW path): upsample on the (N, C, H*W)
            # view, residual core stays in the kernel layout.
            hh, ww = chw
            if self.up_type == "NN":
                x = upsample_nearest_chw(x, hh, ww)
            elif self.up_type == "bilinear":
                x = upsample_bilinear_chw(x, hh, ww)
            elif self.up_type == "Conv2":
                x = ConvTranspose(x.shape[1], (2, 2), strides=(2, 2),
                                  kernel_init=conv_kernel_init,
                                  dtype=self.dtype or x.dtype)(x, chw=chw)
            else:
                raise NotImplementedError(
                    f"no CHW path for up_type {self.up_type!r}")
            return _ResCore(self.features, self.dropout, self.dtype)(
                x, train, chw=(hh * 2, ww * 2), keep_chw=keep_chw)
        assert not keep_chw, "keep_chw caller must verify the chain gate"
        in_ch = x.shape[-1]
        dt = self.dtype or x.dtype
        if self.up_type == "NN":
            x = upsample_nearest(x)
        elif self.up_type == "bilinear":
            x = upsample_bilinear(x)
        elif self.up_type == "Conv2":
            x = ConvTranspose(in_ch, (2, 2), strides=(2, 2),
                              kernel_init=conv_kernel_init, dtype=dt)(x)
        elif self.up_type == "Conv4":
            # torch k4s2p1 doubles H/W; in flax that output size is 'SAME'.
            x = nn.ConvTranspose(in_ch, (4, 4), strides=(2, 2), padding="SAME",
                                 kernel_init=conv_kernel_init, dtype=dt)(x)
        else:
            raise NotImplementedError(f"unknown up_type {self.up_type!r}")
        return _ResCore(self.features, self.dropout, self.dtype)(x, train)
