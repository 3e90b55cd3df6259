"""Baseline segmentation networks: UNet family + Bai-style FCN (flax, NHWC).

TPU-native re-design of ``medseg/models/segmentation_models/unet.py`` and
``fcn.py``:

  * ``UNet``                <- UNet (unet.py:9-198): inc double-conv ->
    4x [maxpool2 + double-conv] (64,128,256,512,512)/f -> 4x [bilinear up +
    concat skip + double-conv] -> 1x1 out conv.  ``feature_scale`` in
    {1, 2, 4} yields UNet_64 / UNet_32 / UNet_16.
  * ``DeeplySupervisedUNet``<- DeeplySupervisedUNet (unet.py:201-319): same
    trunk, auxiliary 1x1 heads on the two coarsest decoder levels, upsampled
    and summed/returned for deep supervision.
  * ``FCN``                 <- FCN (fcn.py:10-197): VGG-ish trunk, per-level
    3x3 lateral heads (level_*_out, fcn.py:49-53) upsampled to full
    resolution, concatenated and fused by two 1x1 convs (fcn.py:61).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from cooperative_training_and_latent_space_data_augmentation_tpu.models.blocks import (
    BatchNorm,
    Norm,
    SNConv,
    conv_kernel_init,
    upsample_bilinear,
)


class DoubleConv(nn.Module):
    """conv3-norm-ReLU-conv3-norm-ReLU (unet_parts.double_conv), with the
    reference's ``norm`` / ``if_SN`` constructor knobs (unet_parts.py:13-42)."""

    features: int
    norm: str = "batch"
    if_SN: bool = False
    dtype: Optional[jnp.dtype] = None  # conv compute dtype (norms stay f32)

    @nn.compact
    def __call__(self, x, train: bool):
        for _ in range(2):
            x = SNConv(self.features, if_SN=self.if_SN, dtype=self.dtype)(x, train)
            x = Norm(self.norm)(x, use_running_average=not train)
            x = nn.relu(x)
        return x


class ConvBNRelu(nn.Module):
    """conv-BN-ReLU (unet_parts.conv2DBatchNormRelu)."""

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        pad = "SAME" if self.stride == 1 else ((1, 1), (1, 1))
        if self.kernel == 1:
            pad = "VALID"
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=pad,
                    kernel_init=conv_kernel_init, dtype=self.dtype or x.dtype)(x)
        x = BatchNorm()(x, use_running_average=not train)
        return nn.relu(x)


def _maxpool2(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class UNet(nn.Module):
    num_classes: int = 4
    feature_scale: int = 4  # 4 -> "UNet_16" in the reference registry
    norm: str = "batch"     # 'instance' + if_SN -> "IN_SN_UNet_16"
    if_SN: bool = False     # spectral norm -> "SN_UNet_16"
    encoder_dropout: Optional[float] = None
    decoder_dropout: Optional[float] = None
    dtype: Optional[jnp.dtype] = None  # conv compute dtype (bf16 mixed precision)

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.feature_scale
        dc = lambda feats: DoubleConv(feats, norm=self.norm, if_SN=self.if_SN,
                                      dtype=self.dtype)

        def drop(h, rate):
            # channel dropout after each down/up block (unet_parts.down:176-182)
            if rate:
                h = nn.Dropout(rate=rate, broadcast_dims=(1, 2),
                               deterministic=not train)(h)
            return h

        enc, dec = self.encoder_dropout, self.decoder_dropout
        x1 = drop(dc(64 // f)(x, train), enc)
        x2 = drop(dc(128 // f)(_maxpool2(x1), train), enc)
        x3 = drop(dc(256 // f)(_maxpool2(x2), train), enc)
        x4 = drop(dc(512 // f)(_maxpool2(x3), train), enc)
        x5 = drop(dc(512 // f)(_maxpool2(x4), train), enc)

        def up(a, skip, feats):
            # decoder dropout hits the skip-concat BEFORE the double conv
            # (unet_parts.up:497-500), unlike the encoder's post-conv dropout.
            a = upsample_bilinear(a)
            a = drop(jnp.concatenate([skip, a], axis=-1), dec)
            return dc(feats)(a, train)

        h = up(x5, x4, 256 // f)
        h = up(h, x3, 128 // f)
        h = up(h, x2, 64 // f)
        h = up(h, x1, 64 // f)
        # logits head in f32 (losses/softmax consume these)
        return nn.Conv(self.num_classes, (1, 1), kernel_init=conv_kernel_init,
                       dtype=jnp.float32)(h.astype(jnp.float32))


class UNetv2(nn.Module):
    """UNet with a 1024//f bottleneck and asymmetric decoder widths
    (unet.py:322-403: inc 64 -> down 128/256/512/1024 -> up 256/128/64/64)."""

    num_classes: int = 4
    feature_scale: int = 4
    norm: str = "batch"
    if_SN: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.feature_scale
        dc = lambda feats: DoubleConv(feats, norm=self.norm, if_SN=self.if_SN,
                                      dtype=self.dtype)
        x1 = dc(64 // f)(x, train)
        x2 = dc(128 // f)(_maxpool2(x1), train)
        x3 = dc(256 // f)(_maxpool2(x2), train)
        x4 = dc(512 // f)(_maxpool2(x3), train)
        x5 = dc(1024 // f)(_maxpool2(x4), train)

        def up(a, skip, feats):
            a = upsample_bilinear(a)
            a = jnp.concatenate([skip, a], axis=-1)
            return dc(feats)(a, train)

        h = up(x5, x4, 256 // f)
        h = up(h, x3, 128 // f)
        h = up(h, x2, 64 // f)
        h = up(h, x1, 64 // f)
        return nn.Conv(self.num_classes, (1, 1), kernel_init=conv_kernel_init,
                       dtype=jnp.float32)(h.astype(jnp.float32))


class ResBlock(nn.Module):
    """ReLU residual block: relu(conv1x1(x) + [conv3-norm-relu-conv3-norm](x))
    (unet_parts.res_conv, unet_parts.py:306-345)."""

    features: int
    norm: str = "batch"
    if_SN: bool = False
    dropout: Optional[float] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        dt = self.dtype
        shortcut = SNConv(self.features, kernel=1, if_SN=self.if_SN, dtype=dt)(x, train)
        h = SNConv(self.features, if_SN=self.if_SN, dtype=dt)(x, train)
        h = Norm(self.norm)(h, use_running_average=not train)
        h = nn.relu(h)
        h = SNConv(self.features, if_SN=self.if_SN, dtype=dt)(h, train)
        h = Norm(self.norm)(h, use_running_average=not train)
        out = nn.relu(shortcut.astype(h.dtype) + h)
        if self.dropout is not None and self.dropout > 0:
            out = nn.Dropout(rate=self.dropout, broadcast_dims=(1, 2),
                             deterministic=not train)(out)
        return out


class ResConvUNet(nn.Module):
    """UNet with residual blocks everywhere (resconvunet.py:17-121):
    res_conv inc -> 4x [maxpool + res block] (128,256,512,512)//f ->
    4x [transposed-conv k4s2p1 up + skip concat + res block] -> 1x1 out."""

    num_classes: int = 4
    feature_scale: int = 4
    norm: str = "batch"
    if_SN: bool = False
    encoder_dropout: Optional[float] = None
    decoder_dropout: Optional[float] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.feature_scale
        rb = lambda feats, drop: ResBlock(feats, norm=self.norm,
                                          if_SN=self.if_SN, dropout=drop,
                                          dtype=self.dtype)
        enc_drop, dec_drop = self.encoder_dropout, self.decoder_dropout
        x1 = rb(64 // f, enc_drop)(x, train)
        x2 = rb(128 // f, enc_drop)(_maxpool2(x1), train)
        x3 = rb(256 // f, enc_drop)(_maxpool2(x2), train)
        x4 = rb(512 // f, enc_drop)(_maxpool2(x3), train)
        x5 = rb(512 // f, enc_drop)(_maxpool2(x4), train)

        def up(a, skip, feats):
            # res_conv_up (unet_parts.py:392-437): deconv k4s2p1 keeps
            # channels, then a residual block over the skip concat.
            # torch ConvTranspose2d(k4,s2,p1) doubles H/W; flax's equivalent
            # output size comes from padding='SAME' (flax explicit padding
            # counts output-side trimming differently from torch).
            a = nn.ConvTranspose(a.shape[-1], (4, 4), strides=(2, 2),
                                 padding="SAME", kernel_init=conv_kernel_init,
                                 dtype=self.dtype or a.dtype)(a)
            a = jnp.concatenate([a, skip], axis=-1)
            return rb(feats, dec_drop)(a, train)

        h = up(x5, x4, 256 // f)
        h = up(h, x3, 128 // f)
        h = up(h, x2, 64 // f)
        h = up(h, x1, 64 // f)
        return nn.Conv(self.num_classes, (1, 1), kernel_init=conv_kernel_init,
                       dtype=jnp.float32)(h.astype(jnp.float32))


class DeeplySupervisedUNet(nn.Module):
    """UNet with progressively *mixed* deep-supervision heads (unet.py:201-319).

    Reference semantics: 1x1 heads on the two middle decoder stages are
    summed level-by-level (``dsv_mixed = up2x(dsv_x2) + dsv_x3``) and the
    final output is ``outc(x4) + up2x(dsv_mixed)`` (unet.py:228-251).
    ``multi_out=True`` returns ``(out, dsv_mixed_up, final)``.

    Widths follow ``base_n_filters`` (64 -> 64/128/256/512/512), NOT the
    plain UNet's ``feature_scale``.  Dropout (``nn.Dropout2d``) hits the
    down2/down3/down4 outputs and the up1..up3 skip-concats (unet.py:222-242).
    """

    num_classes: int = 4
    base_n_filters: int = 64
    dropout: Optional[float] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, multi_out: bool = False):
        b = self.base_n_filters
        dc = lambda feats: DoubleConv(feats, dtype=self.dtype)

        def drop(h):
            if self.dropout:
                h = nn.Dropout(rate=self.dropout, broadcast_dims=(1, 2),
                               deterministic=not train)(h)
            return h

        x1 = dc(b)(x, train)
        x2 = dc(b * 2)(_maxpool2(x1), train)
        x3 = drop(dc(b * 4)(_maxpool2(x2), train))
        x4 = drop(dc(b * 8)(_maxpool2(x3), train))
        x5 = drop(dc(b * 8)(_maxpool2(x4), train))

        def up(a, skip, feats, dropout_concat):
            a = upsample_bilinear(a)
            a = jnp.concatenate([skip, a], axis=-1)
            if dropout_concat:
                a = drop(a)
            return dc(feats)(a, train)

        d1 = up(x5, x4, b * 4, True)
        d2 = up(d1, x3, b * 2, True)
        dsv_x2 = nn.Conv(self.num_classes, (1, 1), kernel_init=conv_kernel_init,
                         dtype=jnp.float32)(d2.astype(jnp.float32))
        d3 = up(d2, x2, b, True)
        dsv_x3 = nn.Conv(self.num_classes, (1, 1), kernel_init=conv_kernel_init,
                         dtype=jnp.float32)(d3.astype(jnp.float32))
        dsv_mixed = upsample_bilinear(dsv_x2) + dsv_x3
        dsv_mixed_up = upsample_bilinear(dsv_mixed)
        d4 = up(d3, x1, b, False)
        out = nn.Conv(self.num_classes, (1, 1), kernel_init=conv_kernel_init,
                      dtype=jnp.float32)(d4.astype(jnp.float32))
        final = out + dsv_mixed_up
        if multi_out:
            return out, dsv_mixed_up, final
        return final


class FCN(nn.Module):
    """Bai-style multi-scale aggregation FCN (fcn.py:10-197).

    ``decoder_dropout``: channel dropout applied after BOTH 1x1 fusion convs
    (fcn.py:102-106, F.dropout2d around conv_final).
    """

    num_classes: int = 4
    feature_scale: int = 4
    input_channel: int = 1
    decoder_dropout: Optional[float] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.feature_scale
        filters = [64 // f, 128 // f, 256 // f, 512 // f, 512 // f]

        ConvBNRelu_ = lambda feats, **kw: ConvBNRelu(feats, dtype=self.dtype, **kw)
        h = ConvBNRelu_(filters[0])(x, train)
        l1 = ConvBNRelu_(filters[0])(h, train)

        h = ConvBNRelu_(filters[1], stride=2)(l1, train)
        l2 = ConvBNRelu_(filters[1])(h, train)

        h = ConvBNRelu_(filters[2], stride=2)(l2, train)
        h = ConvBNRelu_(filters[2])(h, train)
        l3 = ConvBNRelu_(filters[2])(h, train)

        h = ConvBNRelu_(filters[3], stride=2)(l3, train)
        h = ConvBNRelu_(filters[3])(h, train)
        l4 = ConvBNRelu_(filters[3])(h, train)

        h = ConvBNRelu_(filters[4], stride=2)(l4, train)
        h = ConvBNRelu_(filters[4])(h, train)
        l5 = ConvBNRelu_(filters[4])(h, train)

        o1 = ConvBNRelu_(filters[0])(l1, train)
        o2 = ConvBNRelu_(filters[0])(l2, train)
        o3 = ConvBNRelu_(filters[0])(l3, train)
        o4 = ConvBNRelu_(filters[0])(l4, train)
        o5 = ConvBNRelu_(filters[0])(l5, train)

        # Single-shot align-corners upsample per level (fcn.py:66-69 uses one
        # nn.Upsample(scale_factor=2**k, align_corners=True) per level, which
        # is NOT numerically equal to k chained 2x upsamples).
        feats = jnp.concatenate(
            [o1, upsample_bilinear(o2, 2), upsample_bilinear(o3, 4),
             upsample_bilinear(o4, 8), upsample_bilinear(o5, 16)], axis=-1)

        def drop(h):
            if self.decoder_dropout:
                h = nn.Dropout(rate=self.decoder_dropout, broadcast_dims=(1, 2),
                               deterministic=not train)(h)
            return h

        feats = drop(ConvBNRelu_(64, kernel=1)(feats, train))
        feats = drop(ConvBNRelu_(64, kernel=1)(feats, train))
        return nn.Conv(self.num_classes, (1, 1), kernel_init=conv_kernel_init,
                       dtype=jnp.float32)(feats.astype(jnp.float32))
