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
            a = upsample_bilinear(a)
            a = jnp.concatenate([skip, a], axis=-1)
            return drop(dc(feats)(a, train), dec)

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
    """UNet with auxiliary heads on coarse decoder levels (unet.py:201-319).

    Returns (main_logits, [aux_logits...]) when ``train`` else main logits.
    """

    num_classes: int = 4
    feature_scale: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.feature_scale
        x1 = DoubleConv(64 // f)(x, train)
        x2 = DoubleConv(128 // f)(_maxpool2(x1), train)
        x3 = DoubleConv(256 // f)(_maxpool2(x2), train)
        x4 = DoubleConv(512 // f)(_maxpool2(x3), train)
        x5 = DoubleConv(512 // f)(_maxpool2(x4), train)

        def up(a, skip, feats):
            a = upsample_bilinear(a)
            a = jnp.concatenate([skip, a], axis=-1)
            return DoubleConv(feats)(a, train)

        d1 = up(x5, x4, 256 // f)
        d2 = up(d1, x3, 128 // f)
        d3 = up(d2, x2, 64 // f)
        d4 = up(d3, x1, 64 // f)
        out = nn.Conv(self.num_classes, (1, 1), kernel_init=conv_kernel_init,
                      dtype=d4.dtype)(d4)
        aux1 = nn.Conv(self.num_classes, (1, 1), kernel_init=conv_kernel_init,
                       dtype=d1.dtype)(d1)
        aux2 = nn.Conv(self.num_classes, (1, 1), kernel_init=conv_kernel_init,
                       dtype=d2.dtype)(d2)
        n, h, w, c = out.shape
        aux1 = jnp.reshape(
            upsample_bilinear(upsample_bilinear(upsample_bilinear(aux1))), (n, h, w, c))
        aux2 = jnp.reshape(upsample_bilinear(upsample_bilinear(aux2)), (n, h, w, c))
        if train:
            return out, [aux1, aux2]
        return out


class FCN(nn.Module):
    """Bai-style multi-scale aggregation FCN (fcn.py:10-197)."""

    num_classes: int = 4
    feature_scale: int = 4
    input_channel: int = 1
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

        def up_to(a, times):
            for _ in range(times):
                a = upsample_bilinear(a)
            return a

        feats = jnp.concatenate(
            [o1, up_to(o2, 1), up_to(o3, 2), up_to(o4, 3), up_to(o5, 4)], axis=-1)
        feats = ConvBNRelu_(64, kernel=1)(feats, train)
        feats = ConvBNRelu_(64, kernel=1)(feats, train)
        return nn.Conv(self.num_classes, (1, 1), kernel_init=conv_kernel_init,
                       dtype=jnp.float32)(feats.astype(jnp.float32))
