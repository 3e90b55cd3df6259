"""3-D UNet parts (flax, NDHWC).

TPU-native re-design of the reference's 3-D building blocks
(``medseg/models/segmentation_models/unet_parts.py``: UnetConv3 :639-663,
UnetUp3 :605-636) plus a minimal volumetric UNet assembled from them.
Layout is NDHWC (channels last, TPU conv-native); ``z_scale_factor`` mirrors
the reference's anisotropic upsampling knob (cardiac stacks have few
slices, so z is often left unscaled).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cooperative_training_and_latent_space_data_augmentation_tpu.models.blocks import (
    BatchNorm,
    conv_kernel_init,
)


class UnetConv3(nn.Module):
    """Double 3-D conv: [conv3x3x3 - (BN) - ReLU] x2 (unet_parts.py:639-663)."""

    features: int
    is_batchnorm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3, 3), padding="SAME",
                        kernel_init=conv_kernel_init, dtype=x.dtype)(x)
            if self.is_batchnorm:
                # shared rank-agnostic BatchNorm (torch running-var semantics)
                x = BatchNorm()(x, use_running_average=not train)
            x = nn.relu(x)
        return x


def _upsample3d(x, factors: Tuple[int, int, int]):
    n, d, h, w, c = x.shape
    return jax.image.resize(
        x, (n, d * factors[0], h * factors[1], w * factors[2], c),
        method="trilinear")


class UnetUp3(nn.Module):
    """3-D up block (unet_parts.py:605-636): trilinear upsample (H/W x2,
    z by ``z_scale_factor``) -> skip concat -> UnetConv3.  The deconv
    variant uses a transposed conv instead of the resize."""

    features: int
    is_deconv: bool = False
    is_batchnorm: bool = True
    z_scale_factor: int = 1

    @nn.compact
    def __call__(self, skip, x, train: bool = False):
        if self.is_deconv:
            zs = self.z_scale_factor
            kernel = (4, 4, 4) if zs != 1 else (zs, 4, 4)
            strides = (2, 2, 2) if zs != 1 else (zs, 2, 2)
            x = nn.ConvTranspose(self.features, kernel, strides=strides,
                                 padding="SAME", kernel_init=conv_kernel_init,
                                 dtype=x.dtype)(x)
        else:
            x = _upsample3d(x, (self.z_scale_factor, 2, 2))
        x = jnp.concatenate([skip, x], axis=-1)
        return UnetConv3(self.features, self.is_batchnorm)(x, train)


class UNet3D(nn.Module):
    """Minimal volumetric UNet from the 3-D parts: H/W downsample by 2 at
    each level, z kept (cardiac stacks are thin), widths (64,128,256)//f."""

    num_classes: int = 4
    feature_scale: int = 4
    is_batchnorm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.feature_scale
        x1 = UnetConv3(64 // f, self.is_batchnorm)(x, train)
        p1 = nn.max_pool(x1, (1, 2, 2), strides=(1, 2, 2))
        x2 = UnetConv3(128 // f, self.is_batchnorm)(p1, train)
        p2 = nn.max_pool(x2, (1, 2, 2), strides=(1, 2, 2))
        x3 = UnetConv3(256 // f, self.is_batchnorm)(p2, train)
        h = UnetUp3(128 // f, is_batchnorm=self.is_batchnorm)(x2, x3, train)
        h = UnetUp3(64 // f, is_batchnorm=self.is_batchnorm)(x1, h, train)
        return nn.Conv(self.num_classes, (1, 1, 1), kernel_init=conv_kernel_init,
                       dtype=h.dtype)(h)
