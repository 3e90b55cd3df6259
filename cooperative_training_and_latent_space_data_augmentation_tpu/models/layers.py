"""Custom layers: SE blocks, self-attention, adaptive norms (flax, NHWC).

Re-design of ``medseg/models/custom_layers.py``: only `DomainSpecificBatchNorm`
is ever referenced by (unused) reference code; the rest are capability-parity
building blocks (ChannelSELayer :48, SpatialSELayer :77, ChannelSpatialSELayer
:106, Self_Attn :159, BatchInstanceNorm :284).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from cooperative_training_and_latent_space_data_augmentation_tpu.models.blocks import (
    conv_kernel_init,
)


class ChannelSELayer(nn.Module):
    """Squeeze-and-excitation over channels (custom_layers.py:48-75)."""

    reduction_ratio: int = 2

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        squeeze = jnp.mean(x, axis=(1, 2))  # N, C
        # bias-free excitation MLP like the reference (nn.Linear(bias=False))
        h = nn.Dense(c // self.reduction_ratio, use_bias=False, dtype=x.dtype)(squeeze)
        h = nn.relu(h)
        h = nn.Dense(c, use_bias=False, dtype=x.dtype)(h)
        gate = nn.sigmoid(h)[:, None, None, :]
        return x * gate


class SpatialSELayer(nn.Module):
    """Spatial squeeze-and-excitation (custom_layers.py:77-104)."""

    @nn.compact
    def __call__(self, x):
        gate = nn.sigmoid(nn.Conv(1, (1, 1), dtype=x.dtype)(x))
        return x * gate


class ChannelSpatialSELayer(nn.Module):
    """max(cSE, sSE) combination (custom_layers.py:106-123)."""

    reduction_ratio: int = 2

    @nn.compact
    def __call__(self, x):
        return jnp.maximum(
            ChannelSELayer(self.reduction_ratio)(x), SpatialSELayer()(x)
        )


class SelfAttention(nn.Module):
    """SAGAN-style 2-D self-attention (custom_layers.py:159-210).

    Flattens HxW into one token axis — maps to a single big MXU matmul.
    Returns (out, weighted_out, attention) like the reference's 3-tuple.
    """

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        q = nn.Conv(max(c // 8, 1), (1, 1), dtype=x.dtype)(x).reshape(n, h * w, -1)
        k = nn.Conv(max(c // 8, 1), (1, 1), dtype=x.dtype)(x).reshape(n, h * w, -1)
        v = nn.Conv(c, (1, 1), dtype=x.dtype)(x).reshape(n, h * w, c)
        attn = jax.nn.softmax(
            jnp.einsum("nqd,nkd->nqk", q, k, preferred_element_type=jnp.float32), axis=-1
        ).astype(x.dtype)
        out = jnp.einsum("nqk,nkc->nqc", attn, v).reshape(n, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        weighted = gamma * out
        return weighted + x, weighted, attn


class DomainSpecificBatchNorm(nn.Module):
    """Per-domain BatchNorm bank selected by a *static* domain id
    (custom_layers.py:10-46).  Each domain keeps independent stats/affine."""

    num_domains: int = 2

    @nn.compact
    def __call__(self, x, domain_id: int, train: bool = False):
        assert 0 <= domain_id < self.num_domains
        banks = [
            nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=x.dtype, name=f"bn_{d}")
            for d in range(self.num_domains)
        ]
        if self.is_initializing():
            # materialize every domain's params/stats at init; afterwards only
            # the selected domain is run (and only its stats update), exactly
            # like the torch ModuleList selection (custom_layers.py:10-46).
            outs = [bn(x) for bn in banks]
            return outs[domain_id]
        return banks[domain_id](x)


class BatchInstanceNorm(nn.Module):
    """Learnable interpolation between batch norm and instance norm
    (custom_layers.py:284-346)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, use_bias=False, use_scale=False,
                          dtype=x.dtype)(x)
        # epsilon 1e-5 to match the torch reference's F.batch_norm-based
        # instance arm (flax GroupNorm defaults to 1e-6)
        inm = nn.GroupNorm(num_groups=x.shape[-1], use_bias=False, use_scale=False,
                           epsilon=1e-5, dtype=x.dtype)(x)
        rho = self.param("rho", nn.initializers.ones, (x.shape[-1],))
        rho = jnp.clip(rho, 0.0, 1.0)
        gamma = self.param("gamma", nn.initializers.ones, (x.shape[-1],))
        beta = self.param("beta", nn.initializers.zeros, (x.shape[-1],))
        return (rho * bn + (1.0 - rho) * inm) * gamma + beta


def adaptive_instance_norm(x, weight, bias, eps: float = 1e-5):
    """AdaIN (custom_layers.AdaptiveInstanceNorm2d:212-241): instance-
    normalize NHWC ``x`` then scale/shift with externally supplied style
    parameters ``weight``/``bias`` ((C,) or (N, 1, 1, C))."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    return xn * weight + bias


def adaptive_batch_norm(x, weight, bias, eps: float = 1e-5):
    """AdaBN (custom_layers.AdaptiveBatchNorm2d:247-282): batch-normalize
    NHWC ``x`` with batch statistics, scale/shift with supplied params."""
    mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(x, axis=(0, 1, 2), keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    return xn * weight + bias


def bilinear_additive_upsampling(x, to_channel: int):
    """Channel-grouped bilinear additive upsampling (custom_layers.py:125-157)."""

    n, h, w, c = x.shape
    assert c % to_channel == 0
    group = c // to_channel
    up = jax.image.resize(x, (n, 2 * h, 2 * w, c), method="bilinear")
    return up.reshape(n, 2 * h, 2 * w, to_channel, group).sum(axis=-1)


def spatial_pyramid_pool(x, out_bin_sizes=(4, 2, 1)):
    """SPP over NHWC with the reference's EXACT pooling arithmetic
    (custom_layers.py:348-374): per level, a MaxPool2d with ceil(h/s) windows,
    stride = window, and padding (k*s - h + 1)//2 (torch pads max-pool with
    -inf, here realized by clipping each window to the valid region).  For
    divisible sizes this equals AdaptiveMaxPool2d; for non-divisible sizes it
    reproduces the reference's shifted windows.  Features are flattened
    channel-major like the torch NCHW .view(n, -1)."""
    n, h, w, c = x.shape
    feats = []
    for size in out_bin_sizes:
        k_h = -(-h // size)
        k_w = -(-w // size)
        pad_h = (k_h * size - h + 1) // 2
        pad_w = (k_w * size - w + 1) // 2
        bins_h = (h + 2 * pad_h - k_h) // k_h + 1
        bins_w = (w + 2 * pad_w - k_w) // k_w + 1
        rows = []
        for i in range(bins_h):
            y0 = max(i * k_h - pad_h, 0)
            y1 = min(i * k_h - pad_h + k_h, h)
            cols = []
            for j in range(bins_w):
                x0 = max(j * k_w - pad_w, 0)
                x1 = min(j * k_w - pad_w + k_w, w)
                cols.append(jnp.max(x[:, y0:y1, x0:x1, :], axis=(1, 2)))
            rows.append(jnp.stack(cols, axis=1))       # (n, bins_w, c)
        pooled = jnp.stack(rows, axis=1)               # (n, bins_h, bins_w, c)
        feats.append(jnp.transpose(pooled, (0, 3, 1, 2)).reshape(n, -1))
    return jnp.concatenate(feats, axis=1)
