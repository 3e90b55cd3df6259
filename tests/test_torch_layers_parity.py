"""Torch weight-transplant parity for the custom layers (SURVEY C8,
medseg/models/custom_layers.py): SE blocks, SAGAN self-attention,
batch-instance norm, domain-specific BN, AdaIN/AdaBN math, bilinear
additive upsampling, and spatial pyramid pooling."""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

torch = pytest.importorskip("torch")

from medseg.models.custom_layers import (  # noqa: E402
    BatchInstanceNorm2d as TorchBIN,
    ChannelSELayer as TorchCSE,
    ChannelSpatialSELayer as TorchCSSE,
    DomainSpecificBatchNorm2d as TorchDSBN,
    Self_Attn as TorchSelfAttn,
    SpatialSELayer as TorchSSE,
)

from cooperative_training_and_latent_space_data_augmentation_tpu.models import (
    layers,
)

RNG = np.random.RandomState(11)


def _np(t):
    return t.detach().cpu().numpy().copy()


def nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def to_nchw(a_nhwc):
    return np.transpose(np.asarray(a_nhwc), (0, 3, 1, 2))


def rand_img(n=2, h=8, w=8, c=8):
    return RNG.rand(n, h, w, c).astype(np.float32)


def test_channel_se_parity():
    tm = TorchCSE(num_channels=8, reduction_ratio=2)
    x = rand_img()
    sd = tm.state_dict()
    variables = {"params": {
        # torch Linear (out, in) -> flax Dense kernel (in, out); bias-free
        "Dense_0": {"kernel": _np(sd["fc1.weight"]).T},
        "Dense_1": {"kernel": _np(sd["fc2.weight"]).T},
    }}
    with torch.no_grad():
        ref = tm(nchw(x)).numpy()
    got = layers.ChannelSELayer(reduction_ratio=2).apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(to_nchw(got), ref, rtol=0, atol=1e-5)


def test_spatial_se_parity():
    tm = TorchSSE(num_channels=8)
    x = rand_img()
    sd = tm.state_dict()
    variables = {"params": {"Conv_0": {
        "kernel": np.transpose(_np(sd["conv.weight"]), (2, 3, 1, 0)),
        "bias": _np(sd["conv.bias"]),
    }}}
    with torch.no_grad():
        ref = tm(nchw(x)).numpy()
    got = layers.SpatialSELayer().apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(to_nchw(got), ref, rtol=0, atol=1e-5)


def test_channel_spatial_se_parity():
    tm = TorchCSSE(num_channels=8, reduction_ratio=2)
    x = rand_img()
    sd = tm.state_dict()
    variables = {"params": {
        "ChannelSELayer_0": {
            "Dense_0": {"kernel": _np(sd["cSE.fc1.weight"]).T},
            "Dense_1": {"kernel": _np(sd["cSE.fc2.weight"]).T},
        },
        "SpatialSELayer_0": {"Conv_0": {
            "kernel": np.transpose(_np(sd["sSE.conv.weight"]), (2, 3, 1, 0)),
            "bias": _np(sd["sSE.conv.bias"]),
        }},
    }}
    with torch.no_grad():
        ref = tm(nchw(x)).numpy()
    got = layers.ChannelSpatialSELayer(reduction_ratio=2).apply(
        variables, jnp.asarray(x))
    np.testing.assert_allclose(to_nchw(got), ref, rtol=0, atol=1e-5)


def test_self_attention_parity():
    tm = TorchSelfAttn(in_dim=8, activation="relu", factor=8)
    with torch.no_grad():
        tm.gamma.fill_(0.7)  # nonzero so the attention path matters
    x = rand_img(h=6, w=6)
    sd = tm.state_dict()

    def conv(key):
        return {"kernel": np.transpose(_np(sd[f"{key}.weight"]), (2, 3, 1, 0)),
                "bias": _np(sd[f"{key}.bias"])}

    variables = {"params": {
        "Conv_0": conv("query_conv"),
        "Conv_1": conv("key_conv"),
        "Conv_2": conv("value_conv"),
        "gamma": np.float32(0.7),
    }}
    with torch.no_grad():
        ref_final, ref_weighted, ref_attn = tm(nchw(x))
    final, weighted, attn = layers.SelfAttention().apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(to_nchw(final), ref_final.numpy(), rtol=0,
                               atol=2e-5)
    np.testing.assert_allclose(to_nchw(weighted), ref_weighted.numpy(), rtol=0,
                               atol=2e-5)
    # torch attention is (B, N_q, N_k) with softmax over k, like ours
    np.testing.assert_allclose(np.asarray(attn), ref_attn.numpy(), rtol=0,
                               atol=2e-6)


def test_batch_instance_norm_parity():
    tm = TorchBIN(num_features=8)
    with torch.no_grad():
        tm.gate.uniform_(0.2, 0.9)
        tm.weight.uniform_(0.5, 1.5)
        tm.bias.uniform_(-0.3, 0.3)
    tm.train()  # batch-stat BN arm (flax train=True)
    x = rand_img()
    variables = {
        "params": {
            "rho": _np(tm.gate),
            "gamma": _np(tm.weight),
            "beta": _np(tm.bias),
        },
        "batch_stats": {"BatchNorm_0": {
            "mean": _np(tm.running_mean), "var": _np(tm.running_var)}},
    }
    with torch.no_grad():
        ref = tm(nchw(x)).numpy()
    got, _ = layers.BatchInstanceNorm().apply(
        variables, jnp.asarray(x), train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(to_nchw(got), ref, rtol=0, atol=1e-5)


def test_domain_specific_bn_parity():
    tm = TorchDSBN(num_features=8, num_domains=2)
    with torch.no_grad():
        for bn in tm.bns:
            bn.weight.uniform_(0.5, 1.5)
            bn.bias.uniform_(-0.2, 0.2)
    tm.eval()
    # make the two domains' running stats distinct
    with torch.no_grad():
        tm.bns[1].running_mean.fill_(0.3)
        tm.bns[1].running_var.fill_(2.0)
    x = rand_img()
    variables = {
        "params": {f"bn_{d}": {"scale": _np(tm.bns[d].weight),
                               "bias": _np(tm.bns[d].bias)}
                   for d in range(2)},
        "batch_stats": {f"bn_{d}": {"mean": _np(tm.bns[d].running_mean),
                                    "var": _np(tm.bns[d].running_var)}
                        for d in range(2)},
    }
    fm = layers.DomainSpecificBatchNorm(num_domains=2)
    for d in range(2):
        with torch.no_grad():
            ref = tm(nchw(x), domain_id=d).numpy()
        got = fm.apply(variables, jnp.asarray(x), domain_id=d, train=False)
        np.testing.assert_allclose(to_nchw(got), ref, rtol=0, atol=1e-5,
                                   err_msg=f"domain {d}")


def test_adain_adabn_parity():
    """AdaIN/AdaBN math vs the reference's F.batch_norm formulations
    (custom_layers.py:212-282): instance stats (AdaIN) / batch stats (AdaBN),
    biased variance, eps 1e-5, externally supplied affine."""
    x = rand_img()
    w = RNG.rand(8).astype(np.float32) + 0.5
    b = RNG.rand(8).astype(np.float32) - 0.5
    xt = nchw(x)

    # AdaIN reference: batch_norm over (1, b*c, h, w) with training=True
    n, c = xt.shape[0], xt.shape[1]
    resh = xt.reshape(1, n * c, *xt.shape[2:])
    ref_in = torch.nn.functional.batch_norm(
        resh, None, None, torch.from_numpy(np.tile(w, n)),
        torch.from_numpy(np.tile(b, n)), True, 0.1, 1e-5).reshape(xt.shape)
    got_in = layers.adaptive_instance_norm(jnp.asarray(x), jnp.asarray(w),
                                           jnp.asarray(b))
    np.testing.assert_allclose(to_nchw(got_in), ref_in.numpy(), rtol=0,
                               atol=1e-5)

    # AdaBN reference: batch_norm over the full batch with training=True
    ref_bn = torch.nn.functional.batch_norm(
        xt, None, None, torch.from_numpy(w), torch.from_numpy(b), True,
        0.1, 1e-5)
    got_bn = layers.adaptive_batch_norm(jnp.asarray(x), jnp.asarray(w),
                                        jnp.asarray(b))
    np.testing.assert_allclose(to_nchw(got_bn), ref_bn.numpy(), rtol=0,
                               atol=1e-5)


def test_bilinear_additive_upsampling_parity():
    """Math lift of custom_layers.bilinear_additive_upsampling:125-157 (the
    reference function itself ends in an unconditional .cuda())."""
    x = rand_img(c=8)
    xt = nchw(x)
    up = torch.nn.Upsample(scale_factor=2, mode="bilinear")(xt)  # a_c=False
    split = 8 // 4
    ref = torch.stack([up.narrow(1, i * split, split).sum(1) for i in range(4)],
                      dim=1)
    got = layers.bilinear_additive_upsampling(jnp.asarray(x), 4)
    np.testing.assert_allclose(to_nchw(got), ref.numpy(), rtol=0, atol=1e-5)


def test_spatial_pyramid_pool_vs_torch_maxpool():
    """The reference SPP builds MaxPool2d(ceil window, computed pad)
    (custom_layers.py:348-374); compare on a non-divisible size."""
    import math

    x = rand_img(h=10, w=10, c=3)
    xt = nchw(x)
    outs = []
    for s in (4, 2, 1):
        k = math.ceil(10 / s)
        pad = (k * s - 10 + 1) // 2
        p = torch.nn.MaxPool2d(k, stride=k, padding=pad)(xt)
        outs.append(p.reshape(2, -1).numpy())
    ref = np.concatenate(outs, axis=1)
    got = np.asarray(layers.spatial_pyramid_pool(jnp.asarray(x), (4, 2, 1)))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)
