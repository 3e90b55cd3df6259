"""Shape/behavior tests for the model library.

Mirrors the reference's executable smoke blocks
(encoder_decoder.py:646-669, unet.py:405-414, fcn.py:200-213) as real tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cooperative_training_and_latent_space_data_augmentation_tpu.models import (
    FCN,
    Decoder,
    DualBranchEncoder,
    Encoder,
    UNet,
    DeeplySupervisedUNet,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.models.unet import (
    ResConvUNet,
    UNetv2,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.models.layers import (
    ChannelSELayer,
    ChannelSpatialSELayer,
    SelfAttention,
)


def _init_apply(model, x, method=None, train=False):
    variables = model.init(jax.random.PRNGKey(0), x, train=train)
    out, updates = model.apply(
        variables, x, train=train, mutable=["batch_stats"], method=method
    )
    return variables, out


def test_encoder_latent_shape():
    # 192x192 input -> 12x12 latent with 512//4=128 channels
    # (encoder_decoder.py:351-415; advanced...py:87-95).
    x = jnp.zeros((2, 192, 192, 1))
    model = Encoder(feature_reduce=4, act="relu")
    _, z = _init_apply(model, x, train=True)
    assert z.shape == (2, 12, 12, 128)
    assert bool(jnp.all(z >= 0))  # ReLU latent


def test_dual_branch_encoder():
    x = jnp.zeros((2, 192, 192, 1))
    model = DualBranchEncoder(feature_reduce=4)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    (z_i, z_s), _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert z_i.shape == (2, 12, 12, 128)
    assert z_s.shape == (2, 12, 12, 128)
    # filter_code(z_i) must equal the z_s from the joint call (eval mode,
    # mirroring Dual_Branch_Encoder.forward == filter_code(general_encoder(x))).
    (z_i2, z_s2), _ = model.apply(variables, x, train=False, mutable=["batch_stats"])
    z_s3, _ = model.apply(variables, z_i2, train=False, mutable=["batch_stats"],
                          method=DualBranchEncoder.filter_code)
    np.testing.assert_allclose(np.asarray(z_s2), np.asarray(z_s3), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("up_type,last_act,out_ch", [
    ("NN", None, 4),       # segmentation / shape decoder
    ("Conv2", "sigmoid", 1),  # image decoder
])
def test_decoder_shapes(up_type, last_act, out_ch):
    z = jnp.zeros((2, 12, 12, 128))
    model = Decoder(output_channel=out_ch, feature_reduce=4, up_type=up_type,
                    last_act=last_act)
    _, y = _init_apply(model, z, train=True)
    assert y.shape == (2, 192, 192, out_ch)
    if last_act == "sigmoid":
        assert bool(jnp.all((y >= 0) & (y <= 1)))


@pytest.mark.parametrize("net", [
    UNet(num_classes=4, feature_scale=4),
    FCN(num_classes=4, feature_scale=4),
])
def test_baselines(net):
    x = jnp.zeros((2, 96, 96, 1))
    _, y = _init_apply(net, x, train=False)
    assert y.shape == (2, 96, 96, 4)


@pytest.mark.parametrize("net", [
    UNetv2(num_classes=4, feature_scale=4),
    ResConvUNet(num_classes=4, feature_scale=4),
    UNet(num_classes=4, feature_scale=4, if_SN=True),              # SN_UNet_16
    UNet(num_classes=4, feature_scale=4, norm="instance", if_SN=True),  # IN_SN_UNet_16
])
def test_baseline_variants(net):
    """Registry variants (base_segmentation_model.py:78-138): shapes + a
    train-mode pass that exercises SN power iteration / norm state."""
    x = jnp.ones((2, 32, 32, 1)) * 0.5
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    y, _ = net.apply(variables, x, train=True, mutable=["batch_stats"])
    assert y.shape == (2, 32, 32, 4)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_deeply_supervised_unet():
    x = jnp.zeros((1, 64, 64, 1))
    model = DeeplySupervisedUNet(num_classes=4, base_n_filters=16)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    final, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert final.shape == (1, 64, 64, 4)
    # multi_out returns (out, dsv_mixed_up, final) with final = out + dsv
    (out, dsv, final2), _ = model.apply(
        variables, x, train=True, multi_out=True, mutable=["batch_stats"])
    assert out.shape == dsv.shape == final2.shape == (1, 64, 64, 4)
    np.testing.assert_allclose(np.asarray(out + dsv), np.asarray(final2),
                               rtol=0, atol=1e-6)


def test_bn_stats_update_and_freeze():
    """Four BN behaviors (model_util.py:414-451 -> functional equivalent):
    train-update = merge emitted stats; train-frozen = discard them."""
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 48, 48, 1)) + 3.0
    model = Encoder(feature_reduce=4, act="relu")
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    _, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    # train forward emits different running stats (they would update)
    assert any(not np.allclose(b, a) for b, a in zip(before, after))
    # eval forward leaves stats untouched
    _, updates_eval = model.apply(variables, x, train=False, mutable=["batch_stats"])
    after_eval = jax.tree_util.tree_leaves(updates_eval["batch_stats"])
    assert all(np.allclose(b, a) for b, a in zip(before, after_eval))


def test_layers_smoke():
    x = jnp.ones((2, 16, 16, 8))
    for layer in [ChannelSELayer(), ChannelSpatialSELayer()]:
        variables = layer.init(jax.random.PRNGKey(0), x)
        y = layer.apply(variables, x)
        assert y.shape == x.shape
    attn = SelfAttention()
    variables = attn.init(jax.random.PRNGKey(0), x)
    y, w, a = attn.apply(variables, x)  # (final, weighted_out, attention)
    assert y.shape == x.shape and w.shape == x.shape
    assert a.shape == (2, 256, 256)


def test_unet3d_parts():
    from cooperative_training_and_latent_space_data_augmentation_tpu.models.unet3d import (
        UNet3D,
        UnetConv3,
        UnetUp3,
    )

    x = jnp.ones((1, 4, 32, 32, 1)) * 0.5  # NDHWC
    conv = UnetConv3(8)
    v = conv.init(jax.random.PRNGKey(0), x, train=False)
    y, _ = conv.apply(v, x, train=True, mutable=["batch_stats"])
    assert y.shape == (1, 4, 32, 32, 8)
    net = UNet3D(num_classes=4, feature_scale=4)
    v = net.init(jax.random.PRNGKey(0), x, train=False)
    out, _ = net.apply(v, x, train=True, mutable=["batch_stats"])
    assert out.shape == (1, 4, 32, 32, 4)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_domain_specific_encoder():
    from cooperative_training_and_latent_space_data_augmentation_tpu.models.encoder_decoder import (
        DomainSpecificEncoder,
    )

    x = jnp.ones((2, 64, 64, 1)) * 0.3
    enc = DomainSpecificEncoder(feature_reduce=4, num_domains=2, act="relu")
    v = enc.init(jax.random.PRNGKey(0), x, domain_id=0, train=False)
    z0, ups0 = enc.apply(v, x, domain_id=0, train=True, mutable=["batch_stats"])
    z1, ups1 = enc.apply(v, x, domain_id=1, train=True, mutable=["batch_stats"])
    assert z0.shape == (2, 4, 4, 128)
    # same params, same input -> identical outputs across fresh domains...
    np.testing.assert_allclose(np.asarray(z0), np.asarray(z1), rtol=1e-5, atol=1e-6)
    # ...but only domain 0's stats moved in the domain-0 pass
    s0 = jax.tree_util.tree_leaves(ups0["batch_stats"])
    assert any(np.any(np.asarray(a) != 0) for a in s0)


def test_unet_dropout_wired():
    """encoder/decoder dropout fields must actually apply (review finding:
    they were declared but ignored)."""
    net = UNet(num_classes=4, feature_scale=4, encoder_dropout=0.5,
               decoder_dropout=0.5)
    x = jnp.ones((2, 32, 32, 1)) * 0.5
    v = net.init(jax.random.PRNGKey(0), x, train=False)
    y1, _ = net.apply(v, x, train=True, mutable=["batch_stats"],
                      rngs={"dropout": jax.random.PRNGKey(1)})
    y2, _ = net.apply(v, x, train=True, mutable=["batch_stats"],
                      rngs={"dropout": jax.random.PRNGKey(2)})
    # different dropout draws -> different outputs; eval -> deterministic
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    e1 = net.apply(v, x, train=False)
    e2 = net.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_spatial_pyramid_pool_exact_bins():
    """Exact reference arithmetic (custom_layers.spatial_pyramid_pool:348-374):
    ceil-window MaxPool2d with computed padding, channel-major flatten.
    Checked on BOTH a divisible size (where it equals AdaptiveMaxPool2d) and
    a non-divisible size (where the reference's shifted windows differ)."""
    from cooperative_training_and_latent_space_data_augmentation_tpu.models.layers import (
        spatial_pyramid_pool,
    )
    import math

    import torch

    def torch_ref(x_nhwc, bins):
        xt = torch.tensor(np.moveaxis(x_nhwc, -1, 1))
        h, w = x_nhwc.shape[1], x_nhwc.shape[2]
        outs = []
        for s in bins:
            k_h, k_w = math.ceil(h / s), math.ceil(w / s)
            pad = ((k_h * s - h + 1) // 2, (k_w * s - w + 1) // 2)
            p = torch.nn.MaxPool2d((k_h, k_w), stride=(k_h, k_w), padding=pad)(xt)
            outs.append(p.reshape(x_nhwc.shape[0], -1).numpy())
        return np.concatenate(outs, axis=1)

    for hw in (8, 10):  # divisible and non-divisible by 4
        x = np.random.RandomState(0).rand(2, hw, hw, 3).astype(np.float32)
        out = np.asarray(spatial_pyramid_pool(jnp.asarray(x), (4, 2, 1)))
        assert out.shape == (2, (16 + 4 + 1) * 3)
        np.testing.assert_allclose(out, torch_ref(x, (4, 2, 1)), rtol=1e-6)


def test_upsample_bilinear_align_corners_parity():
    import torch

    from cooperative_training_and_latent_space_data_augmentation_tpu.models.blocks import (
        upsample_bilinear,
    )

    x = np.random.RandomState(1).rand(2, 6, 9, 4).astype(np.float32)
    ours = np.asarray(upsample_bilinear(jnp.asarray(x)))
    ref = torch.nn.UpsamplingBilinear2d(scale_factor=2)(
        torch.tensor(np.moveaxis(x, -1, 1))).numpy()
    np.testing.assert_allclose(ours, np.moveaxis(ref, 1, -1), atol=1e-6)
