"""Weight-transplant forward-parity tests against the reference torch networks.

Every flax network in the repo is checked against its torch counterpart from
``/root/reference/medseg`` (imported read-only) by transplanting the torch
``state_dict`` into flax params and asserting forward outputs match in
float32:

  * eval mode (running BN stats), and
  * train mode (batch BN stats), including the *updated* running-stat buffers
    (torch updates ``running_var`` with the unbiased variance — mirrored by
    ``models/blocks.BatchNorm``).

Networks covered (constructor args exactly as the reference solver uses them,
advanced_triplet_recon_segmentation_model.py:86-106, with norm=BatchNorm2d):

  res_convdown / res_up_family (4 up types)  (ebm/encoder_decoder.py:19-348)
  MyEncoder / MyDecoder / Dual_Branch_Encoder (ebm/encoder_decoder.py:351-503)
  UNet / FCN / DeeplySupervisedUNet (segmentation_models/{unet,fcn}.py)

A silent off-by-one in stride-2 padding, ConvTranspose weight layout,
align-corners upsampling, or BN momentum direction would surface here
instead of as an invisible Dice deficit.
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")
# resconvunet.py carries the reference's stale `from models...` import
# (resconvunet.py:7, SURVEY C7 note) — needs the medseg dir on the path too
sys.path.insert(0, "/root/reference/medseg")

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from medseg.models.ebm.encoder_decoder import (  # noqa: E402
    Dual_Branch_Encoder,
    MyDecoder,
    MyEncoder,
    res_convdown,
    res_up_family,
)
from medseg.models.segmentation_models.fcn import FCN as TorchFCN  # noqa: E402
from medseg.models.segmentation_models.unet import (  # noqa: E402
    DeeplySupervisedUNet as TorchDSUNet,
    UNet as TorchUNet,
)

from cooperative_training_and_latent_space_data_augmentation_tpu.models import (
    blocks,
    encoder_decoder as ed,
    unet as unet_mod,
)

# ---------------------------------------------------------------------------
# torch state_dict -> flax params converters
# ---------------------------------------------------------------------------


def _np(t):
    # .copy() matters: torch .numpy() shares memory with the live tensor and
    # jax CPU device_put is zero-copy for aligned arrays, so without it the
    # transplanted flax batch_stats would alias torch's running buffers and
    # silently track torch's in-place BN updates.
    return t.detach().cpu().numpy().copy()


def conv_p(sd, key):
    """torch Conv2d OIHW -> flax HWIO."""
    out = {"kernel": np.transpose(_np(sd[f"{key}.weight"]), (2, 3, 1, 0))}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def convt_p(sd, key):
    """torch ConvTranspose2d (in, out, kh, kw) -> flax ConvTranspose HWIO.

    flax ``nn.ConvTranspose`` (transpose_kernel=False) cross-correlates the
    dilated input, torch transposed conv convolves it, so the spatial dims
    flip: kernel[h, w, i, o] = w[i, o, kH-1-h, kW-1-w].  Verified exact in
    float64 for k2s2 and k4s2p1 with padding='SAME'.
    """
    w = _np(sd[f"{key}.weight"])
    return {
        "kernel": np.ascontiguousarray(np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))),
        "bias": _np(sd[f"{key}.bias"]),
    }


def bn_p(sd, key):
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def bn_s(sd, key):
    return {
        "mean": _np(sd[f"{key}.running_mean"]),
        "var": _np(sd[f"{key}.running_var"]),
    }


def res_core_vars(sd, prefix):
    """torch res_convdown/res_up_family residual tail -> flax _ResCore.

    torch: conv_input (1x1 shortcut), conv.{0,1,3,4} = conv3, BN, conv3, BN.
    flax _ResCore creation order: Conv_0 (shortcut), Conv_1, BatchNorm_0,
    Conv_2, BatchNorm_1.
    """
    params = {
        "Conv_0": conv_p(sd, f"{prefix}conv_input"),
        "Conv_1": conv_p(sd, f"{prefix}conv.0"),
        "BatchNorm_0": bn_p(sd, f"{prefix}conv.1"),
        "Conv_2": conv_p(sd, f"{prefix}conv.3"),
        "BatchNorm_1": bn_p(sd, f"{prefix}conv.4"),
    }
    stats = {
        "BatchNorm_0": bn_s(sd, f"{prefix}conv.1"),
        "BatchNorm_1": bn_s(sd, f"{prefix}conv.4"),
    }
    return params, stats


def res_convdown_vars(sd, prefix=""):
    core_p, core_s = res_core_vars(sd, prefix)
    return ({"Conv_0": conv_p(sd, f"{prefix}down"), "_ResCore_0": core_p},
            {"_ResCore_0": core_s})


def res_up_vars(sd, up_type, prefix=""):
    core_p, core_s = res_core_vars(sd, prefix)
    params = {"_ResCore_0": core_p}
    if up_type in ("Conv2", "Conv4"):
        params["ConvTranspose_0"] = convt_p(sd, f"{prefix}up")
    return params, {"_ResCore_0": core_s}


def encoder_vars(sd, prefix=""):
    """torch MyEncoder -> flax Encoder {params, batch_stats}."""
    params = {
        "ConvBlock_0": {
            "Conv_0": conv_p(sd, f"{prefix}inc.0"),
            "BatchNorm_0": bn_p(sd, f"{prefix}inc.1"),
            "Conv_1": conv_p(sd, f"{prefix}inc.3"),
            "BatchNorm_1": bn_p(sd, f"{prefix}inc.4"),
        },
        "Conv_0": conv_p(sd, f"{prefix}final_conv.0"),
        "BatchNorm_0": bn_p(sd, f"{prefix}final_conv.1"),
    }
    stats = {
        "ConvBlock_0": {
            "BatchNorm_0": bn_s(sd, f"{prefix}inc.1"),
            "BatchNorm_1": bn_s(sd, f"{prefix}inc.4"),
        },
        "BatchNorm_0": bn_s(sd, f"{prefix}final_conv.1"),
    }
    for i in range(4):
        p, s = res_convdown_vars(sd, f"{prefix}down{i + 1}.")
        params[f"ResConvDown_{i}"] = p
        stats[f"ResConvDown_{i}"] = s
    return params, stats


def decoder_vars(sd, up_type):
    """torch MyDecoder -> flax Decoder {params, batch_stats}."""
    params, stats = {}, {}
    for i in range(4):
        p, s = res_up_vars(sd, up_type, f"up{i + 1}.")
        params[f"ResUp_{i}"] = p
        stats[f"ResUp_{i}"] = s
    params["Conv_0"] = conv_p(sd, "final_conv")
    return params, stats


def dual_branch_vars(sd):
    enc_p, enc_s = encoder_vars(sd, "general_encoder.")
    dec_p = {
        "Conv_0": conv_p(sd, "code_decoupler.0"),
        "BatchNorm_0": bn_p(sd, "code_decoupler.1"),
        "Conv_1": conv_p(sd, "code_decoupler.3"),
        "BatchNorm_1": bn_p(sd, "code_decoupler.4"),
    }
    dec_s = {
        "BatchNorm_0": bn_s(sd, "code_decoupler.1"),
        "BatchNorm_1": bn_s(sd, "code_decoupler.4"),
    }
    return ({"general_encoder": enc_p, "code_decoupler": dec_p},
            {"general_encoder": enc_s, "code_decoupler": dec_s})


def double_conv_vars(sd, prefix):
    """torch double_conv (conv.{0,1,3,4}) -> flax DoubleConv
    (SNConv_i/Conv_0 + Norm_i/BatchNorm_0)."""
    params = {
        "SNConv_0": {"Conv_0": conv_p(sd, f"{prefix}.0")},
        "Norm_0": {"BatchNorm_0": bn_p(sd, f"{prefix}.1")},
        "SNConv_1": {"Conv_0": conv_p(sd, f"{prefix}.3")},
        "Norm_1": {"BatchNorm_0": bn_p(sd, f"{prefix}.4")},
    }
    stats = {
        "Norm_0": {"BatchNorm_0": bn_s(sd, f"{prefix}.1")},
        "Norm_1": {"BatchNorm_0": bn_s(sd, f"{prefix}.4")},
    }
    return params, stats


def unet_vars(sd):
    torch_blocks = ["inc.conv.conv"] + [f"down{i}.mpconv.1.conv" for i in range(1, 5)] \
        + [f"up{i}.conv.conv" for i in range(1, 5)]
    params, stats = {}, {}
    for i, tb in enumerate(torch_blocks):
        p, s = double_conv_vars(sd, tb)
        params[f"DoubleConv_{i}"] = p
        stats[f"DoubleConv_{i}"] = s
    params["Conv_0"] = conv_p(sd, "outc.conv")
    return params, stats


def cbr_vars(sd, key):
    """torch conv2DBatchNormRelu (cbr_unit.{0,1}) -> flax ConvBNRelu."""
    return ({"Conv_0": conv_p(sd, f"{key}.cbr_unit.0"),
             "BatchNorm_0": bn_p(sd, f"{key}.cbr_unit.1")},
            {"BatchNorm_0": bn_s(sd, f"{key}.cbr_unit.1")})


def fcn_vars(sd):
    torch_order = [
        "conv1_1", "conv1_2", "conv2_1", "conv2_2",
        "conv3_1", "conv3_2", "conv3_3",
        "conv4_1", "conv4_2", "conv4_3",
        "conv5_1", "conv5_2", "conv5_3",
        "level_1_out", "level_2_out", "level_3_out", "level_4_out",
        "level_5_out", "aggregate_layers", "conv_final",
    ]
    params, stats = {}, {}
    for i, tk in enumerate(torch_order):
        p, s = cbr_vars(sd, tk)
        params[f"ConvBNRelu_{i}"] = p
        stats[f"ConvBNRelu_{i}"] = s
    params["Conv_0"] = conv_p(sd, "outS")
    return params, stats


def dsunet_vars(sd):
    torch_blocks = ["inc.conv.conv"] + [f"down{i}.mpconv.1.conv" for i in range(1, 5)] \
        + [f"up{i}.conv.conv" for i in range(1, 5)]
    params, stats = {}, {}
    for i, tb in enumerate(torch_blocks):
        p, s = double_conv_vars(sd, tb)
        params[f"DoubleConv_{i}"] = p
        stats[f"DoubleConv_{i}"] = s
    params["Conv_0"] = conv_p(sd, "up2_conv1.conv")  # dsv head on d2
    params["Conv_1"] = conv_p(sd, "up3_conv1.conv")  # dsv head on d3
    params["Conv_2"] = conv_p(sd, "outc.conv")
    return params, stats


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def _tree_paths(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_tree_paths(v, path))
        else:
            out[path] = tuple(np.shape(v))
    return out


def assert_same_structure(built, expected, what):
    b, e = _tree_paths(built), _tree_paths(expected)
    missing = sorted(set(e) - set(b))
    extra = sorted(set(b) - set(e))
    wrong = sorted(p for p in set(b) & set(e) if b[p] != e[p])
    assert not (missing or extra or wrong), (
        f"{what}: transplant tree mismatch\n"
        f"  missing: {missing}\n  extra: {extra}\n"
        f"  shape-mismatch: {[(p, b[p], e[p]) for p in wrong]}"
    )


def transplant(flax_model, torch_model, example_nhwc, builder, **apply_kw):
    """Build flax variables from the torch state_dict, verifying the tree
    structure matches ``flax_model.init`` exactly."""
    sd = torch_model.state_dict()
    params, stats = builder(sd)
    ref_vars = flax_model.init(jax.random.PRNGKey(0), jnp.asarray(example_nhwc),
                               **apply_kw)
    assert_same_structure({"params": params, "batch_stats": stats},
                          {k: ref_vars[k] for k in ("params", "batch_stats")},
                          type(flax_model).__name__)
    to_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    return {"params": to_jnp(params), "batch_stats": to_jnp(stats)}


def nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def check_forward(flax_model, torch_model, variables, x_nhwc, atol=2e-4,
                  postprocess=None, **apply_kw):
    """Eval-mode and train-mode forward parity + running-stat update parity."""
    # --- eval mode -------------------------------------------------------
    torch_model.eval()
    with torch.no_grad():
        ref = torch_model(nchw(x_nhwc)).numpy()
    got = np.asarray(flax_model.apply(variables, jnp.asarray(x_nhwc),
                                      train=False, **apply_kw))
    if postprocess is not None:
        ref, got = postprocess(ref, got)
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), ref,
                               rtol=0, atol=atol,
                               err_msg="eval-mode forward mismatch")

    # --- train mode (batch stats) + updated running buffers ---------------
    torch_model.train()
    with torch.no_grad():
        ref_t = torch_model(nchw(x_nhwc)).numpy()
    got_t, mutated = flax_model.apply(variables, jnp.asarray(x_nhwc),
                                      train=True, mutable=["batch_stats"],
                                      **apply_kw)
    got_t = np.asarray(got_t)
    if postprocess is not None:
        ref_t, got_t = postprocess(ref_t, got_t)
    np.testing.assert_allclose(np.transpose(got_t, (0, 3, 1, 2)), ref_t,
                               rtol=0, atol=atol * 5,
                               err_msg="train-mode forward mismatch")
    return mutated


def check_bn_buffers(torch_model, mutated_stats, builder, atol=1e-5):
    """After one train-mode forward, torch running buffers must equal the
    emitted flax batch_stats (unbiased-var update parity)."""
    _, expected = builder(torch_model.state_dict())
    flat_exp = _tree_paths(expected)
    got = mutated_stats["batch_stats"]

    def walk(exp, got, path=""):
        for k, v in exp.items():
            if isinstance(v, dict):
                walk(v, got[k], f"{path}/{k}")
            else:
                np.testing.assert_allclose(
                    np.asarray(got[k]), v, rtol=0, atol=atol,
                    err_msg=f"running-stat mismatch at {path}/{k}")

    walk(expected, got)
    assert flat_exp  # non-empty sanity


# ---------------------------------------------------------------------------
# unit blocks
# ---------------------------------------------------------------------------

RNG = np.random.RandomState(42)


def rand_img(n, h, w, c):
    return RNG.rand(n, h, w, c).astype(np.float32)


def test_res_convdown_parity():
    tm = res_convdown(8, 16, norm=tnn.BatchNorm2d)
    fm = blocks.ResConvDown(features=16)
    x = rand_img(2, 16, 16, 8)
    variables = transplant(fm, tm, x, res_convdown_vars, train=False)
    mut = check_forward(fm, tm, variables, x, atol=1e-5)
    check_bn_buffers(tm, mut, res_convdown_vars)


@pytest.mark.parametrize("up_type", ["NN", "bilinear", "Conv2", "Conv4"])
def test_res_up_parity(up_type):
    tm = res_up_family(8, 4, norm=tnn.BatchNorm2d, up_type=up_type)
    fm = blocks.ResUp(features=4, up_type=up_type)
    x = rand_img(2, 12, 12, 8)
    builder = lambda sd: res_up_vars(sd, up_type)
    variables = transplant(fm, tm, x, builder, train=False)
    mut = check_forward(fm, tm, variables, x, atol=1e-5)
    check_bn_buffers(tm, mut, builder)


# ---------------------------------------------------------------------------
# FTN/STN networks (constructor args per advanced...py:86-106, reduce=4)
# ---------------------------------------------------------------------------


def test_my_encoder_parity():
    tm = MyEncoder(input_channel=1, output_channel=128, feature_reduce=4,
                   norm=tnn.BatchNorm2d, act=tnn.ReLU())
    fm = ed.Encoder(feature_reduce=4, act="relu")
    x = rand_img(2, 64, 64, 1)
    variables = transplant(fm, tm, x, encoder_vars, train=False)
    mut = check_forward(fm, tm, variables, x, atol=1e-4)
    check_bn_buffers(tm, mut, encoder_vars)


def test_my_decoder_seg_parity():
    """Segmentation/shape decoder: up_type='NN', logits out."""
    tm = MyDecoder(input_channel=128, output_channel=4, feature_reduce=4,
                   norm=tnn.BatchNorm2d, up_type="NN")
    fm = ed.Decoder(output_channel=4, feature_reduce=4, up_type="NN")
    z = rand_img(2, 4, 4, 128)
    builder = lambda sd: decoder_vars(sd, "NN")
    variables = transplant(fm, tm, z, builder, train=False)
    mut = check_forward(fm, tm, variables, z, atol=2e-4)
    check_bn_buffers(tm, mut, builder)


def test_my_decoder_image_parity():
    """Image decoder: up_type='Conv2' + Sigmoid last act."""
    tm = MyDecoder(input_channel=128, output_channel=1, feature_reduce=4,
                   norm=tnn.BatchNorm2d, up_type="Conv2", last_act=tnn.Sigmoid())
    fm = ed.Decoder(output_channel=1, feature_reduce=4, up_type="Conv2",
                    last_act="sigmoid")
    z = rand_img(2, 4, 4, 128)
    builder = lambda sd: decoder_vars(sd, "Conv2")
    variables = transplant(fm, tm, z, builder, train=False)
    mut = check_forward(fm, tm, variables, z, atol=1e-5)
    check_bn_buffers(tm, mut, builder)


def test_dual_branch_encoder_parity():
    tm = Dual_Branch_Encoder(input_channel=1, z_level_1_channel=128,
                             z_level_2_channel=128, feature_reduce=4,
                             norm=tnn.BatchNorm2d)
    fm = ed.DualBranchEncoder(feature_reduce=4)
    x = rand_img(2, 64, 64, 1)
    variables = transplant(fm, tm, x, dual_branch_vars, train=False)

    tm.eval()
    with torch.no_grad():
        zi_t, zs_t = tm(nchw(x))
    zi, zs = fm.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.transpose(np.asarray(zi), (0, 3, 1, 2)),
                               zi_t.numpy(), rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.transpose(np.asarray(zs), (0, 3, 1, 2)),
                               zs_t.numpy(), rtol=0, atol=1e-4)

    # filter_code path (decode_segmentation_from_image_code, advanced...py:208-221)
    zs2 = fm.apply(variables, jnp.asarray(np.asarray(zi)), train=False,
                   method=fm.filter_code)
    with torch.no_grad():
        zs2_t = tm.filter_code(zi_t)
    np.testing.assert_allclose(np.transpose(np.asarray(zs2), (0, 3, 1, 2)),
                               zs2_t.numpy(), rtol=0, atol=1e-4)


# ---------------------------------------------------------------------------
# baseline networks
# ---------------------------------------------------------------------------


def test_unet_parity():
    tm = TorchUNet(input_channel=1, num_classes=4, feature_scale=4)
    fm = unet_mod.UNet(num_classes=4, feature_scale=4)
    x = rand_img(2, 64, 64, 1)
    variables = transplant(fm, tm, x, unet_vars, train=False)
    mut = check_forward(fm, tm, variables, x, atol=2e-4)
    check_bn_buffers(tm, mut, unet_vars)


def test_fcn_parity():
    tm = TorchFCN(feature_scale=4, num_classes=4, input_channel=1)
    fm = unet_mod.FCN(num_classes=4, feature_scale=4, input_channel=1)
    x = rand_img(2, 64, 64, 1)
    variables = transplant(fm, tm, x, fcn_vars, train=False)
    mut = check_forward(fm, tm, variables, x, atol=2e-4)
    check_bn_buffers(tm, mut, fcn_vars)


def test_dsunet_parity():
    tm = TorchDSUNet(input_channel=1, num_classes=4, base_n_filters=16)
    fm = unet_mod.DeeplySupervisedUNet(num_classes=4, base_n_filters=16)
    x = rand_img(2, 64, 64, 1)
    variables = transplant(fm, tm, x, dsunet_vars, train=False)
    mut = check_forward(fm, tm, variables, x, atol=2e-4)
    check_bn_buffers(tm, mut, dsunet_vars)


def test_unetv2_parity():
    from medseg.models.segmentation_models.unet import UNetv2 as TorchUNetv2

    tm = TorchUNetv2(input_channel=1, num_classes=4, feature_scale=4)
    # reference bug: UNetv2.forward reads self.self_attention which __init__
    # never sets (unet.py:357; an AttributeError on any forward).  Setting it
    # False makes forward identical to the working .predict() path — we test
    # the intended capability, not the crash (SURVEY C7 note).
    tm.self_attention = False
    fm = unet_mod.UNetv2(num_classes=4, feature_scale=4)
    x = rand_img(2, 64, 64, 1)
    # same part classes as UNet (inconv/down/up/outconv) -> same converter
    variables = transplant(fm, tm, x, unet_vars, train=False)
    mut = check_forward(fm, tm, variables, x, atol=2e-4)
    check_bn_buffers(tm, mut, unet_vars)


def res_block_vars(sd, prefix):
    """torch res_conv / res_convdown / res_conv_up body (conv_input 1x1 +
    conv.{0,1,3,4}) -> flax ResBlock (SNConv_0 shortcut, SNConv_1, Norm_0,
    SNConv_2, Norm_1)."""
    params = {
        "SNConv_0": {"Conv_0": conv_p(sd, f"{prefix}conv_input")},
        "SNConv_1": {"Conv_0": conv_p(sd, f"{prefix}conv.0")},
        "Norm_0": {"BatchNorm_0": bn_p(sd, f"{prefix}conv.1")},
        "SNConv_2": {"Conv_0": conv_p(sd, f"{prefix}conv.3")},
        "Norm_1": {"BatchNorm_0": bn_p(sd, f"{prefix}conv.4")},
    }
    stats = {
        "Norm_0": {"BatchNorm_0": bn_s(sd, f"{prefix}conv.1")},
        "Norm_1": {"BatchNorm_0": bn_s(sd, f"{prefix}conv.4")},
    }
    return params, stats


def resconvunet_vars(sd):
    params, stats = {}, {}
    blocks = ["inc."] + [f"down{i}." for i in range(1, 5)] \
        + [f"up{i}." for i in range(1, 5)]
    for i, b in enumerate(blocks):
        p, s = res_block_vars(sd, b)
        params[f"ResBlock_{i}"] = p
        stats[f"ResBlock_{i}"] = s
    for i in range(4):
        params[f"ConvTranspose_{i}"] = convt_p(sd, f"up{i + 1}.mpconv.0")
    params["Conv_0"] = conv_p(sd, "outc.conv")
    return params, stats


def test_resconvunet_parity():
    from medseg.models.segmentation_models.resconvunet import (
        ResConvUNet as TorchResConvUNet,
    )

    tm = TorchResConvUNet(input_channel=1, num_classes=4, feature_scale=4)
    fm = unet_mod.ResConvUNet(num_classes=4, feature_scale=4)
    x = rand_img(2, 64, 64, 1)
    variables = transplant(fm, tm, x, resconvunet_vars, train=False)
    mut = check_forward(fm, tm, variables, x, atol=2e-4)
    check_bn_buffers(tm, mut, resconvunet_vars)


# ---------------------------------------------------------------------------
# 3-D parts (unet_parts.py:605-663)
# ---------------------------------------------------------------------------


def conv3d_p(sd, key):
    """torch Conv3d OIDHW -> flax DHWIO."""
    out = {"kernel": np.transpose(_np(sd[f"{key}.weight"]), (2, 3, 4, 1, 0))}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def unetconv3_vars(sd, prefix=""):
    params = {
        "Conv_0": conv3d_p(sd, f"{prefix}conv1.0"),
        "BatchNorm_0": bn_p(sd, f"{prefix}conv1.1"),
        "Conv_1": conv3d_p(sd, f"{prefix}conv2.0"),
        "BatchNorm_1": bn_p(sd, f"{prefix}conv2.1"),
    }
    stats = {
        "BatchNorm_0": bn_s(sd, f"{prefix}conv1.1"),
        "BatchNorm_1": bn_s(sd, f"{prefix}conv2.1"),
    }
    return params, stats


def test_unetconv3_parity():
    from medseg.models.segmentation_models.unet_parts import (
        UnetConv3 as TorchUnetConv3,
    )

    from cooperative_training_and_latent_space_data_augmentation_tpu.models import (
        unet3d,
    )

    tm = TorchUnetConv3(in_size=2, out_size=8, is_batchnorm=True)
    fm = unet3d.UnetConv3(features=8, is_batchnorm=True)
    x = RNG.rand(2, 4, 12, 12, 2).astype(np.float32)  # NDHWC
    sd = tm.state_dict()
    p, s = unetconv3_vars(sd)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, p),
                 "batch_stats": jax.tree_util.tree_map(jnp.asarray, s)}
    tm.eval()
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)).copy())).numpy()
    got = fm.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 4, 1, 2, 3)),
                               ref, rtol=0, atol=2e-4)


def test_unetup3_parity():
    """Trilinear (non-deconv) up path with z_scale_factor=2 — the one setting
    where the torch module's Upsample(scale_factor=z) (which scales ALL
    spatial dims by z, unet_parts.py:620) and a genuine x2 upsample agree."""
    from medseg.models.segmentation_models.unet_parts import (
        UnetUp3 as TorchUnetUp3,
    )

    from cooperative_training_and_latent_space_data_augmentation_tpu.models import (
        unet3d,
    )

    tm = TorchUnetUp3(in_size=6, out_size=4, is_deconv=False,
                      is_batchnorm=True, z_scale_factor=2)
    fm = unet3d.UnetUp3(features=4, is_deconv=False, is_batchnorm=True,
                        z_scale_factor=2)
    skip = RNG.rand(2, 4, 8, 8, 4).astype(np.float32)   # NDHWC
    x = RNG.rand(2, 2, 4, 4, 6).astype(np.float32)
    sd = tm.state_dict()
    p, s = unetconv3_vars(sd, "conv.")
    variables = {"params": {"UnetConv3_0": jax.tree_util.tree_map(jnp.asarray, p)},
                 "batch_stats": {"UnetConv3_0": jax.tree_util.tree_map(jnp.asarray, s)}}
    tm.eval()
    to_t = lambda a: torch.from_numpy(np.transpose(a, (0, 4, 1, 2, 3)).copy())
    with torch.no_grad():
        ref = tm(to_t(skip), to_t(x)).numpy()
    got = fm.apply(variables, jnp.asarray(skip), jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 4, 1, 2, 3)),
                               ref, rtol=0, atol=2e-4)
