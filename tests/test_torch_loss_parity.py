"""End-to-end LOSS-VALUE parity vs the torch reference.

Transplants randomly initialized torch weights for all 5 subnetworks into
the JAX cooperative solver and asserts the fused standard-training 4-loss
computation (advanced_triplet_recon_segmentation_model.standard_training
:414-467) and the hard-example 4-loss computation (:525-559) reproduce the
values of a faithful torch reimplementation on the same batch.

The reference solver module itself cannot be imported on this image (its
import chain pulls SimpleITK), so the loss math is lifted verbatim here:
fast_predict (:561-601), construct_input (basic_operations.py:110-158),
cross_entropy_2D via the importable `medseg.models.custom_loss`, and the
0.5*MSE image term.  This is the final numerics seal on top of the
per-network forward parity tests (test_torch_parity.py).
"""

import sys

import numpy as np
import pytest
import jax

sys.path.insert(0, "/root/reference")

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from medseg.models.custom_loss import cross_entropy_2D  # noqa: E402
from medseg.models.ebm.encoder_decoder import (  # noqa: E402
    Dual_Branch_Encoder,
    MyDecoder,
    MyEncoder,
)

from cooperative_training_and_latent_space_data_augmentation_tpu.train.cooperative import (
    CooperativeTripletSolver,
)

# converter helpers from the forward-parity suite (same directory)
from test_torch_parity import decoder_vars, dual_branch_vars, encoder_vars

NUM_CLASSES = 4
HW = 64  # latent 4x4; same stride plan as the 192->12 flagship


def build_torch_model(seed=0):
    """The exact FCN_16_standard construction (advanced...py:86-106)."""
    torch.manual_seed(seed)
    rf = 4
    model = {
        "image_encoder": Dual_Branch_Encoder(
            input_channel=1, z_level_1_channel=512 // rf,
            z_level_2_channel=512 // rf, feature_reduce=rf, if_SN=False,
            encoder_dropout=None, norm=tnn.BatchNorm2d),
        "segmentation_decoder": MyDecoder(
            input_channel=512 // rf, up_type="NN", output_channel=NUM_CLASSES,
            feature_reduce=rf, if_SN=False, decoder_dropout=None,
            norm=tnn.BatchNorm2d),
        "image_decoder": MyDecoder(
            input_channel=512 // rf, up_type="Conv2", output_channel=1,
            feature_reduce=rf, if_SN=False, decoder_dropout=None,
            norm=tnn.BatchNorm2d, last_act=tnn.Sigmoid()),
        "shape_encoder": MyEncoder(
            input_channel=NUM_CLASSES, output_channel=512 // rf,
            feature_reduce=rf, if_SN=False, encoder_dropout=None,
            norm=tnn.BatchNorm2d, act=tnn.ReLU()),
        "shape_decoder": MyDecoder(
            input_channel=512 // rf, up_type="NN", output_channel=NUM_CLASSES,
            feature_reduce=rf, if_SN=False, decoder_dropout=None,
            norm=tnn.BatchNorm2d),
    }
    for m in model.values():
        m.train()  # standard_training runs in train mode (batch-stat BN)
    return model


def torch_construct_input(seg, is_labelmap, temperature=2.0):
    """basic_operations.construct_input:110-158 (no smoothing/shuffle)."""
    if is_labelmap:
        n, h, w = seg.shape
        flat = seg.reshape(n * h * w, 1).long()
        onehot = torch.zeros(n * h * w, NUM_CLASSES, dtype=torch.float32)
        onehot.scatter_(1, flat, 1)
        return onehot.view(n, h, w, NUM_CLASSES).permute(0, 3, 1, 2)
    return torch.softmax(seg / temperature, dim=1)


def torch_recon_shape(model, seg, is_labelmap):
    """recon_shape (advanced...py:262-269)."""
    x = torch_construct_input(seg, is_labelmap)
    return model["shape_decoder"](model["shape_encoder"](x))


def torch_standard_training(model, clean, label, noised,
                            compute_gt_recon=True):
    """standard_training's 4 losses (advanced...py:414-467), train mode."""
    z_i, z_s = model["image_encoder"](noised)
    y0 = model["segmentation_decoder"](z_s)
    seg_loss = cross_entropy_2D(y0, label.detach())
    image_recon = model["image_decoder"](z_i)
    image_loss = 0.5 * tnn.MSELoss(reduction="mean")(image_recon, clean)
    if compute_gt_recon:
        gt_recon = torch_recon_shape(model, label.detach().clone(),
                                     is_labelmap=True)
        gt_loss = cross_entropy_2D(gt_recon, label)
    else:
        gt_loss = torch.tensor(0.0)
    p_recon = torch_recon_shape(model, y0, is_labelmap=False)
    shape_loss = cross_entropy_2D(p_recon, label)
    return {"seg": seg_loss, "image": image_loss, "gt_shape": gt_loss,
            "shape": shape_loss}, y0


def transplanted_state(model, solver):
    """torch state_dicts -> the solver's TrainState params/batch_stats."""
    state = solver.init_state(jax.random.PRNGKey(1))
    params = dict(state.params)
    stats = dict(state.batch_stats)
    converters = {
        "image_encoder": lambda sd: dual_branch_vars(sd),
        "segmentation_decoder": lambda sd: decoder_vars(sd, "NN"),
        "image_decoder": lambda sd: decoder_vars(sd, "Conv2"),
        "shape_encoder": lambda sd: encoder_vars(sd),
        "shape_decoder": lambda sd: decoder_vars(sd, "NN"),
    }
    for name, conv in converters.items():
        sd = model[name].state_dict()
        p, s = conv(sd)
        params[name] = jax.tree.map(lambda a: a, p)
        stats[name] = jax.tree.map(lambda a: a, s)
    return state.replace(params=params, batch_stats=stats)


@pytest.fixture(scope="module")
def setup():
    model = build_torch_model()
    solver = CooperativeTripletSolver(
        network_type="FCN_16_standard", image_ch=1, num_classes=NUM_CLASSES,
        input_hw=(HW, HW))
    state = transplanted_state(model, solver)
    rng = np.random.RandomState(3)
    clean = rng.rand(2, HW, HW, 1).astype(np.float32)
    noised = np.clip(clean + 0.05 * rng.randn(2, HW, HW, 1), 0, 1
                     ).astype(np.float32)
    label = rng.randint(0, NUM_CLASSES, (2, HW, HW)).astype(np.int64)
    return model, solver, state, clean, noised, label


def _t_nchw(x_nhwc):
    return torch.from_numpy(np.moveaxis(x_nhwc, -1, 1).copy())


def test_standard_training_loss_parity(setup):
    model, solver, state, clean, noised, label = setup
    with torch.no_grad():
        ref, _ = torch_standard_training(
            model, _t_nchw(clean), torch.from_numpy(label), _t_nchw(noised))
    got, _, _ = solver.standard_training(
        state.params, state.batch_stats, clean, label.astype(np.int32),
        noised, separate_training=False, compute_gt_recon=True,
        update_stats=True)
    for k in ("seg", "image", "gt_shape", "shape"):
        np.testing.assert_allclose(float(got[k]), float(ref[k]), atol=2e-4,
                                   err_msg=f"standard/{k}")


def test_hard_example_training_loss_parity(setup):
    """hard_example_training's 4 losses (advanced...py:525-559) on FIXED
    perturbed inputs (the perturbation rng is bypassed so the loss math is
    compared in isolation); BN-stat freezing does not change train-mode
    outputs, so plain train-mode torch forwards are the reference."""
    model, solver, state, clean, noised, label = setup
    rng = np.random.RandomState(7)
    perturbed_image = rng.rand(2, HW, HW, 1).astype(np.float32)
    perturbed_seg = rng.randn(2, HW, HW, NUM_CLASSES).astype(np.float32)

    with torch.no_grad():
        std, _ = torch_standard_training(
            model, _t_nchw(clean), torch.from_numpy(label),
            _t_nchw(perturbed_image), compute_gt_recon=False)
        p_recon = torch_recon_shape(
            model, _t_nchw(perturbed_seg), is_labelmap=False)
        ref = {"seg": std["seg"], "image": std["image"], "shape": std["shape"],
               "perturbed_shape": cross_entropy_2D(
                   p_recon, torch.from_numpy(label))}

    got = solver.hard_example_training(
        state.params, state.batch_stats, perturbed_image, clean,
        perturbed_seg, label.astype(np.int32), separate_training=False)
    for k in ("seg", "image", "shape", "perturbed_shape"):
        np.testing.assert_allclose(float(got[k]), float(ref[k]), atol=2e-4,
                                   err_msg=f"hard/{k}")
