"""Host-side helper transforms (CropPad/ReverseCropPad/MyRotate/MyResize,
resample_by_shape/ref — affine_transform.py:55-757) + obj_* metrics."""

import numpy as np
import pytest

from cooperative_training_and_latent_space_data_augmentation_tpu.data.host_transforms import (
    crop_pad,
    largest_rotated_rect,
    my_resize,
    my_rotate,
    reverse_crop_pad,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.data.preprocess import (
    resample_by_ref,
    resample_by_shape,
)


def test_crop_pad_crop_case():
    x = np.arange(100, dtype=np.float32).reshape(10, 10)
    out = crop_pad(x, 6, 6)
    # center crop: offsets (10-6)//2 = 2
    np.testing.assert_array_equal(out, x[2:8, 2:8])


def test_crop_pad_pad_case():
    x = np.ones((4, 4), np.float32)
    out = crop_pad(x, 8, 8)
    assert out.shape == (8, 8)
    assert out.sum() == 16  # content preserved
    np.testing.assert_array_equal(out[2:6, 2:6], x)  # centered at (8-4)//2


def test_crop_pad_mixed_axes():
    # crop rows, pad cols (CropPad's mixed arm, affine_transform.py:590-596)
    x = np.ones((10, 4), np.float32)
    out = crop_pad(x, 6, 8)
    assert out.shape == (6, 8)
    np.testing.assert_array_equal(out[:, 2:6], np.ones((6, 4)))
    assert out[:, :2].sum() == 0 and out[:, 6:].sum() == 0


def test_crop_pad_channel_layouts():
    x = np.random.RandomState(0).rand(10, 10, 3).astype(np.float32)
    hwc = crop_pad(x, 6, 6)
    chw = crop_pad(np.moveaxis(x, -1, 0), 6, 6, chw=True)
    np.testing.assert_array_equal(np.moveaxis(hwc, -1, 0), chw)


@pytest.mark.parametrize("orig,target", [((10, 12), (6, 8)), ((6, 8), (10, 12)),
                                         ((10, 6), (6, 10))])
def test_reverse_crop_pad_inverts(orig, target):
    """reverse_crop_pad(crop_pad(x)) restores x wherever content survived
    (generate_artefacted_data.recover_image's un-crop contract)."""
    rng = np.random.RandomState(1)
    x = rng.rand(*orig).astype(np.float32)
    cropped = crop_pad(x, *target)
    restored = reverse_crop_pad(cropped, *orig)
    assert restored.shape == orig
    # the overlap region round-trips exactly
    h_keep = min(orig[0], target[0])
    w_keep = min(orig[1], target[1])
    hs = (orig[0] - h_keep) // 2
    ws = (orig[1] - w_keep) // 2
    np.testing.assert_array_equal(restored[hs:hs + h_keep, ws:ws + w_keep],
                                  x[hs:hs + h_keep, ws:ws + w_keep])


def test_reverse_crop_pad_batched():
    x = np.random.RandomState(2).rand(3, 6, 6).astype(np.float32)
    out = reverse_crop_pad(x, 10, 10)
    assert out.shape == (3, 10, 10)
    np.testing.assert_array_equal(out[:, 2:8, 2:8], x)
    x4 = x[:, None]
    out4 = reverse_crop_pad(x4, 10, 10)
    assert out4.shape == (3, 1, 10, 10)
    np.testing.assert_array_equal(out4[:, 0], out)


def test_my_resize_identity_and_constant():
    x = np.random.RandomState(3).rand(8, 8).astype(np.float32)
    np.testing.assert_allclose(my_resize(x, (8, 8)), x, atol=1e-5)
    c = np.full((9, 7), 3.5, np.float32)
    np.testing.assert_allclose(my_resize(c, (5, 11)), 3.5, atol=1e-5)
    # nearest order for labels: output values stay in the input's value set
    lbl = np.random.RandomState(4).randint(0, 4, (8, 8)).astype(np.float32)
    out = my_resize(lbl, (16, 16), interp="nearest")
    assert set(np.unique(out)) <= set(np.unique(lbl))


def test_my_rotate_90_degrees_exact():
    """±90° center rotation lands on integral coordinates: bilinear equals a
    pure index permutation (one of the np.rot90 orientations)."""
    x = np.zeros((9, 9), np.float32)
    x[1, 2] = 1.0  # asymmetric marker
    out = my_rotate(x, 90.0, (9, 9))
    assert out.shape == (9, 9)
    matches = [np.allclose(out, np.rot90(x, k)) for k in (1, 3)]
    assert any(matches)


def test_my_rotate_zero_pads():
    x = np.ones((4, 4), np.float32)
    out = my_rotate(x, 0.0, (8, 8))
    assert out.shape == (8, 8)
    np.testing.assert_array_equal(out[2:6, 2:6], x)


def test_my_rotate_crop_removes_borders():
    """crop=True removes the black rotation corners on a constant image.

    The reference's largest_rotated_rect uses the pixel COUNT (w=16) while
    the rotated content spans the pixel-center extent (15), so the crop's
    extreme corners may still clip a <=1-px sliver of border — an artifact
    of the reference's own formula, kept for parity.  Assert the crop is
    essentially border-free rather than bit-perfectly so."""
    x = np.ones((16, 16), np.float32)
    out = my_rotate(x, 30.0, (16, 16), crop=True)
    assert out.shape == (16, 16)
    dark_frac = float((out < 0.5).mean())
    assert dark_frac < 0.02
    assert out[2:-2, 2:-2].min() > 0.5  # interior fully content
    # without crop, the rotation corners stay black (>10% of the frame)
    plain = my_rotate(x, 30.0, (16, 16), crop=False)
    assert float((plain < 0.5).mean()) > 0.10


def test_largest_rotated_rect():
    w, h = largest_rotated_rect(10, 10, np.radians(45.0))
    bb = 10 * (np.cos(np.radians(45)) + np.sin(np.radians(45)))
    assert 0 < w < bb and 0 < h < bb


# ----------------------------------------------------------- resample_by_*


def test_resample_by_shape_constant_and_corner():
    vol = np.full((4, 8, 8), 2.0, np.float32)
    out = resample_by_shape(vol, (1.0, 1.0, 1.0), (4, 16, 16),
                            (0.5, 0.5, 1.0), order=1)
    assert out.shape == (4, 16, 16)
    # corner-aligned identity at the origin + constant interior
    assert out[0, 0, 0] == pytest.approx(2.0)
    assert np.allclose(out[:, :14, :14], 2.0)


def test_resample_by_shape_gradient():
    """Doubling resolution along x samples input at half-integer steps."""
    vol = np.broadcast_to(np.arange(8, dtype=np.float32), (2, 2, 8)).copy()
    out = resample_by_shape(vol, (1.0, 1.0, 1.0), (2, 2, 16),
                            (0.5, 1.0, 1.0), order=1)
    np.testing.assert_allclose(out[0, 0, :4], [0.0, 0.5, 1.0, 1.5], atol=1e-6)


def test_resample_by_ref_matches_shape():
    vol = np.random.RandomState(5).rand(3, 6, 6).astype(np.float32)
    out = resample_by_ref(vol, (2.0, 2.0, 5.0), (3, 12, 12), (1.0, 1.0, 5.0))
    assert out.shape == (3, 12, 12)
    assert out[0, 0, 0] == pytest.approx(vol[0, 0, 0])


# ------------------------------------------------------------- obj_* metrics


def test_obj_metrics():
    from cooperative_training_and_latent_space_data_augmentation_tpu.eval.metrics import (
        obj_asd,
        obj_assd,
        obj_fpr,
        obj_tpr,
    )

    ref = np.zeros((16, 16), bool)
    ref[2:6, 2:6] = True     # object A
    ref[10:14, 10:14] = True  # object B
    pred = np.zeros((16, 16), bool)
    pred[2:6, 2:6] = True     # matches A exactly
    pred[1:3, 12:15] = True   # spurious object (no overlap with B)

    # identical masks: zero distances, perfect rates
    assert obj_asd(ref, ref) == 0.0
    assert obj_assd(ref, ref) == 0.0
    assert obj_tpr(ref, ref) == 1.0
    assert obj_fpr(ref, ref) == 0.0

    # pred: 1 of 2 reference objects detected; 1 of 2 pred objects spurious
    assert obj_tpr(pred, ref) == pytest.approx(0.5)
    assert obj_fpr(pred, ref) == pytest.approx(0.5)
    # distances only over CORRESPONDING objects (the exact match) -> 0
    assert obj_asd(pred, ref) == 0.0
    assert obj_assd(pred, ref) == 0.0


def test_obj_asd_shifted_object():
    from cooperative_training_and_latent_space_data_augmentation_tpu.eval.metrics import (
        obj_assd,
    )

    ref = np.zeros((16, 16), bool)
    ref[4:8, 4:8] = True
    pred = np.zeros((16, 16), bool)
    pred[4:8, 5:9] = True  # 1-px shift, still overlapping -> corresponding
    d = obj_assd(pred, ref)
    assert 0 < d < 1.5


def test_obj_metrics_empty_raise():
    from cooperative_training_and_latent_space_data_augmentation_tpu.eval.metrics import (
        obj_fpr,
        obj_tpr,
    )

    empty = np.zeros((8, 8), bool)
    full = np.ones((8, 8), bool)
    with pytest.raises(RuntimeError):
        obj_tpr(full, empty)
    with pytest.raises(RuntimeError):
        obj_fpr(empty, full)
