"""Tests for eval/pairwise_measures.py — the working re-design of the
reference's py2-dead vendored NiftyNet suite
(medseg/common_utils/hausdorff_util.py:14-609).

Cross-checked against the medpy-parity metrics in eval/metrics.py where the
formulas coincide, and against hand-computable shapes elsewhere.
"""

import numpy as np
import pytest

from cooperative_training_and_latent_space_data_augmentation_tpu.eval import (
    metrics,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.eval.pairwise_measures import (
    MorphologyOps,
    PairwiseMeasures,
    PairwiseMeasuresRegression,
)


def _cube(z0, z1, y0, y1, x0, x1, shape=(16, 16, 16)):
    v = np.zeros(shape, np.float64)
    v[z0:z1, y0:y1, x0:x1] = 1
    return v


@pytest.fixture
def seg_ref():
    ref = _cube(4, 12, 4, 12, 4, 12)
    seg = _cube(4, 12, 4, 12, 6, 14)   # shifted 2 voxels along x
    return seg, ref


def test_overlap_counts_match_hand_counts(seg_ref):
    seg, ref = seg_ref
    pm = PairwiseMeasures(seg, ref)
    inter = 8 * 8 * 6
    assert pm.tp() == inter
    assert pm.fp() == 8 * 8 * 2
    assert pm.fn() == 8 * 8 * 2
    assert pm.tn() == 16 ** 3 - inter - 2 * 8 * 8 * 2
    assert pm.n_intersection() == inter
    assert pm.n_union() == 8 * 8 * 10


def test_dice_jaccard_match_metrics_module(seg_ref):
    seg, ref = seg_ref
    pm = PairwiseMeasures(seg, ref)
    assert pm.dice_score() == pytest.approx(metrics.dc(seg, ref))
    assert pm.jaccard() == pytest.approx(metrics.jc(seg, ref))
    assert pm.sensitivity() == pytest.approx(metrics.recall(seg, ref))
    assert pm.specificity() == pytest.approx(metrics.specificity(seg, ref))


def test_vol_diff_and_accuracy(seg_ref):
    seg, ref = seg_ref
    pm = PairwiseMeasures(seg, ref)
    assert pm.vol_diff() == 0.0            # equal volumes
    assert pm.accuracy() == pytest.approx(
        (pm.tp() + pm.tn()) / 16 ** 3)
    assert pm.informedness() == pytest.approx(
        pm.sensitivity() + pm.specificity() - 1)
    assert pm.markedness() == pytest.approx(
        pm.positive_predictive_values()
        + pm.negative_predictive_values() - 1)


def test_border_map_six_neighborhood():
    v = _cube(4, 12, 4, 12, 4, 12)
    border = MorphologyOps(v, 8).border_map()
    # interior of the cube is not border; faces are
    assert not border[8, 8, 8]
    assert border[4, 8, 8] and border[11, 8, 8] and border[8, 4, 8]
    # border voxel count of an 8-cube: 8^3 - 6^3 interior
    assert border.sum() == 8 ** 3 - 6 ** 3


def test_hausdorff_matches_shift_distance(seg_ref):
    seg, ref = seg_ref
    pm = PairwiseMeasures(seg, ref)
    # 2-voxel x-shift of identical cubes: every border point of one is
    # within 2 of the other; the farthest is exactly 2
    assert pm.measured_hausdorff_distance() == pytest.approx(2.0)
    # medpy-formula HD from eval/metrics agrees on this shape
    assert pm.measured_hausdorff_distance() == pytest.approx(
        metrics.hd(seg, ref))
    assert 0 < pm.measured_average_distance() < 2


def test_distances_honor_pixdim(seg_ref):
    seg, ref = seg_ref
    pm = PairwiseMeasures(seg, ref, pixdim=(1.0, 1.0, 2.5))
    assert pm.measured_hausdorff_distance() == pytest.approx(5.0)


def test_com_dist(seg_ref):
    seg, ref = seg_ref
    pm = PairwiseMeasures(seg, ref, pixdim=(1, 1, 1))
    assert pm.com_dist() == pytest.approx(2.0)   # x-shift by 2
    pm2 = PairwiseMeasures(seg, ref, pixdim=(1, 1, 3.0))
    assert pm2.com_dist() == pytest.approx(6.0)
    assert np.allclose(pm.com_ref(), (7.5, 7.5, 7.5))


def test_connected_elements_counts_all_components():
    # ref: two blobs; seg: hits one of them + one spurious blob
    ref = _cube(2, 5, 2, 5, 2, 5) + _cube(10, 13, 10, 13, 10, 13)
    seg = _cube(2, 5, 2, 5, 2, 5) + _cube(10, 13, 2, 5, 2, 5)
    pm = PairwiseMeasures(seg, ref)
    tp_c, fp_c, fn_c = pm.connected_elements()
    assert (tp_c, fp_c, fn_c) == (1, 1, 1)
    # the off-by-one in the dead reference would have missed the LAST
    # component; make the missed one be the last label in both maps
    de, defp, defn = pm.detection_error()
    assert defp == 27 and defn == 27 and de == 54


def test_outline_error_zero_on_perfect_overlap():
    ref = _cube(4, 12, 4, 12, 4, 12)
    pm = PairwiseMeasures(ref.copy(), ref)
    oer, oefp, oefn = pm.outline_error()
    assert oer == 0 and oefp == 0 and oefn == 0
    assert pm.connected_elements() == (1, 0, 0)
    assert pm.detection_error() == (0, 0, 0)


def test_outline_error_counts_boundary_voxels(seg_ref):
    seg, ref = seg_ref
    pm = PairwiseMeasures(seg, ref)
    oer, oefp, oefn = pm.outline_error()
    # single overlapping component pair: outline error == voxel FP/FN
    assert oefp == pm.fp() and oefn == pm.fn()
    assert oer == pytest.approx(2 * (oefp + oefn)
                                / (pm.n_pos_seg() + pm.n_pos_ref()))


def test_check_binary_rejects_soft_maps():
    ref = _cube(4, 12, 4, 12, 4, 12)
    soft = ref * 0.7
    with pytest.raises(ValueError):
        PairwiseMeasures(soft, ref).dice_score()


def test_empty_flag_sentinels(seg_ref):
    seg, ref = seg_ref
    pm = PairwiseMeasures(seg, ref, empty=True)
    assert pm.positive_predictive_values() == -1
    assert pm.com_dist() == -1
    assert pm.com_seg() == -1


def test_to_string_and_header(seg_ref):
    seg, ref = seg_ref
    keys = ('dice', 'jaccard', 'haus_dist', 'connected_elements')
    pm = PairwiseMeasures(seg, ref, measures=keys)
    header = pm.header_str()
    assert header == ',Dice,IoU,HausDist,TPc,FPc,FNc'.replace('IoU', 'Jaccard')
    row = pm.to_string()
    # tuple measures expand to comma-separated cells
    assert len(row.split(',')) == 6
    assert float(row.split(',')[0]) == pytest.approx(pm.dice_score(), abs=1e-4)


def test_regression_measures():
    rng = np.random.RandomState(0)
    ref = rng.randn(8, 8, 8)
    reg = ref + 0.1
    pmr = PairwiseMeasuresRegression(reg, ref)
    assert pmr.mse() == pytest.approx(0.01)
    assert pmr.rmse() == pytest.approx(0.1)
    assert pmr.mae() == pytest.approx(0.1)
    assert pmr.r2() == pytest.approx(1.0, abs=1e-3)
    assert pmr.header_str() == ',MSE,RMSE,MAE,R2'
    assert len(pmr.to_string().split(',')) == 4
