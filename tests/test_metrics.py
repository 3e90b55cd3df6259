"""Metric parity tests on synthetic masks with analytically-known values."""

import numpy as np
import pytest

from cooperative_training_and_latent_space_data_augmentation_tpu.eval import metrics as M


def test_dice_known_value():
    a = np.zeros((10, 10), np.uint8)
    b = np.zeros((10, 10), np.uint8)
    a[:5] = 1  # 50 px
    b[2:7] = 1  # 50 px, overlap rows 2-4 = 30 px
    assert M.dc(a, b) == pytest.approx(2 * 30 / 100)
    assert M.jc(a, b) == pytest.approx(30 / 70)


def test_dice_empty_is_nan():
    z = np.zeros((4, 4))
    assert np.isnan(M.dc(z, z))


def test_hd_known_value():
    a = np.zeros((32, 32), np.uint8)
    b = np.zeros((32, 32), np.uint8)
    a[10:20, 10:20] = 1
    b[13:23, 10:20] = 1  # shifted 3 rows down
    assert M.hd(a, b) == pytest.approx(3.0)
    assert M.hd(a, b, voxelspacing=[2.0, 2.0]) == pytest.approx(6.0)


def test_hd_2d_stack_skips_empty():
    a = np.zeros((3, 16, 16), np.uint8)
    b = np.zeros((3, 16, 16), np.uint8)
    a[0, 4:8, 4:8] = 1
    b[0, 6:10, 4:8] = 1  # slice 0: HD 2
    # slice 1, 2 empty -> skipped
    assert M.hd_2D_stack(a, b) == pytest.approx(2.0)
    assert M.hd_2D_stack(np.zeros_like(a), np.zeros_like(b)) == -1.0


def test_asd_symmetric_zero_for_identical():
    a = np.zeros((16, 16), np.uint8)
    a[4:12, 4:12] = 1
    assert M.asd(a, a) == pytest.approx(0.0)
    assert M.assd(a, a) == pytest.approx(0.0)


def test_volume_metrics():
    a = np.ones((4, 4))
    b = np.ones((4, 4))
    assert M.volumesimilarity(a, b) == 0.0
    assert M.volume_sim_index(a, b) == 1.0
    assert M.ravd(a, b) == 0.0
    half = np.zeros((4, 4))
    half[:2] = 1
    assert M.ravd(half, a) == pytest.approx(-0.5)
    assert M.volume_sim_index(half, a) == pytest.approx(1 - 8 / 24)


def test_running_score_perfect_and_mixed():
    rs = M.RunningScore(3)
    labels = np.random.RandomState(0).randint(0, 3, (2, 8, 8))
    rs.update(labels, labels)
    score, cls_iou = rs.get_scores()
    assert score["Mean IoU : \t"] == pytest.approx(1.0)
    assert score["Overall Acc: \t"] == pytest.approx(1.0)
    rs.reset()
    preds = np.zeros_like(labels)
    rs.update(labels, preds)
    score2, _ = rs.get_scores()
    assert score2["Mean IoU : \t"] < 1.0


def test_running_segmentation_score(tmp_path):
    rss = M.RunningSegmentationScore(
        n_classes=4, idx2cls_dict={0: "BG", 1: "LV", 2: "MYO", 3: "RV"},
        metrics_list=["Dice", "HD", "ASD", "VolError", "VolSim"])
    rng = np.random.RandomState(0)
    gt = rng.randint(0, 4, (3, 32, 32))
    rss.update("patient_1", gt, gt, voxel_spacing=[1.37, 1.37, -1.0])
    summary, rows, header = rss.get_scores(save_path=str(tmp_path / "summary.csv"))
    assert summary["LV_Dice_mean"] == pytest.approx(1.0)
    assert summary["RV_Dice_mean"] == pytest.approx(1.0)
    assert summary["MYO_HD_mean"] == pytest.approx(0.0)
    assert summary["LV_VolSim_mean"] == pytest.approx(1.0)
    df = rss.save_patient_wise_result_to_csv(str(tmp_path / "detail.csv"))
    assert len(df) == 1
    assert (tmp_path / "summary.csv").exists()
    assert (tmp_path / "detail.csv").exists()
    rss.reset()
    assert all(len(v) == 0 for v in rss.multi_scores.values())


def test_confusion_matrix_update_device():
    import jax.numpy as jnp

    conf = jnp.zeros((2, 2), jnp.float64)
    lt = jnp.array([[0, 0, 1, 1]])
    lp = jnp.array([[0, 1, 1, 1]])
    conf = M.confusion_matrix_update(conf, lt, lp)
    np.testing.assert_array_equal(np.asarray(conf), [[1, 1], [0, 2]])


def test_write_eval_scores_to_disk(tmp_path):
    import numpy as np

    from cooperative_training_and_latent_space_data_augmentation_tpu.eval.metrics import (
        RunningSegmentationScore,
        write_eval_scores_to_disk,
    )

    rm = RunningSegmentationScore(n_classes=2, idx2cls_dict={0: "BG", 1: "FG"},
                                  metrics_list=["Dice", "HD"])
    pred = np.zeros((2, 8, 8), np.int32)
    pred[:, 2:5, 2:5] = 1
    gt = np.zeros((2, 8, 8), np.int32)
    gt[:, 2:5, 2:6] = 1
    rm.update("p0", pred, gt, voxel_spacing=[1, 1, 1])
    path = write_eval_scores_to_disk({"A": rm}, str(tmp_path / "report.txt"), ["A"])
    lines = open(path).read().splitlines()
    assert "A [Dice]" in lines[0] and "A [HD]" in lines[0]
    assert "(" in lines[1]


def test_plot_helpers(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from cooperative_training_and_latent_space_data_augmentation_tpu.analysis.visualize import (
        plot_general,
        plot_image,
    )

    fig, axes = plt.subplots(1, 2)
    plot_image(np.random.rand(8, 8), ax=axes[0], title="img")
    plot_general(np.random.rand(8, 8), ax=axes[1], title="any", cmap="viridis")
    fig.savefig(str(tmp_path / "panel.png"))
    plt.close(fig)
    assert (tmp_path / "panel.png").exists()
