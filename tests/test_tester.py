"""Volume-wise tester + cross-domain driver tests (synthetic data)."""

import numpy as np
import jax
import jax.numpy as jnp

from cooperative_training_and_latent_space_data_augmentation_tpu.data.synthetic import (
    SyntheticSegDataset,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.eval.tester import (
    TestSegmentationNetwork,
    evaluate_cross_domain,
)


def _oracle_predict(images):
    """Fake model: thresholds the phantom intensities back into labels.

    Synthetic phantoms draw class intensities from fixed bins, so a simple
    intensity-based classifier scores well above chance."""
    img = images[..., 0]
    logits = jnp.stack([
        -10.0 * jnp.ones_like(img),
        jnp.zeros_like(img),
        -jnp.ones_like(img),
        -2 * jnp.ones_like(img),
    ], axis=-1)
    return logits


def test_tester_runs_and_reports(tmp_path):
    ds = SyntheticSegDataset(length=6, n_patients=2, slices_per_patient=4,
                             pad_size=(64, 64))
    tester = TestSegmentationNetwork(
        ds, _oracle_predict, crop_size=(48, 48), num_classes=4,
        metrics_list=["Dice", "HD"], chunk_size=3,
        save_path=str(tmp_path), save_predict=True)
    summary = tester.run()
    assert "LV_Dice_mean" in summary
    assert (tmp_path / "summary.csv").exists()
    assert (tmp_path / "detail.csv").exists()
    assert (tmp_path / "pred").exists()
    assert len(tester.patient_results) == 2
    assert len(tester.top_k(1)) == 1
    assert tester.worst_k(1)[0]["dice"] <= tester.top_k(1)[0]["dice"]


def test_chunked_prediction_pads_z():
    ds = SyntheticSegDataset(length=3, n_patients=1, slices_per_patient=7,
                             pad_size=(64, 64))
    calls = []

    def spy_predict(images):
        calls.append(images.shape)
        return _oracle_predict(images)

    tester = TestSegmentationNetwork(ds, spy_predict, crop_size=(48, 48),
                                     chunk_size=4)
    img, gt = ds.get_patient_data_for_testing(0, crop_size=(48, 48))
    logits = tester.predict_volume(img)
    assert logits.shape[0] == 7  # pad slices dropped
    assert all(s == (4, 48, 48, 1) for s in calls)  # static chunk shape


def test_cross_domain_driver(tmp_path):
    datasets = {
        "domainA": SyntheticSegDataset(length=4, n_patients=1,
                                       slices_per_patient=3, pad_size=(64, 64),
                                       seed=0),
        "domainB": SyntheticSegDataset(length=4, n_patients=1,
                                       slices_per_patient=3, pad_size=(64, 64),
                                       seed=9),
    }
    results = evaluate_cross_domain(_oracle_predict, datasets,
                                    save_dir=str(tmp_path), crop_size=(48, 48))
    assert set(results) == {"domainA", "domainB"}
    for name in results:
        assert (tmp_path / name / "summary.csv").exists()


def test_methods_across_cvals_aggregation(tmp_path):
    """The reference's full results loop (test_ACDC_triplet_segmentation.py
    :115-158): methods x cvals x datasets with per-run CSVs and one
    aggregated mean±std table across cvals."""
    from cooperative_training_and_latent_space_data_augmentation_tpu.eval.tester import (
        evaluate_methods_across_cvals,
    )

    def make_predict_fn(method, cval):
        if method == "missing_method":
            return None  # checkpoint-not-found path: print & skip
        return _oracle_predict

    def dataset_builder(cval):
        return {"domainA": SyntheticSegDataset(
            length=4, n_patients=1, slices_per_patient=3, pad_size=(64, 64),
            seed=cval)}

    per_run, agg = evaluate_methods_across_cvals(
        make_predict_fn, dataset_builder,
        methods=["oracle", "missing_method"], cvals=[0, 1],
        save_dir=str(tmp_path), crop_size=(48, 48))
    assert set(per_run) == {("oracle", 0, "domainA"), ("oracle", 1, "domainA")}
    assert (tmp_path / "oracle" / "cv0" / "domainA" / "summary.csv").exists()
    assert (tmp_path / "oracle" / "cv1" / "domainA" / "summary.csv").exists()
    assert (tmp_path / "aggregated.csv").exists()
    row = agg[(agg.dataset == "domainA") & (agg.metric == "LV_Dice")]
    assert len(row) == 1 and int(row.n_cvals.iloc[0]) == 2
    # cross-cval mean of per-run means, and a finite dispersion
    vals = [per_run[("oracle", c, "domainA")]["LV_Dice_mean"] for c in (0, 1)]
    np.testing.assert_allclose(row["mean"].iloc[0], np.mean(vals), rtol=1e-9)
    np.testing.assert_allclose(row["std"].iloc[0], np.std(vals, ddof=1), rtol=1e-9)


def test_aggregate_across_cvals_empty():
    from cooperative_training_and_latent_space_data_augmentation_tpu.eval.tester import (
        aggregate_across_cvals,
    )

    assert aggregate_across_cvals({}) is None


def test_save_top_k_result(tmp_path):
    import os

    import jax
    import jax.numpy as jnp

    from cooperative_training_and_latent_space_data_augmentation_tpu.data.synthetic import (
        SyntheticSegDataset,
    )
    from cooperative_training_and_latent_space_data_augmentation_tpu.eval.tester import (
        TestSegmentationNetwork,
    )

    ds = SyntheticSegDataset(length=6, pad_size=(64, 64), n_patients=2,
                             slices_per_patient=3)
    predict = jax.jit(lambda x: jnp.zeros(x.shape[:3] + (4,)).at[..., 0].set(1.0))
    t = TestSegmentationNetwork(ds, predict, crop_size=(48, 48), chunk_size=4)
    t.run()
    paths = t.save_top_k_result(str(tmp_path), k=2)
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)
    worst = t.save_top_k_result(str(tmp_path), k=1, worst=True)
    assert os.path.exists(worst[0])


def test_solver_evaluate_updates_metric():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cooperative_training_and_latent_space_data_augmentation_tpu.eval.metrics import (
        RunningScore,
    )
    from cooperative_training_and_latent_space_data_augmentation_tpu.train.cooperative import (
        CooperativeTripletSolver,
    )

    solver = CooperativeTripletSolver(input_hw=(32, 32))
    state = solver.init_state(jax.random.PRNGKey(0))
    running = RunningScore(4)
    x = jnp.ones((2, 32, 32, 1)) * 0.5
    y = jnp.zeros((2, 32, 32), jnp.int32)
    pred_lbl, (imgs, preds, gts) = solver.evaluate(
        state.params, state.batch_stats, x, y, running, n_iter=2)
    assert pred_lbl.shape == (2, 32, 32)
    score, _ = running.get_scores()
    assert np.isfinite(score["Overall Acc: \t"])
