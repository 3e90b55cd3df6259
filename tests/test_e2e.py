"""End-to-end smoke: full training driver on synthetic phantoms (tiny shapes),
then volume evaluation — BASELINE configs[0]'s CPU-runnable path."""

import os

import jax
import numpy as np
import pytest

from cooperative_training_and_latent_space_data_augmentation_tpu.config import (
    ExperimentConfig,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.data.synthetic import (
    SyntheticSegDataset,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.eval.tester import (
    TestSegmentationNetwork,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.train.cooperative import (
    CooperativeTripletSolver,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.train.driver import (
    experiment_dirs,
    train_network,
)


@pytest.mark.slow
def test_full_training_loop_and_eval(tmp_path):
    cfg = ExperimentConfig.from_dict({
        "name": "e2e",
        "data": {"pad_size": [64, 64, 1], "crop_size": [48, 48, 1],
                 "data_aug_policy": "ACDC_affine",
                 "keep_orig_image_label_pair_for_training": True,
                 "num_classes": 4},
        "learning": {"latent_DA": True, "batch_size": 4, "n_epochs": 2,
                     "max_iteration": 50000, "lr": 1e-3},
        "output": {"save_epoch_every_num_epochs": 1},
    })
    train_set = SyntheticSegDataset(length=8, pad_size=(64, 64), seed=0)
    val_set = SyntheticSegDataset(length=4, pad_size=(64, 64), seed=1)
    solver = CooperativeTripletSolver(num_classes=4, image_ch=1,
                                      input_hw=(48, 48),
                                      learning_rate=cfg.learning.lr)
    log_dir, model_dir = experiment_dirs(str(tmp_path), "synthetic", "smoke",
                                         4, "e2e", 0)
    state, best, last_epoch = train_network(
        "e2e", train_set, val_set, solver, cfg, model_dir=model_dir,
        log_dir=log_dir, log=True, seed=0)
    assert last_epoch == 1
    assert best > 0.1  # better than garbage on 4-way IoU
    # artifacts: best checkpoint + periodic + scalar log
    assert os.path.exists(os.path.join(model_dir, "best", "checkpoints",
                                       "image_encoder.msgpack"))
    assert os.path.exists(os.path.join(model_dir, "0", "checkpoints",
                                       "shape_decoder.msgpack"))
    assert os.path.exists(os.path.join(log_dir, "scalars.jsonl"))
    assert os.path.exists(os.path.join(log_dir, "e2e.json"))

    # volume-wise eval through the tester with the trained model
    predict = solver.make_predict(n_iter=2)

    def predict_fn(images):
        return predict(state.params, state.batch_stats, images)

    tester = TestSegmentationNetwork(val_set, predict_fn, crop_size=(48, 48),
                                     num_classes=4, chunk_size=5)
    summary = tester.run()
    assert np.isfinite(summary["LV_Dice_mean"])

    # resume from a crash snapshot
    snap = solver.save_snapshots(state, model_dir, epoch=last_epoch)
    state2, epoch2 = solver.load_snapshots(solver.init_state(jax.random.PRNGKey(9)),
                                           snap)
    assert epoch2 == last_epoch

    # orbax train-state checkpoint written at the periodic save (epoch 0)
    # and resumable: params round-trip exactly and training continues
    orbax_dir = os.path.join(model_dir, "orbax")
    from cooperative_training_and_latent_space_data_augmentation_tpu.utils.checkpoint import (
        latest_step,
        restore_checkpoint,
    )

    assert latest_step(orbax_dir) == last_epoch  # saved every epoch here
    template = solver.init_state(jax.random.PRNGKey(11))
    restored = restore_checkpoint(orbax_dir, template)
    assert int(restored.step) > 0  # checkpointed state had taken update steps
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]))
    state3, best3, last3 = train_network(
        "e2e-orbax-resume", train_set, val_set, solver, cfg,
        model_dir=model_dir, log_dir=log_dir, log=False, seed=0,
        resume_orbax=True)
    # resumed PAST the completed epochs (start = latest step + 1 = n_epochs)
    assert last3 == last_epoch + 1


@pytest.mark.slow
def test_training_loop_fused_epoch_path(tmp_path, monkeypatch):
    """Driver-level coverage of the fused-epoch scan path (TPU default;
    FUSED_EPOCH=1 forces it on CPU) including the max_iteration mid-epoch
    cap, which truncates the scanned index matrix."""
    monkeypatch.setenv("FUSED_EPOCH", "1")
    cfg = ExperimentConfig.from_dict({
        "name": "e2e_fused",
        "data": {"pad_size": [64, 64, 1], "crop_size": [48, 48, 1],
                 "data_aug_policy": "ACDC_affine",
                 "keep_orig_image_label_pair_for_training": True,
                 "num_classes": 4},
        # 8 samples / raw batch 2 = 4 iters/epoch; cap at 6 total -> the
        # second epoch runs a TRUNCATED 2-step scan and sets stop_flag
        "learning": {"latent_DA": True, "batch_size": 4, "n_epochs": 5,
                     "max_iteration": 6, "lr": 1e-3},
        "output": {"save_epoch_every_num_epochs": 10},
    })
    train_set = SyntheticSegDataset(length=8, pad_size=(64, 64), seed=0)
    val_set = SyntheticSegDataset(length=4, pad_size=(64, 64), seed=1)
    solver = CooperativeTripletSolver(num_classes=4, image_ch=1,
                                      input_hw=(48, 48),
                                      learning_rate=cfg.learning.lr)
    log_dir, model_dir = experiment_dirs(str(tmp_path), "synthetic", "smoke",
                                         4, "e2e_fused", 0)
    state, best, last_epoch = train_network(
        "e2e_fused", train_set, val_set, solver, cfg, model_dir=model_dir,
        log_dir=log_dir, log=True, seed=0)
    # epoch 0: 4 iters; epoch 1: capped at 2 iters -> stop
    assert last_epoch == 1
    assert np.isfinite(best)
    import json
    with open(os.path.join(log_dir, "scalars.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    per_epoch = {}
    for r in rows:
        if r["tag"] == "loss/standard/total":
            per_epoch[r["step"]] = r["value"]
    assert set(per_epoch) == {0, 1}


@pytest.mark.slow
def test_fused_pipelined_matches_serial_consume(tmp_path, monkeypatch):
    """PIPELINE_EPOCH (dispatch epoch k+1 + val k before fetching epoch k's
    results) must be a pure fetch-reorder: per-epoch loss scalars, val IoU,
    and the final params must be identical to the serial consume path."""
    import json

    def run(tag, pipeline_env):
        monkeypatch.setenv("FUSED_EPOCH", "1")
        monkeypatch.setenv("PIPELINE_EPOCH", pipeline_env)
        cfg = ExperimentConfig.from_dict({
            "name": tag,
            "data": {"pad_size": [64, 64, 1], "crop_size": [48, 48, 1],
                     "data_aug_policy": "ACDC_affine",
                     "keep_orig_image_label_pair_for_training": True,
                     "num_classes": 4},
            "learning": {"latent_DA": True, "batch_size": 4, "n_epochs": 3,
                         "max_iteration": 50000, "lr": 1e-3},
            "output": {"save_epoch_every_num_epochs": 10},
        })
        train_set = SyntheticSegDataset(length=8, pad_size=(64, 64), seed=0)
        val_set = SyntheticSegDataset(length=4, pad_size=(64, 64), seed=1)
        solver = CooperativeTripletSolver(num_classes=4, image_ch=1,
                                          input_hw=(48, 48),
                                          learning_rate=cfg.learning.lr)
        log_dir, model_dir = experiment_dirs(
            str(tmp_path), "synthetic", "smoke", 4, tag, 0)
        state, best, last_epoch = train_network(
            tag, train_set, val_set, solver, cfg, model_dir=model_dir,
            log_dir=log_dir, log=True, seed=0, use_orbax=False)
        with open(os.path.join(log_dir, "scalars.jsonl")) as f:
            rows = [json.loads(line) for line in f]
        scalars = {(r["tag"], r["step"]): r["value"] for r in rows
                   if not r["tag"].startswith("time/")}
        return state, best, last_epoch, scalars

    state_p, best_p, last_p, scal_p = run("pipe", "1")
    state_s, best_s, last_s, scal_s = run("serial", "0")
    assert last_p == last_s
    assert best_p == best_s
    assert scal_p == scal_s
    for a, b in zip(jax.tree_util.tree_leaves(state_p.params),
                    jax.tree_util.tree_leaves(state_s.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_multi_epoch_window_matches_serial(tmp_path, monkeypatch):
    """MULTI_EPOCH=E (K-epoch fused window: train + on-device validation +
    best tracking in one dispatch — VERDICT r3 #7) must reproduce the
    serial fused path: same per-epoch losses and validation scores (to the
    scan-vs-dispatch float reorder band), same model selection, same final
    params."""
    import json

    def run(tag, window_env):
        monkeypatch.setenv("FUSED_EPOCH", "1")
        monkeypatch.setenv("MULTI_EPOCH", window_env)
        cfg = ExperimentConfig.from_dict({
            "name": tag,
            "data": {"pad_size": [64, 64, 1], "crop_size": [48, 48, 1],
                     "data_aug_policy": "ACDC_affine",
                     "keep_orig_image_label_pair_for_training": True,
                     "num_classes": 4},
            "learning": {"latent_DA": True, "batch_size": 4, "n_epochs": 5,
                         "max_iteration": 50000, "lr": 1e-3},
            "output": {"save_epoch_every_num_epochs": 10},
        })
        train_set = SyntheticSegDataset(length=8, pad_size=(64, 64), seed=0)
        val_set = SyntheticSegDataset(length=5, pad_size=(64, 64), seed=1)
        solver = CooperativeTripletSolver(num_classes=4, image_ch=1,
                                          input_hw=(48, 48),
                                          learning_rate=cfg.learning.lr)
        log_dir, model_dir = experiment_dirs(
            str(tmp_path), "synthetic", "smoke", 4, tag, 0)
        state, best, last_epoch = train_network(
            tag, train_set, val_set, solver, cfg, model_dir=model_dir,
            log_dir=log_dir, log=True, seed=0, use_orbax=False)
        with open(os.path.join(log_dir, "scalars.jsonl")) as f:
            rows = [json.loads(line) for line in f]
        scalars = {(r["tag"], r["step"]): r["value"] for r in rows
                   if not r["tag"].startswith("time/")}
        assert os.path.exists(os.path.join(model_dir, "best", "checkpoints",
                                           "image_encoder.msgpack"))
        return state, best, last_epoch, scalars

    # epoch 0 serial (mandatory epoch-0 checkpoint), epochs 1-2 and 3-4 in
    # two fused windows
    state_w, best_w, last_w, scal_w = run("window", "2")
    state_s, best_s, last_s, scal_s = run("serial", "0")
    assert last_w == last_s == 4
    assert set(scal_w) == set(scal_s)
    for key in sorted(scal_s):
        np.testing.assert_allclose(
            scal_w[key], scal_s[key], rtol=1e-3, atol=1e-5,
            err_msg=f"scalar {key} diverged between window and serial")
    np.testing.assert_allclose(best_w, best_s, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(state_w.params),
                    jax.tree_util.tree_leaves(state_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)
