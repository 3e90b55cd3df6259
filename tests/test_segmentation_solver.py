"""Baseline single-network solver tests (SegmentationSolver, SURVEY C7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cooperative_training_and_latent_space_data_augmentation_tpu.eval.metrics import (
    RunningScore,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.train.segmentation import (
    NETWORK_REGISTRY,
    SegmentationSolver,
)


def _batch(n=4, hw=32, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "image": jnp.asarray(rng.rand(n, hw, hw, 1).astype(np.float32)),
        "label": jnp.asarray(rng.randint(0, 4, (n, hw, hw)).astype(np.int32)),
    }


def test_registry_names():
    for name in ["UNet_16", "UNet_32", "UNet_64", "FCN_16", "FCN_64"]:
        assert name in NETWORK_REGISTRY


def test_train_step_learns():
    solver = SegmentationSolver("UNet_16", loss_type="cross entropy")
    state = solver.init_state(jax.random.PRNGKey(0), input_hw=(32, 32))
    step = solver.make_train_step(donate=False)
    batch = _batch()
    first = None
    for i in range(5):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        if first is None:
            first = float(m["loss/total"])
    assert float(m["loss/total"]) < first
    pred = solver.predict(state, batch["image"], softmax=True)
    assert pred.shape == (4, 32, 32, 4)
    np.testing.assert_allclose(np.asarray(pred).sum(-1), 1.0, atol=1e-5)


def test_evaluate_updates_metric():
    solver = SegmentationSolver("UNet_16")
    state = solver.init_state(jax.random.PRNGKey(0), input_hw=(32, 32))
    batch = _batch(n=2)
    running = RunningScore(4)
    solver.evaluate(state, batch["image"], batch["label"], running)
    score, _ = running.get_scores()
    assert 0.0 <= score["Overall Acc: \t"] <= 1.0


def test_ema_teacher():
    solver = SegmentationSolver("UNet_16", use_ema=True, ema_decay=0.5)
    state = solver.init_state(jax.random.PRNGKey(0), input_hw=(32, 32))
    step = solver.make_train_step(donate=False)
    batch = _batch()
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    online = jax.tree_util.tree_leaves(state.params["online"])
    ema = jax.tree_util.tree_leaves(state.params["ema"])
    assert any(not np.allclose(o, e) for o, e in zip(online, ema))
    p = solver.predict(state, batch["image"], use_ema_params=True)
    assert p.shape == (4, 32, 32, 4)


def test_checkpoint_roundtrip(tmp_path):
    solver = SegmentationSolver("UNet_16")
    state = solver.init_state(jax.random.PRNGKey(1), input_hw=(32, 32))
    path = solver.save_model(state, str(tmp_path), "best")
    state2 = solver.init_state(jax.random.PRNGKey(2), input_hw=(32, 32))
    restored = solver.load_model(state2, path)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    snap = solver.save_snapshots(state, str(tmp_path), epoch=7)
    restored2, epoch = solver.load_snapshots(state2, snap)
    assert epoch == 7
