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


def test_adaadam_optimizer_trains_and_decays():
    """'AdaAdam' (base_segmentation_model.set_optmizers:214-223) = Adam +
    step LR decay x0.5 every 50 EPOCHS; steps_per_epoch converts the
    per-update count to epochs (the reference steps the scheduler per
    epoch)."""
    solver = SegmentationSolver("UNet_16", optimizer_name="AdaAdam",
                                learning_rate=1e-3, steps_per_epoch=2)
    state = solver.init_state(jax.random.PRNGKey(0), input_hw=(32, 32))
    step = solver.make_train_step(donate=False)
    batch = _batch()
    first = None
    for i in range(5):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        if first is None:
            first = float(m["loss/total"])
    assert float(m["loss/total"]) < first
    # schedule check: the folded LR halves at epoch 50 = update 100
    from cooperative_training_and_latent_space_data_augmentation_tpu.utils.schedulers import (
        make_optimizer,
    )

    tx = make_optimizer(1e-3, policy="step", lr_decay_iters=50,
                        steps_per_epoch=2)
    params = {"w": jnp.ones(3)}
    opt_state = tx.init(params)
    g = {"w": jnp.ones(3)}

    def lr_at(count):
        # drive the inner count to `count`, then measure one update's scale
        s = opt_state
        for _ in range(count):
            _, s = tx.update(g, s, params)
        upd, _ = tx.update(g, s, params)
        return float(jnp.abs(upd["w"][0]))

    # Adam's update magnitude under constant grads ~ lr; compare the ratio
    # across the epoch-50 boundary (updates 100) instead of absolutes,
    # sampling away from the boundary to dodge optax's count-offset ambiguity
    assert abs(lr_at(90) / lr_at(110) - 2.0) < 0.2


def test_clipped_optimizer_trains():
    """clip_grad=True (IGEBM Adam-bound clip) must still train."""
    solver = SegmentationSolver("UNet_16", clip_grad=True, learning_rate=1e-3)
    state = solver.init_state(jax.random.PRNGKey(0), input_hw=(32, 32))
    step = solver.make_train_step(donate=False)
    batch = _batch()
    first = None
    for i in range(5):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        if first is None:
            first = float(m["loss/total"])
    assert float(m["loss/total"]) < first


def test_unknown_optimizer_raises():
    with pytest.raises(NotImplementedError):
        SegmentationSolver("UNet_16", optimizer_name="SGD")


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
