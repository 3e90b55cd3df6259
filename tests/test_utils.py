"""Tests for schedulers, gradient clipping, size estimation, feature capture,
post-processing, and the extended model utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cooperative_training_and_latent_space_data_augmentation_tpu.eval.post_process import (
    keep_largest_connected_components,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.models.unet import UNet
from cooperative_training_and_latent_space_data_augmentation_tpu.ops.image import (
    filter_unlabelled_predictions,
    sharpen_predictions,
    unit_norm,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.utils.estimate import (
    count_params,
    extract_features,
    param_bytes,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.utils.schedulers import (
    ReduceLROnPlateau,
    clip_grad_by_adam_bound,
    lr_poly,
    make_lr_schedule,
    make_optimizer,
    make_plateau_scheduler,
)


# ------------------------------------------------------------- LR schedules
def test_lr_poly():
    assert lr_poly(1e-3, 0, 100, 0.985) == pytest.approx(1e-3)
    assert lr_poly(1e-3, 50, 100, 1.0) == pytest.approx(5e-4)


def test_step_schedules():
    s = make_lr_schedule("step", lr_decay_iters=5)
    assert float(s(0)) == 1.0
    assert float(s(5)) == 0.5
    assert float(s(10)) == 0.25
    s2 = make_lr_schedule("step2", lr_decay_iters=5)
    assert float(s2(5)) == pytest.approx(0.1)


def test_warmstart_schedules():
    # model_util.py:644-668 breakpoints
    s = make_lr_schedule("step_warmstart")
    np.testing.assert_allclose(
        [float(s(e)) for e in (0, 4, 5, 99, 100, 199, 200)],
        [0.1, 0.1, 1.0, 1.0, 0.1, 0.1, 0.01], rtol=1e-6)
    s2 = make_lr_schedule("step_warmstart2")
    np.testing.assert_allclose(
        [float(s2(e)) for e in (0, 5, 49, 50, 100)],
        [0.1, 1.0, 1.0, 0.1, 0.01], rtol=1e-6)


def test_lambda_schedule():
    s = make_lr_schedule("lambda", epoch_count=0, niter=10, niter_decay=10)
    assert float(s(0)) == pytest.approx(1.0)   # before decay window
    assert float(s(9)) == pytest.approx(1.0 - 0 / 11 - 0, abs=1e-2)
    assert float(s(19)) <= 0.1


def test_plateau_scheduler():
    sched = make_plateau_scheduler("plateau")
    scale = 1.0
    for _ in range(3):
        scale = sched.step(1.0)  # no improvement
    assert scale == 1.0  # patience 5 not exceeded
    for _ in range(4):
        scale = sched.step(1.0)
    assert scale == pytest.approx(0.1)  # dropped once after >5 bad epochs


def test_unknown_policy_raises():
    with pytest.raises(NotImplementedError):
        make_lr_schedule("nope")


# --------------------------------------------------------------- grad clip
def test_clip_grad_by_adam_bound():
    clip = clip_grad_by_adam_bound()
    params = {"w": jnp.zeros((3,))}
    state = clip.init(params)
    g1 = {"w": jnp.asarray([100.0, -100.0, 0.001])}
    out1, state = clip.update(g1, state, params)
    # first step: reference skips clipping (optimizer state step < 1)
    np.testing.assert_allclose(np.asarray(out1["w"]), np.asarray(g1["w"]))
    out2, state = clip.update(g1, state, params)
    # steady gradients stay within 3*sqrt(v_hat)+0.1 of themselves
    assert np.all(np.abs(np.asarray(out2["w"])) <= 3 * 100 + 0.1)
    # a spike after small gradients gets clamped hard
    small = {"w": jnp.asarray([0.001, 0.001, 0.001])}
    st = clip.init(params)
    _, st = clip.update(small, st, params)
    _, st = clip.update(small, st, params)
    spike = {"w": jnp.asarray([10.0, 10.0, 10.0])}
    out, _ = clip.update(spike, st, params)
    assert np.all(np.asarray(out["w"]) < 1.0)


def test_make_optimizer_trains():
    tx = make_optimizer(1e-2, policy="step", lr_decay_iters=100, clip=True)
    params = {"w": jnp.ones((4,))}
    st = tx.init(params)
    grads = {"w": jnp.ones((4,))}
    updates, st = tx.update(grads, st, params)
    assert np.all(np.isfinite(np.asarray(updates["w"])))


# ------------------------------------------------------- estimate / capture
def test_count_params_and_bytes():
    model = UNet(num_classes=2, feature_scale=4)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)), train=False)
    n = count_params(v["params"])
    assert n > 10_000
    assert param_bytes(v["params"]) == 4 * n  # float32


def test_extract_features():
    model = UNet(num_classes=2, feature_scale=4)
    x = jnp.ones((1, 32, 32, 1))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out, feats = extract_features(model, v, x)
    assert out.shape == (1, 32, 32, 2)
    assert len(feats) > 5  # captured intermediate activations
    assert any(getattr(a, "ndim", 0) == 4 for a in feats.values())


# ------------------------------------------------------------ post-process
def test_keep_largest_connected_components():
    mask = np.zeros((10, 10), np.uint8)
    mask[1:4, 1:4] = 1      # big blob class 1
    mask[8, 8] = 1          # speck class 1 (should vanish)
    mask[5:7, 5:9] = 2      # class 2 blob
    out = keep_largest_connected_components(mask, n_classes=3)
    assert out[2, 2] == 1 and out[8, 8] == 0
    assert np.array_equal(out == 2, mask == 2)


# ------------------------------------------------------------- model utils
def test_sharpen_predictions():
    logits = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 4).astype(np.float32))
    p = sharpen_predictions(logits, temperature=0.5)
    base = jax.nn.softmax(logits, -1)
    np.testing.assert_allclose(np.asarray(p.sum(-1)), 1.0, rtol=1e-5)
    # sharpening increases the max class probability
    assert float(jnp.mean(p.max(-1))) > float(jnp.mean(base.max(-1)))


def test_filter_unlabelled_predictions():
    probs = jnp.asarray([[[[0.9, 0.1], [0.5, 0.5]]]])  # 1x1x2x2
    conf = filter_unlabelled_predictions(probs, threshold=0.8)
    assert conf.shape == probs.shape


def test_unit_norm():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 1).astype(np.float32)) * 7
    y = unit_norm(x)
    assert float(jnp.max(jnp.abs(y))) <= 1.0 + 1e-5
    y2 = unit_norm(x, use_p_norm=True)
    n = np.linalg.norm(np.asarray(y2).reshape(2, -1), axis=1)
    np.testing.assert_allclose(n, 1.0, rtol=1e-4)


# ---------------------------------------------------------------------- EMA
def test_exponential_moving_average():
    from cooperative_training_and_latent_space_data_augmentation_tpu.utils.ema import (
        ExponentialMovingAverage,
    )
    import jax.numpy as jnp

    params = {"w": jnp.zeros((3,))}
    ema = ExponentialMovingAverage(params, decay=0.9, use_num_updates=True)
    new = {"w": jnp.ones((3,))}
    ema.update(new)
    # warm-up: decay = min(0.9, 2/11) -> shadow moves most of the way
    np.testing.assert_allclose(np.asarray(ema.copy_to()["w"]),
                               (1 - 2 / 11) * 1.0, rtol=1e-5)
    ema.store(new)
    assert ema.restore() is new
    ema2 = ExponentialMovingAverage(params, decay=0.5, use_num_updates=False)
    ema2.update(new)
    np.testing.assert_allclose(np.asarray(ema2.copy_to()["w"]), 0.5, rtol=1e-6)
    with pytest.raises(ValueError):
        ExponentialMovingAverage(params, decay=1.5)


def test_adaptive_norms():
    from cooperative_training_and_latent_space_data_augmentation_tpu.models.layers import (
        adaptive_batch_norm,
        adaptive_instance_norm,
    )
    import jax.numpy as jnp

    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 4).astype(np.float32))
    out = adaptive_instance_norm(x, jnp.full((4,), 2.0), jnp.full((4,), 1.0))
    # per-sample/per-channel mean ~1 (bias), std ~2 (weight)
    np.testing.assert_allclose(np.asarray(out.mean((1, 2))), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.std((1, 2))), 2.0, atol=1e-2)
    out_b = adaptive_batch_norm(x, jnp.ones((4,)), jnp.zeros((4,)))
    np.testing.assert_allclose(np.asarray(out_b.mean((0, 1, 2))), 0.0, atol=1e-5)


def test_orbax_checkpoint_roundtrip(tmp_path):
    from cooperative_training_and_latent_space_data_augmentation_tpu.utils.checkpoint import (
        latest_step,
        restore_checkpoint,
        save_checkpoint,
    )

    state = {"params": {"w": jnp.arange(4, dtype=jnp.float32)},
             "step": jnp.asarray(7, jnp.int32)}
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, state, step=7)
    save_checkpoint(d, jax.tree.map(lambda x: x + 1, state), step=8)
    assert latest_step(d) == 8
    template = jax.tree.map(jnp.zeros_like, state)
    restored = restore_checkpoint(d, template)
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                               np.arange(4) + 1)
    restored7 = restore_checkpoint(d, template, step=7)
    np.testing.assert_allclose(np.asarray(restored7["params"]["w"]), np.arange(4))


def test_profiling_utils(tmp_path):
    from cooperative_training_and_latent_space_data_augmentation_tpu.utils.profiling import (
        cost_summary,
        time_fn,
        trace,
    )

    f = jax.jit(lambda x: (x @ x.T).sum())
    x = jnp.ones((64, 64))
    t = time_fn(f, x, warmup=1, iters=3)
    assert t["compile_s"] > 0 and t["steady_s"] > 0
    cs = cost_summary(f, x, measured_s=t["steady_s"])
    assert cs["flops"] > 0
    with trace(str(tmp_path / "tb")):
        jax.block_until_ready(f(x))
    import os
    assert any(os.scandir(str(tmp_path / "tb")))


def test_save_helpers(tmp_path):
    """The analysis/notebook savers from common_utils/save.py:19-343."""
    import numpy as _np

    from cooperative_training_and_latent_space_data_augmentation_tpu.utils.save import (
        link_image,
        load_dict,
        save_dict,
        save_imgs,
        save_list_results_as_png,
        save_npy2image,
        save_numpy_as_nrrd,
        save_predict,
        save_results_as_png,
        save_results_with_points_as_png,
    )

    d = {"a": 1, "rows": [1, 2, 3]}
    p = save_dict(d, str(tmp_path / "sub" / "x.pkl"))
    assert load_dict(p) == d

    rng = _np.random.RandomState(0)
    imgs = rng.rand(3, 8, 8, 1).astype(_np.float32)
    logits = rng.rand(3, 8, 8, 4).astype(_np.float32)
    p = save_imgs([imgs, logits], is_image=True, names=["img", "pred"],
                  cmaps=["gray", "RdBu"], save_dir=str(tmp_path / "imgs"),
                  file_name="t_{}.png")
    assert p is None or _np.fromfile(p, dtype=_np.uint8).size > 0

    vol = rng.rand(3, 8, 8).astype(_np.float32)
    p = save_predict(vol, str(tmp_path / "pred"), "patient_01", "ED_img.nrrd")
    assert p.endswith(".nrrd") and _np.fromfile(p, dtype=_np.uint8).size > 0
    p2 = save_numpy_as_nrrd(vol, str(tmp_path / "plain.nrrd"))
    from cooperative_training_and_latent_space_data_augmentation_tpu.data.nifti import (
        read_nrrd,
    )

    back, _ = read_nrrd(p2)
    _np.testing.assert_allclose(back, vol, atol=1e-6)

    link = link_image(p2, str(tmp_path / "linked"), "patient_01")
    assert _np.fromfile(link, dtype=_np.uint8).size > 0  # resolves through symlink
    link_image(p2, str(tmp_path / "linked"), "patient_01")  # idempotent

    a = [rng.rand(8, 8) for _ in range(3)]
    assert save_results_as_png(a, str(tmp_path / "row.png"), labels=list("abc"))
    assert save_list_results_as_png(
        [a, a], str(tmp_path / "grid.png"), labels=["r0", "r1"],
        add_points=[[[2, 3]], [[4, 5]]], which_index=0)
    assert save_results_with_points_as_png(
        a, str(tmp_path / "pts.png"), points=[[[1, 1]], None, [[2, 2]]])
    assert save_npy2image(a[0], str(tmp_path / "npy2img"), "x")
