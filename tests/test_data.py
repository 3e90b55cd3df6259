"""Tests for splits (golden ID lists), NIfTI/NRRD IO, datasets, loader."""

import numpy as np
import pytest

from cooperative_training_and_latent_space_data_augmentation_tpu.data import (
    SyntheticSegDataset,
    get_ACDC_split_policy,
    get_UKBB_split_policy,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.data.base import (
    ConcatDataset,
    formulate_labels,
    label_remap_dict,
    pad_or_crop_to,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.data.nifti import (
    read_nifti,
    read_nrrd,
    write_nifti,
    write_nrrd,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.data.preprocess import (
    normalize_minmax_data,
    resample_by_spacing,
    swap_labels_acdc,
)


# ----------------------------------------------------------------- splits
def test_split_test_list_exact():
    # ACDC_few_shot_cv_settings.py:24-28 fixed 20-patient test list
    policy = get_ACDC_split_policy("standard", 0)
    assert policy["test"] == ["007", "008", "009", "010", "027", "028", "029",
                              "030", "047", "048", "049", "050", "067", "068",
                              "069", "070", "087", "088", "089", "090"]
    assert len(policy["train"]) == 70
    assert len(policy["validate"]) == 10


def test_split_numeric_identifier_deterministic():
    # "10" draws 10 patients from the fixed 40-pool with random_state=cval
    # via sklearn.train_test_split — exactly like the reference (:74-103).
    from sklearn.model_selection import train_test_split

    pool = ["001", "002", "003", "004", "005", "006", "012", "013",
            "021", "022", "023", "024", "025", "026", "032", "033",
            "041", "042", "043", "044", "045", "046", "052", "053",
            "061", "062", "063", "064", "065", "066", "072", "073",
            "081", "082", "083", "084", "085", "086", "092", "093"]
    for cval in range(3):
        expected, _ = train_test_split(pool, train_size=10, random_state=cval)
        policy = get_ACDC_split_policy("10", cval)
        assert policy["train"] == expected
        assert len(policy["unlabelled"]) == 25
        # no leakage between train and test
        assert not set(policy["train"]) & set(policy["test"])


def test_split_shot_settings():
    assert get_ACDC_split_policy("one_shot", 0)["train"] == ["002"]
    assert get_ACDC_split_policy("one_shot", 3)["train"] == ["062"]
    assert get_ACDC_split_policy("three_shot", 4)["train"] == ["002", "042", "095"]
    ub = get_ACDC_split_policy("three_shot_upperbound", 0)
    assert len(ub["train"]) == 3 + 25
    v = get_ACDC_split_policy("one_shot", 1)["validate"]
    assert v[:2] == ["011", "071"]


def test_ukbb_split():
    p = get_UKBB_split_policy("three_shot", 4)
    assert len(p["train"]) == 3
    assert len(p["test"]) == 100
    # deterministic per cval
    assert p["train"] == get_UKBB_split_policy("three_shot", 4)["train"]


# --------------------------------------------------------------------- io
def test_nifti_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    vol = rng.rand(5, 32, 40).astype(np.float32)
    path = str(tmp_path / "vol.nii.gz")
    write_nifti(path, vol, spacing=(1.25, 1.5, 8.0))
    back, spacing = read_nifti(path)
    np.testing.assert_allclose(back, vol, rtol=1e-6)
    assert spacing == pytest.approx((1.25, 1.5, 8.0))
    # uncompressed too
    path2 = str(tmp_path / "vol.nii")
    write_nifti(path2, (vol * 100).astype(np.int16), spacing=(1, 1, 1))
    back2, _ = read_nifti(path2)
    np.testing.assert_array_equal(back2, (vol * 100).astype(np.int16))


def test_nrrd_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    vol = rng.randint(0, 4, (7, 24, 24)).astype(np.int16)
    path = str(tmp_path / "seg.nrrd")
    write_nrrd(path, vol, spacing=(1.36719, 1.36719, 10.0))
    back, spacing = read_nrrd(path)
    np.testing.assert_array_equal(back, vol)
    assert spacing[0] == pytest.approx(1.36719)
    write_nrrd(str(tmp_path / "raw.nrrd"), vol.astype(np.float32), encoding="raw")
    back2, _ = read_nrrd(str(tmp_path / "raw.nrrd"))
    np.testing.assert_allclose(back2, vol.astype(np.float32))


# ------------------------------------------------------------- preprocess
def test_normalize_minmax():
    x = np.linspace(0, 1000, 10000).reshape(10, 100, 10)
    y = normalize_minmax_data(x)
    assert y.min() == 0.0 and y.max() == 1.0
    assert 0.4 < y.mean() < 0.6


def test_resample_by_spacing_inplane_only():
    vol = np.ones((4, 100, 100), np.float32)
    out = resample_by_spacing(vol, (2.0, 2.0, 8.0), (1.0, 1.0, -1.0), order=1)
    assert out.shape[0] == 4  # z untouched
    assert out.shape[1] == 200 and out.shape[2] == 200


def test_swap_labels():
    lbl = np.array([0, 1, 2, 3])
    np.testing.assert_array_equal(swap_labels_acdc(lbl), [0, 3, 2, 1])


def test_preprocess_acdc_dataset_raw_tree(tmp_path):
    """Full offline driver over a raw ACDC layout (acdc_preprocess.py:97-149):
    Info.cfg frame lookup, normalize, in-plane resample, RV<->LV swap, NRRD
    layout {out}/{pid}/{frame}_{img,seg}.nrrd scanned by data/acdc.py."""
    from cooperative_training_and_latent_space_data_augmentation_tpu.data.preprocess import (
        preprocess_acdc_dataset,
    )

    rng = np.random.RandomState(0)
    raw = tmp_path / "raw"
    for pid in ("001", "002"):
        pdir = raw / f"patient{pid}"
        pdir.mkdir(parents=True)
        (pdir / "Info.cfg").write_text("ED: 1\nES: 12\nNbFrame: 30\n")
        for frame_no in (1, 12):
            img = rng.rand(4, 40, 40).astype(np.float32) * 500.0
            seg = rng.randint(0, 4, (4, 40, 40)).astype(np.int16)
            write_nifti(str(pdir / f"patient{pid}_frame{frame_no:02d}.nii.gz"),
                        img, spacing=(2.0, 2.0, 8.0))
            write_nifti(str(pdir / f"patient{pid}_frame{frame_no:02d}_gt.nii.gz"),
                        seg, spacing=(2.0, 2.0, 8.0))
    out = tmp_path / "out"
    n = preprocess_acdc_dataset(str(raw), str(out))
    assert n == 4  # 2 patients x {ED, ES}
    img, spacing = read_nrrd(str(out / "001" / "ED_img.nrrd"))
    seg, _ = read_nrrd(str(out / "001" / "ED_seg.nrrd"))
    # in-plane resampled 2.0mm -> 1.36719mm: 40 * 2/1.36719 = 58.5 -> 58|59
    assert img.shape[0] == 4 and img.shape[1] in (58, 59)
    assert seg.shape == img.shape
    assert spacing[0] == pytest.approx(1.36719) and spacing[2] == 8.0
    assert 0.0 <= img.min() and img.max() <= 1.0  # percentile-normalized
    assert set(np.unique(seg)).issubset({0, 1, 2, 3})


def test_probe_format_names(tmp_path):
    from cooperative_training_and_latent_space_data_augmentation_tpu.data.acdc import (
        probe_format_names,
    )

    # empty/undecidable -> reference default (.nii.gz)
    assert probe_format_names(str(tmp_path))[0].endswith(".nii.gz")
    # stray dir without a match is skipped (probing continues)
    (tmp_path / "000_stray").mkdir()
    # NRRD tree (cli/preprocess.py output) -> .nrrd formats
    (tmp_path / "001").mkdir()
    (tmp_path / "001" / "ED_img.nrrd").write_bytes(b"x")
    img_fmt, lbl_fmt = probe_format_names(str(tmp_path), "ED")
    assert img_fmt == "{p_id}/{frame}_img.nrrd"
    assert lbl_fmt == "{p_id}/{frame}_seg.nrrd"
    # ACDC-C generator naming: {frame}_label, extension may differ from the
    # image's (symlinked source label) — stem AND extension are probed
    (tmp_path / "001" / "ED_label.nii.gz").write_bytes(b"x")
    img_fmt, lbl_fmt = probe_format_names(str(tmp_path), "ED")
    assert img_fmt == "{p_id}/{frame}_img.nrrd"
    assert lbl_fmt == "{p_id}/{frame}_label.nii.gz"
    # a real seg match (same ext) beats the label fallback
    (tmp_path / "001" / "ED_seg.nrrd").write_bytes(b"x")
    assert probe_format_names(str(tmp_path), "ED")[1] == "{p_id}/{frame}_seg.nrrd"
    # .nii.gz wins when both image extensions present (reference layout)
    (tmp_path / "001" / "ED_img.nii.gz").write_bytes(b"x")
    assert probe_format_names(str(tmp_path), "ED")[0].endswith(".nii.gz")


def test_label_remap_modes():
    lbl = np.array([[0, 1], [2, 3]])
    np.testing.assert_array_equal(
        formulate_labels(lbl, label_remap_dict(myocardium_only=True)),
        [[0, 0], [1, 0]])
    np.testing.assert_array_equal(
        formulate_labels(lbl, label_remap_dict(right_ventricle_only=True)),
        [[0, 0], [0, 1]])
    assert label_remap_dict() is None


# --------------------------------------------------------------- datasets
def test_synthetic_dataset():
    ds = SyntheticSegDataset(length=8, pad_size=(64, 64))
    assert len(ds) == 8
    s = ds[0]
    assert s["image"].shape == (64, 64, 1)
    assert s["label"].shape == (64, 64)
    assert s["image"].dtype == np.float32
    assert set(np.unique(s["label"])).issubset({0, 1, 2, 3})
    # cache returns the same object
    assert ds[0] is ds[0]
    vol_img, vol_lbl = ds.get_patient_data_for_testing(0, crop_size=(48, 48))
    assert vol_img.shape == (10, 48, 48, 1)
    assert vol_lbl.shape == (10, 48, 48)


def test_concat_dataset():
    d1 = SyntheticSegDataset(length=5, pad_size=(32, 32), seed=1)
    d2 = SyntheticSegDataset(length=7, pad_size=(32, 32), seed=2)
    cat = ConcatDataset([d1, d2])
    assert len(cat) == 12
    np.testing.assert_array_equal(cat[6]["label"], d2[1]["label"])
    assert cat.get_patient_num() == 6
    assert cat.get_id(4) == d2.get_id(1)


def test_pad_or_crop():
    x = np.ones((100, 250))
    y = pad_or_crop_to(x, (224, 224))
    assert y.shape == (224, 224)
    assert y.sum() == 100 * 224  # padded rows are zero


def test_loader_batching():
    import jax

    from cooperative_training_and_latent_space_data_augmentation_tpu.data.loader import (
        CooperativeBatcher,
        EvalBatcher,
    )

    ds = SyntheticSegDataset(length=10, pad_size=(64, 64))
    batcher = CooperativeBatcher(ds, batch_size=4, policy_name="no_aug",
                                 pad_hw=(64, 64), crop_hw=(48, 48),
                                 keep_orig=True, seed=0)
    batches = list(batcher.epoch(jax.random.PRNGKey(0)))
    assert len(batches) == 5  # 10 samples / raw_bs 2
    b = batches[0]
    assert b["image"].shape == (4, 48, 48, 1)  # 2 aug + 2 orig
    assert b["label"].shape == (4, 48, 48)
    ev = EvalBatcher(ds, batch_size=5, pad_hw=(64, 64), crop_hw=(48, 48))
    eb = next(iter(ev.epoch()))
    assert eb["image"].shape == (5, 48, 48, 1)
    assert eb["real_count"] == 5
    # ragged tail: wrap-padded to the full batch (static shape, ONE predict
    # compile) with real_count marking the rows that count toward metrics
    ev7 = EvalBatcher(SyntheticSegDataset(length=7, pad_size=(64, 64)),
                      batch_size=5, pad_hw=(64, 64), crop_hw=(48, 48))
    shapes = [(b["image"].shape[0], b["real_count"]) for b in ev7.epoch()]
    assert shapes == [(5, 5), (5, 2)]


# ---------------------------------------------------------------- prostate
def _make_prostate_root(tmp_path, n_patients=12, z=3, hw=16):
    rng = np.random.RandomState(0)
    root = tmp_path / "prostate"
    for i in range(1, n_patients + 1):
        pid = f"patient_{i:02d}"
        d = root / pid
        d.mkdir(parents=True)
        img = rng.rand(z, hw, hw).astype(np.float32)
        lbl = rng.randint(0, 3, (z, hw, hw)).astype(np.int16)
        write_nrrd(str(d / "t2_img.nrrd"), img)
        write_nrrd(str(d / "label.nrrd"), lbl)
    return str(root)


def test_prostate_split_policy(tmp_path):
    from cooperative_training_and_latent_space_data_augmentation_tpu.data.prostate import (
        PROSTATE_TEST_IDS,
        get_prostate_split_policy,
    )

    root = _make_prostate_root(tmp_path)
    pol = get_prostate_split_policy(root, "three_shot", cval=1)
    assert pol["test"] == PROSTATE_TEST_IDS
    assert len(pol["train"]) == 3
    assert not set(pol["train"]) & set(PROSTATE_TEST_IDS)
    # deterministic under the same cval, different under another
    pol2 = get_prostate_split_policy(root, "three_shot", cval=1)
    assert pol["train"] == pol2["train"]
    assert sorted(set(pol["train"]) | set(pol["unlabelled"])
                  | set(pol["validate"]) | set(pol["test"])
                  ) != []  # partitions cover ids


def test_prostate_dataset(tmp_path):
    from cooperative_training_and_latent_space_data_augmentation_tpu.data.prostate import (
        ProstateDecathlonDataset,
    )

    root = _make_prostate_root(tmp_path)
    ds = ProstateDecathlonDataset(root, split="train", data_setting="three_shot",
                                  cval=1, pad_size=(16, 16))
    assert len(ds) == 3 * 3  # 3 patients x 3 slices
    img, lbl = ds.load_data(0)
    assert img.shape == (16, 16, 1) and lbl.shape == (16, 16)
    vol, gt = ds.get_patient_data_for_testing(0, crop_size=(16, 16))
    assert vol.shape == (3, 16, 16, 1) and gt.shape == (3, 16, 16)
    assert ds.voxelspacing == [0.625, 0.625, 3.6]
    # binary mode folds PZ+CZ
    dsb = ProstateDecathlonDataset(root, split="test", cval=1,
                                   binary_segmentation=True, pad_size=(16, 16))
    _, gtb = dsb.get_patient_data_for_testing(0, crop_size=(16, 16))
    assert set(np.unique(gtb)) <= {0, 1}


def test_mean_image_helpers():
    from cooperative_training_and_latent_space_data_augmentation_tpu.data.base import (
        get_all_image_array_from_dataset,
        get_mean_image,
    )

    ds = SyntheticSegDataset(length=4, pad_size=(32, 32), seed=0)
    arr = get_all_image_array_from_dataset(ds)
    assert arr.shape[0] == 4
    mean = get_mean_image(ds)
    assert mean.shape == arr.shape[1:]
    np.testing.assert_allclose(mean, arr.mean(axis=0), rtol=1e-5, atol=1e-6)


def test_prefetch_iterator():
    from cooperative_training_and_latent_space_data_augmentation_tpu.data.loader import (
        prefetch,
    )

    assert list(prefetch(iter(range(10)), size=2)) == list(range(10))

    def boom():
        yield 1
        raise RuntimeError("producer failed")

    it = prefetch(boom(), size=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer failed"):
        next(it)


def test_prefetch_early_break_releases_producer():
    import threading
    import time

    from cooperative_training_and_latent_space_data_augmentation_tpu.data.loader import (
        prefetch,
    )

    before = threading.active_count()
    it = prefetch(iter(range(100)), size=2)
    assert next(it) == 0
    it.close()  # consumer abandons mid-iteration (max_iteration break)
    deadline = time.time() + 3.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_eval_batcher_no_duplication():
    """EvalBatcher must not wrap-pad: duplicated samples would be counted
    twice by the validation metrics and skew model selection."""
    from cooperative_training_and_latent_space_data_augmentation_tpu.data.loader import (
        BatchSampler,
        EvalBatcher,
    )

    s = BatchSampler(25, 20, shuffle=False, wrap=False)
    batches = list(s.epoch())
    assert [len(b) for b in batches] == [20, 5]
    assert sorted(np.concatenate(batches)) == list(range(25))
    # wrap=True tiles even when the shortfall exceeds n
    s2 = BatchSampler(3, 8, shuffle=False, wrap=True)
    (b,) = list(s2.epoch())
    assert len(b) == 8


def test_fused_pipeline_matches_separate_dispatches():
    """The one-dispatch train pipeline (make_batch_train_pipeline) must be
    value-identical to the separate augment + eval-transform + concat path
    it replaced (same key splits, same ops, fused for tunnel dispatch)."""
    import jax

    from cooperative_training_and_latent_space_data_augmentation_tpu.data.loader import (
        CooperativeBatcher,
    )
    from cooperative_training_and_latent_space_data_augmentation_tpu.data.synthetic import (
        SyntheticSegDataset,
    )

    ds = SyntheticSegDataset(length=8, pad_size=(64, 64), num_classes=4,
                             seed=0)
    b = CooperativeBatcher(ds, batch_size=4, pad_hw=(64, 64), crop_hw=(48, 48),
                           policy_name="ACDC_affine_elastic_intensity",
                           keep_orig=True, seed=3)
    raw = next(iter(b.raw_epoch()))
    img = jax.numpy.asarray(raw["image"])
    lbl = jax.numpy.asarray(raw["label"].astype(np.uint8))
    key = jax.random.PRNGKey(7)
    fused = b.pipeline(key, img, lbl)
    aug_i, aug_l = b.augment(key, img, lbl.astype(jax.numpy.int32))
    orig_i, orig_l = b.eval_transform(img, lbl.astype(jax.numpy.int32))
    np.testing.assert_array_equal(
        np.asarray(fused["image"]),
        np.concatenate([np.asarray(aug_i), np.asarray(orig_i)], axis=0))
    np.testing.assert_array_equal(
        np.asarray(fused["label"]),
        np.concatenate([np.asarray(aug_l), np.asarray(orig_l)], axis=0))


def test_device_cache_batches_match_streaming():
    """device_cache=True (whole dataset resident on device, per-iter index
    transfer only) must yield value-identical epochs to the streaming path
    — same sampler seed, same augmentation keys."""
    import jax

    from cooperative_training_and_latent_space_data_augmentation_tpu.data.loader import (
        CooperativeBatcher,
    )
    from cooperative_training_and_latent_space_data_augmentation_tpu.data.synthetic import (
        SyntheticSegDataset,
    )

    ds = SyntheticSegDataset(length=8, pad_size=(64, 64), num_classes=4,
                             seed=0)
    kw = dict(batch_size=4, pad_hw=(64, 64), crop_hw=(48, 48),
              policy_name="ACDC_affine_elastic_intensity", keep_orig=True,
              seed=11)
    stream = CooperativeBatcher(ds, device_cache=False, **kw)
    cached = CooperativeBatcher(ds, device_cache=True, **kw)
    key = jax.random.PRNGKey(5)
    got_s = list(stream.epoch(key))
    got_c = list(cached.epoch(key))
    assert len(got_s) == len(got_c) > 0
    for bs, bc in zip(got_s, got_c):
        np.testing.assert_array_equal(np.asarray(bs["image"]),
                                      np.asarray(bc["image"]))
        np.testing.assert_array_equal(np.asarray(bs["label"]),
                                      np.asarray(bc["label"]))
    # second epoch re-derives fresh indices/keys (no stale caching)
    key2 = jax.random.PRNGKey(6)
    again = list(cached.epoch(key2))
    assert any(not np.array_equal(np.asarray(a["image"]),
                                  np.asarray(b["image"]))
               for a, b in zip(got_c, again))


def test_fused_epoch_matches_streaming_loop():
    """fused_epoch_runner (whole epoch scanned in one dispatch) must produce
    the same parameter trajectory as the per-batch streaming loop: same
    sampler stream, same batch/step key schedule, same ops."""
    import jax

    from cooperative_training_and_latent_space_data_augmentation_tpu.data.loader import (
        CooperativeBatcher,
    )
    from cooperative_training_and_latent_space_data_augmentation_tpu.data.synthetic import (
        SyntheticSegDataset,
    )
    from cooperative_training_and_latent_space_data_augmentation_tpu.train.cooperative import (
        CooperativeTripletSolver,
    )

    ds = SyntheticSegDataset(length=8, pad_size=(40, 40), num_classes=4,
                             seed=0)
    kw = dict(batch_size=4, pad_hw=(40, 40), crop_hw=(32, 32),
              policy_name="ACDC_affine_elastic_intensity", keep_orig=True,
              seed=21, device_cache=True)
    solver = CooperativeTripletSolver(num_classes=4, image_ch=1,
                                      input_hw=(32, 32))
    state0 = solver.init_state(jax.random.PRNGKey(0))
    step = solver.make_train_step(latent_da=None, donate=False)

    # streaming reference trajectory
    b1 = CooperativeBatcher(ds, **kw)
    rng = jax.random.PRNGKey(3)
    rng, epoch_key = jax.random.split(rng)
    state_s = state0
    n_steps = 0
    stream_losses = []
    for batch in b1.epoch(epoch_key):
        rng, step_key = jax.random.split(rng)
        state_s, m = step(state_s, batch, step_key)
        stream_losses.append(float(m["loss/standard/total"]))
        n_steps += 1
    assert n_steps == 4  # 8 raw samples / (batch_size 4 // 2 with keep_orig)

    # fused epoch, fresh batcher with the same sampler seed
    b2 = CooperativeBatcher(ds, **kw)
    runner = b2.fused_epoch_runner(step.__wrapped__)
    rng2 = jax.random.PRNGKey(3)
    rng2, epoch_key2 = jax.random.split(rng2)
    idx = b2.epoch_index_matrix()
    img_all, lbl_all = b2._device_dataset()
    state_f, rng_out, stacked = runner(state0, img_all, lbl_all, idx,
                                       epoch_key2, rng2)
    assert stacked["loss/standard/total"].shape == (n_steps,)
    # the advanced step key continues the streaming sequence
    np.testing.assert_array_equal(np.asarray(rng_out), np.asarray(rng))
    # identical batches + keys -> identical per-step losses.  Step 0 runs
    # from identical params, so it pins the schedule tightly; later steps
    # compound the ~1e-8 scan-vs-unrolled reassociation drift through Adam
    # (params differ ~1e-6 by then), so the trajectory gets a looser band.
    fused_losses = np.asarray(stacked["loss/standard/total"])
    np.testing.assert_allclose(fused_losses[0], stream_losses[0], rtol=1e-5)
    np.testing.assert_allclose(fused_losses, np.asarray(stream_losses),
                               rtol=1e-3)
    # params: the ~1e-8 reassociation-level gradient differences pass
    # through Adam's sign-sensitive update as up-to-O(lr)=1e-4 wiggle PER
    # STEP on near-zero params (same rationale as test_sharding.py, which
    # allows 5e-4 after ONE step; this is 4 steps).  Real schedule bugs
    # (wrong key/batch order) diverge by orders of magnitude more — and
    # would already have failed the per-step loss check above.
    for a, b in zip(jax.tree_util.tree_leaves(state_s.params),
                    jax.tree_util.tree_leaves(state_f.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-3)
