"""Volume-wise evaluation harness + cross-domain driver.

Re-design of ``medseg/test_basic_segmentation_solver.py`` (TestSegmentationNetwork
:29-199: patient-wise volume iteration, chunked inference at <=10 slices,
spacing-aware metric updates, CSV reports, top-k/worst-k) and
``medseg/test_ACDC_triplet_segmentation.py`` (dataset registry + per-method x
per-dataset x per-cval loop producing summary/detailed CSVs, :31-158).

TPU adaptation: volumes are padded to a FIXED chunk size so one jitted
predict function serves every z-extent (static shapes; the pad slices are
dropped before metrics).
"""

from __future__ import annotations

import os
from os.path import join
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cooperative_training_and_latent_space_data_augmentation_tpu.eval.metrics import (
    RunningSegmentationScore,
)

IDX2CLS = {0: "BG", 1: "LV", 2: "MYO", 3: "RV"}  # test_ACDC...py:25-30


class TestSegmentationNetwork:
    """Patient-wise evaluator.

    ``predict_fn(images_nhwc) -> logits_nhwc`` must be a (jitted) callable;
    chunking pads the z-axis to multiples of ``chunk_size`` (reference caps
    chunks at <=10 slices, test_basic_segmentation_solver.py:97-102).
    """

    def __init__(self, test_dataset, predict_fn: Callable,
                 crop_size: Tuple[int, int] = (192, 192),
                 num_classes: int = 4,
                 idx2cls_dict: Optional[Dict[int, str]] = None,
                 metrics_list: Sequence[str] = ("Dice",),
                 foreground_only: bool = False,
                 chunk_size: int = 10,
                 save_path: Optional[str] = None,
                 save_predict: bool = False,
                 save_soft_prediction: bool = False):
        self.dataset = test_dataset
        self.predict_fn = predict_fn
        self.crop_size = crop_size
        self.num_classes = num_classes
        self.chunk_size = chunk_size
        self.save_path = save_path
        self.save_predict = save_predict
        self.save_soft_prediction = save_soft_prediction
        self.metric = RunningSegmentationScore(
            n_classes=num_classes,
            idx2cls_dict=idx2cls_dict or
            {k: v for k, v in IDX2CLS.items() if k < num_classes},
            metrics_list=list(metrics_list), foreground_only=foreground_only)
        self.patient_results: List[Dict] = []
        self.df = None

    def predict_volume(self, images_nhwc: np.ndarray) -> np.ndarray:
        """Chunked inference with z-padding to a static shape."""
        n = images_nhwc.shape[0]
        cs = self.chunk_size
        pad = (-n) % cs
        if pad:
            images_nhwc = np.concatenate(
                [images_nhwc, np.repeat(images_nhwc[-1:], pad, axis=0)], axis=0)
        logits = []
        for i in range(0, images_nhwc.shape[0], cs):
            out = self.predict_fn(jnp.asarray(images_nhwc[i:i + cs]))
            logits.append(np.asarray(out))
        return np.concatenate(logits, axis=0)[:n]

    def run(self) -> Dict[str, float]:
        """Evaluate all patients (test_basic_segmentation_solver.run:63-83)."""
        self.metric.reset()
        self.patient_results = []
        for pid_index in range(self.dataset.get_patient_num()):
            img, gt = self.dataset.get_patient_data_for_testing(
                pid_index, crop_size=self.crop_size)
            pid = self.dataset.get_id(pid_index)
            logits = self.predict_volume(np.asarray(img))
            pred = np.argmax(logits, axis=-1).astype(np.int32)
            spacing = self.dataset.get_voxel_spacing(pid_index)
            self.metric.update(pid, pred, np.asarray(gt), voxel_spacing=spacing)
            mean_fg_dice = float(np.nanmean(
                [self.metric.multi_scores[k][-1]
                 for k in self.metric.multi_scores if k.endswith("_Dice")]))
            self.patient_results.append(
                {"pid": pid, "dice": mean_fg_dice, "pred": pred, "gt": np.asarray(gt),
                 "image": np.asarray(img)})
            if self.save_path and self.save_predict:
                from cooperative_training_and_latent_space_data_augmentation_tpu.data.nifti import (
                    write_nrrd,
                )

                os.makedirs(join(self.save_path, "pred"), exist_ok=True)
                write_nrrd(join(self.save_path, "pred", f"{pid}_pred.nrrd"),
                           pred.astype(np.int16), spacing=spacing)
                if self.save_soft_prediction:
                    os.makedirs(join(self.save_path, "soft"), exist_ok=True)
                    np.save(join(self.save_path, "soft", f"{pid}_soft.npy"),
                            jax.nn.softmax(jnp.asarray(logits), -1))
        summary, rows, header = self.metric.get_scores(
            save_path=join(self.save_path, "summary.csv") if self.save_path else None)
        if self.save_path:
            self.df = self.metric.save_patient_wise_result_to_csv(
                join(self.save_path, "detail.csv"))
        else:
            self.df = self.metric.save_patient_wise_result_to_csv(None)
        return summary

    # top-k / worst-k reports (test_basic_segmentation_solver.py:182-256)
    def top_k(self, k: int = 5) -> List[Dict]:
        return sorted(self.patient_results, key=lambda r: -r["dice"])[:k]

    def worst_k(self, k: int = 5) -> List[Dict]:
        return sorted(self.patient_results, key=lambda r: r["dice"])[:k]

    def save_top_k_result(self, save_dir: str, k: int = 5,
                          worst: bool = False) -> List[str]:
        """PNG grids (input/GT/pred) for the k best or worst patients
        (test_basic_segmentation_solver.save_top_k_result:202-256)."""
        from cooperative_training_and_latent_space_data_augmentation_tpu.utils.save import (
            save_testing_images_results,
        )

        chosen = self.worst_k(k) if worst else self.top_k(k)
        tag = "worst" if worst else "top"
        paths = []
        for rank, rec in enumerate(chosen):
            name = f"{tag}_{rank}_{rec['pid']}_dice_{rec['dice']:.3f}"
            paths.append(save_testing_images_results(
                rec["image"][:, :, :, 0], rec["gt"], rec["pred"],
                save_dir, name, max_slices=5))
        return paths


def evaluate_methods_across_cvals(
        make_predict_fn: Callable,
        dataset_builder: Callable,
        methods: Sequence[str],
        cvals: Sequence[int],
        save_dir: Optional[str] = None,
        crop_size: Tuple[int, int] = (192, 192),
        num_classes: int = 4,
        metrics_list: Sequence[str] = ("Dice",)):
    """The reference's full results loop
    (test_ACDC_triplet_segmentation.py:115-158): methods x cvals x datasets.

    ``make_predict_fn(method, cval)`` returns a volume predict function (or
    None to skip, e.g. missing checkpoint — the reference prints-and-
    continues, :137-139); ``dataset_builder(cval)`` returns the
    {name: dataset} registry for that fold (the ACDC test split depends on
    cval only through the data-setting policy; corruption/MM sets do not).

    Returns ``(per_run, aggregated_df)``: per_run maps (method, cval,
    dataset) -> summary dict (each run also writes its own summary/detail
    CSVs under {save_dir}/{method}/cv{cval}/{dataset}/), and aggregated_df
    is the tidy mean±std table across cvals per (dataset, method, metric) —
    the reference's aggregated pandas frame, plus cross-cval dispersion.
    """
    per_run: Dict[Tuple[str, int, str], Dict] = {}
    for cval in cvals:
        predicts = {}
        for method in methods:
            fn = make_predict_fn(method, cval)
            if fn is None:
                print(f"{method}: cval {cval} unavailable, skipped")
                continue
            predicts[method] = fn
        if not predicts:
            continue
        datasets = dataset_builder(cval)
        for method, predict_fn in predicts.items():
            sub = join(save_dir, method, f"cv{cval}") if save_dir else None
            results = evaluate_cross_domain(
                predict_fn, datasets, save_dir=sub, crop_size=crop_size,
                num_classes=num_classes, metrics_list=metrics_list)
            for ds_name, summary in results.items():
                per_run[(method, cval, ds_name)] = summary
    aggregated = aggregate_across_cvals(per_run)
    if save_dir is not None and aggregated is not None:
        os.makedirs(save_dir, exist_ok=True)
        aggregated.to_csv(join(save_dir, "aggregated.csv"), index=False)
    return per_run, aggregated


def aggregate_across_cvals(per_run: Dict[Tuple[str, int, str], Dict]):
    """Aggregate {(method, cval, dataset) -> summary} into the tidy
    mean±std-across-cvals table (one row per dataset x method x metric)."""
    import pandas as pd

    rows = []
    for (method, cval, ds_name), summary in per_run.items():
        for key, value in summary.items():
            if key.endswith("_mean"):
                rows.append({"dataset": ds_name, "method": method,
                             "cval": cval, "metric": key[:-len("_mean")],
                             "value": value})
    if not rows:
        return None
    df = pd.DataFrame(rows)
    agg = (df.groupby(["dataset", "method", "metric"])["value"]
           .agg(mean="mean", std="std", n_cvals="count").reset_index())
    return agg


def evaluate_cross_domain(predict_fn: Callable, datasets: Dict[str, object],
                          save_dir: Optional[str] = None,
                          crop_size: Tuple[int, int] = (192, 192),
                          num_classes: int = 4,
                          metrics_list: Sequence[str] = ("Dice",)) -> Dict[str, Dict]:
    """Per-dataset evaluation loop (test_ACDC_triplet_segmentation.py:80-158):
    {dataset_name: summary_dict}; CSVs per dataset under save_dir."""
    results = {}
    for name, dataset in datasets.items():
        sub_dir = join(save_dir, name) if save_dir else None
        if sub_dir:
            os.makedirs(sub_dir, exist_ok=True)
        tester = TestSegmentationNetwork(
            dataset, predict_fn, crop_size=crop_size, num_classes=num_classes,
            metrics_list=metrics_list, save_path=sub_dir)
        results[name] = tester.run()
        print(f"[{name}] " + " ".join(
            f"{k}={v:.4f}" for k, v in results[name].items() if k.endswith("_mean")))
    return results
