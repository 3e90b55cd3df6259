"""Cross-domain evaluation CLI.

Mirrors ``medseg/test_ACDC_triplet_segmentation.py`` (:80-158): loads a
trained cooperative model per cval, evaluates patient-wise Dice (optionally
HD/ASD) on {ACDC test, M&Ms, ACDC-C RandomBias/RandomSpike/RandomGhosting/
RandomMotion}, and writes summary/detailed CSVs per dataset.

Usage (single checkpoint):
    python cli/test.py --checkpoint saved/.../model/best/checkpoints \
        --acdc_root /data/ACDC --mm_root /data/MM --acdc_c_root /data/ACDC-C \
        --cval 0 --n_iter 2 --save_dir results/
    python cli/test.py --synthetic --checkpoint ...   # smoke without data

Usage (the reference's full results table — methods x cvals x datasets,
test_ACDC_triplet_segmentation.py:115-158 — from one command):
    python cli/test.py \
        --checkpoint_template 'saved/train_ACDC_10_n_cls_4/ACDC/{method}/{cval}/model/best/checkpoints' \
        --methods standard_training cooperative_training --cvals 0 1 2 \
        --acdc_root ... --mm_root ... --acdc_c_root ... --save_dir results/
    -> per-run CSVs under results/{method}/cv{cval}/{dataset}/ plus
       results/aggregated.csv (mean±std across cvals per dataset x method).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cooperative_training_and_latent_space_data_augmentation_tpu.utils.cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

import jax

from cooperative_training_and_latent_space_data_augmentation_tpu.data.acdc import (
    CardiacACDCDataset,
    probe_format_names,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.data.base import (
    ConcatDataset,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.data.mnm import (
    CardiacMMDataset,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.data.synthetic import (
    SyntheticSegDataset,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.eval.tester import (
    evaluate_cross_domain,
    evaluate_methods_across_cvals,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.train.cooperative import (
    CooperativeTripletSolver,
)

CORRUPTION_NAMES = ("RandomBias", "RandomSpike", "RandomGhosting", "RandomMotion")


def parse_args():
    p = argparse.ArgumentParser("cross-domain segmentation evaluation (TPU)")
    p.add_argument("--checkpoint", type=str, required=False, default=None)
    p.add_argument("--checkpoint_template", type=str, default=None,
                   help="path template with {method}/{cval} placeholders; "
                        "enables the methods x cvals aggregation loop")
    p.add_argument("--methods", nargs="+",
                   default=["standard_training", "cooperative_training"])
    p.add_argument("--cvals", nargs="+", type=int, default=[0, 1, 2])
    p.add_argument("--network_type", type=str, default="FCN_16_standard")
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--n_iter", type=int, default=2,
                   help="1: FTN only; >=2: FTN + STN refinement")
    p.add_argument("--cval", type=int, default=0)
    p.add_argument("--data_setting", type=str, default="10")
    p.add_argument("--acdc_root", type=str, default=None)
    p.add_argument("--mm_root", type=str, default=None)
    p.add_argument("--acdc_c_root", type=str, default=None,
                   help="root with {corruption}/{pid}_{seed}/ subdirs")
    p.add_argument("--frames", nargs="+", default=["ED", "ES"])
    p.add_argument("--metrics", nargs="+", default=["Dice"],
                   choices=["Dice", "HD", "ASD", "VolError", "VolSim"])
    p.add_argument("--save_dir", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    return p.parse_args()


def build_datasets(args, cval: int):
    datasets = {}
    if args.synthetic:
        datasets["synthetic"] = SyntheticSegDataset(length=10)
        return datasets
    if args.acdc_root:
        per_frame = []
        for f in args.frames:
            # accept .nii.gz (reference layout) or .nrrd (cli/preprocess.py)
            img_fmt, label_fmt = probe_format_names(args.acdc_root, f)
            per_frame.append(CardiacACDCDataset(
                root_dir=args.acdc_root, frame=f, split="test",
                data_setting=args.data_setting, cval=cval,
                image_format_name=img_fmt, label_format_name=label_fmt))
        datasets["ACDC"] = ConcatDataset(per_frame)
    if args.mm_root:
        per_frame = []
        for f in args.frames:
            img_fmt, label_fmt = probe_format_names(args.mm_root, f)
            per_frame.append(CardiacMMDataset(
                root_dir=args.mm_root, frame=f,
                image_format_name=img_fmt, label_format_name=label_fmt))
        datasets["MM"] = ConcatDataset(per_frame)
    if args.acdc_c_root:
        for name in CORRUPTION_NAMES:
            root = os.path.join(args.acdc_c_root, name)
            if os.path.isdir(root):
                # ACDC-C volumes ({attack}/{pid}_{seed}/{frame}_img.*,
                # written by cli/generate_acdc_c.py mirroring
                # generate_artefacted_data.py:66-110) are already
                # preprocessed — no resample/normalize on load.  Naming is
                # probed: the generator writes {frame}_label beside the
                # image (possibly with the SOURCE label's extension), the
                # reference's distributed download uses {frame}_seg.nii.gz.
                per_frame = []
                for f in args.frames:
                    img_fmt, label_fmt = probe_format_names(root, f)
                    ds = CardiacMMDataset(
                        root_dir=root, frame=f, dataset_name=name,
                        image_format_name=img_fmt,
                        label_format_name=label_fmt,
                        if_resample=False, normalize=False)
                    # generated ACDC-C volumes ARE at the 1.36719 mm in-plane
                    # grid (no resample on load needed); keep HD/ASD in mm,
                    # comparable with the ACDC/MM rows
                    ds.voxelspacing = [1.36719, 1.36719, -1.0]
                    per_frame.append(ds)
                datasets[name] = ConcatDataset(per_frame)
    return datasets


def main():
    args = parse_args()
    solver = CooperativeTripletSolver(
        network_type=args.network_type, num_classes=args.num_classes,
        n_iter=args.n_iter)
    base_state = solver.init_state(jax.random.PRNGKey(0))
    predict = solver.make_predict(n_iter=args.n_iter)

    if args.checkpoint_template:
        # reference full-results loop: methods x cvals x datasets with one
        # aggregated table (test_ACDC_triplet_segmentation.py:115-158)
        def make_predict_fn(method, cval):
            ckpt = args.checkpoint_template.format(method=method, cval=cval)
            if not os.path.isdir(ckpt):
                print(f"{method}:{ckpt} not found. ")  # ref prints & skips
                return None
            state = solver.load_model(base_state, ckpt)

            def fn(images, _state=state):
                return predict(_state.params, _state.batch_stats, images)

            return fn

        per_run, aggregated = evaluate_methods_across_cvals(
            make_predict_fn, lambda cval: build_datasets(args, cval),
            methods=args.methods, cvals=args.cvals, save_dir=args.save_dir,
            num_classes=args.num_classes, metrics_list=args.metrics)
        if aggregated is None:
            raise SystemExit("no (method, cval) runs were evaluated — check "
                             "--checkpoint_template and data roots")
        import pandas as pd

        with pd.option_context("display.max_rows", None):
            print(aggregated)
        return

    state = base_state
    if args.checkpoint:
        state = solver.load_model(state, args.checkpoint)

    def predict_fn(images):
        return predict(state.params, state.batch_stats, images)

    datasets = build_datasets(args, args.cval)
    if not datasets:
        raise SystemExit("no datasets specified; pass --acdc_root/--mm_root/"
                         "--acdc_c_root or --synthetic")
    results = evaluate_cross_domain(
        predict_fn, datasets, save_dir=args.save_dir,
        num_classes=args.num_classes, metrics_list=args.metrics)
    try:
        import pandas as pd

        frame = pd.DataFrame({k: {m: v for m, v in s.items() if m.endswith("_mean")}
                              for k, s in results.items()})
        print(frame.T)
    except Exception:
        print(results)


if __name__ == "__main__":
    main()
