"""Cross-domain evaluation CLI.

Mirrors ``medseg/test_ACDC_triplet_segmentation.py`` (:80-158): loads a
trained cooperative model per cval, evaluates patient-wise Dice (optionally
HD/ASD) on {ACDC test, M&Ms, ACDC-C RandomBias/RandomSpike/RandomGhosting/
RandomMotion}, and writes summary/detailed CSVs per dataset.

Usage:
    python cli/test.py --checkpoint saved/.../model/best/checkpoints \
        --acdc_root /data/ACDC --mm_root /data/MM --acdc_c_root /data/ACDC-C \
        --cval 0 --n_iter 2 --save_dir results/
    python cli/test.py --synthetic --checkpoint ...   # smoke without data
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
)
from cooperative_training_and_latent_space_data_augmentation_tpu.train.cooperative import (
    CooperativeTripletSolver,
)

CORRUPTION_NAMES = ("RandomBias", "RandomSpike", "RandomGhosting", "RandomMotion")


def parse_args():
    p = argparse.ArgumentParser("cross-domain segmentation evaluation (TPU)")
    p.add_argument("--checkpoint", type=str, required=False, default=None)
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


def build_datasets(args):
    datasets = {}
    if args.synthetic:
        datasets["synthetic"] = SyntheticSegDataset(length=10)
        return datasets
    if args.acdc_root:
        per_frame = [CardiacACDCDataset(
            root_dir=args.acdc_root, frame=f, split="test",
            data_setting=args.data_setting, cval=args.cval)
            for f in args.frames]
        datasets["ACDC"] = ConcatDataset(per_frame)
    if args.mm_root:
        per_frame = [CardiacMMDataset(root_dir=args.mm_root, frame=f)
                     for f in args.frames]
        datasets["MM"] = ConcatDataset(per_frame)
    if args.acdc_c_root:
        for name in CORRUPTION_NAMES:
            root = os.path.join(args.acdc_c_root, name)
            if os.path.isdir(root):
                # ACDC-C volumes are NRRD ({attack}/{pid}_{seed}/{frame}_img.nrrd,
                # written by cli/generate_acdc_c.py mirroring
                # generate_artefacted_data.py:66-110) and already preprocessed —
                # no resample/normalize on load.
                per_frame = []
                for f in args.frames:
                    ds = CardiacMMDataset(
                        root_dir=root, frame=f, dataset_name=name,
                        image_format_name="{p_id}/{frame}_img.nrrd",
                        label_format_name="{p_id}/{frame}_seg.nrrd",
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
    state = solver.init_state(jax.random.PRNGKey(0))
    if args.checkpoint:
        state = solver.load_model(state, args.checkpoint)
    predict = solver.make_predict(n_iter=args.n_iter)

    def predict_fn(images):
        return predict(state.params, state.batch_stats, images)

    datasets = build_datasets(args)
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
