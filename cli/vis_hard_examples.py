"""Hard-example visualization CLI.

Script equivalent of the reference's acceptance demo notebook
(``visualization/vis_hard_example.ipynb`` cells 0-13): load a trained
cooperative model (or use fresh weights with --random_init), extract
z_i/z_s on a batch, run every latent-masking method x threshold, and save
PNG grids of the self-generated corrupted images / segmentations plus
entropy maps.

Usage:
    python cli/vis_hard_examples.py --checkpoint saved/.../model/best/checkpoints \
        --out_dir vis_out                      # with real weights
    python cli/vis_hard_examples.py --random_init --out_dir vis_out  # smoke
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
import numpy as np

from cooperative_training_and_latent_space_data_augmentation_tpu.analysis.visualize import (
    visualize_hard_examples,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.data.synthetic import (
    SyntheticSegDataset,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.train.cooperative import (
    CooperativeTripletSolver,
)


def parse_args():
    p = argparse.ArgumentParser("hard-example visualization")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--network_type", type=str, default="FCN_16_standard")
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--thresholds", nargs="+", type=float, default=[0.25, 0.5])
    p.add_argument("--methods", nargs="+",
                   default=["dropout", "channel", "spatial"],
                   choices=["dropout", "channel", "spatial"])
    p.add_argument("--n_samples", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    if not args.checkpoint and not args.random_init:
        raise SystemExit("pass --checkpoint DIR or --random_init")
    solver = CooperativeTripletSolver(network_type=args.network_type,
                                      num_classes=args.num_classes)
    state = solver.init_state(jax.random.PRNGKey(args.seed))
    if args.checkpoint:
        state = solver.load_model(state, args.checkpoint)

    ds = SyntheticSegDataset(length=args.n_samples, pad_size=(224, 224),
                             num_classes=args.num_classes, seed=args.seed)
    from cooperative_training_and_latent_space_data_augmentation_tpu.data.loader import (
        collate,
    )
    from cooperative_training_and_latent_space_data_augmentation_tpu.ops.augment import (
        make_batch_eval_transform,
    )

    raw = collate(ds, np.arange(args.n_samples))
    transform = make_batch_eval_transform((224, 224), (192, 192))
    images, labels = transform(raw["image"], raw["label"])
    paths = visualize_hard_examples(
        solver, state, images, labels, args.out_dir,
        thresholds=tuple(args.thresholds), methods=tuple(args.methods),
        rng=jax.random.PRNGKey(args.seed + 1))
    print(f"wrote {len(paths)} grids under {args.out_dir}")


if __name__ == "__main__":
    main()
