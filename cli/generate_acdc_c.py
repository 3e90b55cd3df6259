"""ACDC-C corrupted test-set generator.

Re-design of ``medseg/dataset_loader/generate_artefacted_data.py`` (:48-110):
for each of the 20 ACDC test patients x seeds x 4 corruption models
{RandomBias, RandomSpike, RandomGhosting, RandomMotion}, crop to 192x192,
per-slice 0-1 rescale, apply the corruption ON DEVICE (jnp FFT k-space ops,
ops/corruptions.py), rescale to [0,1], and save the cropped volume as
``{attack}/{pid}_{seed}/{frame}_img.nrrd`` with a label copy alongside (the
evaluation pipeline consumes the same 192x192 crop, so no un-crop step).

Usage:
    python cli/generate_acdc_c.py --acdc_root /data/ACDC --out_root /data/ACDC-C \
        --frames ED ES --seeds 0 1 2
"""

from __future__ import annotations

import argparse
import os
import sys
from os.path import join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cooperative_training_and_latent_space_data_augmentation_tpu.utils.cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

import zlib

import jax
import numpy as np

from cooperative_training_and_latent_space_data_augmentation_tpu.data.acdc import (
    CardiacACDCDataset,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.data.nifti import (
    write_nrrd,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.data.splits import (
    TEST_LIST,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.ops.corruptions import (
    CORRUPTIONS,
    corrupt_volume_jit,
)


def parse_args():
    p = argparse.ArgumentParser("ACDC-C generator (TPU)")
    p.add_argument("--acdc_root", type=str, required=True)
    p.add_argument("--out_root", type=str, required=True)
    p.add_argument("--frames", nargs="+", default=["ED", "ES"])
    p.add_argument("--seeds", nargs="+", type=int, default=[0, 1, 2])
    p.add_argument("--attacks", nargs="+", default=list(CORRUPTIONS),
                   choices=list(CORRUPTIONS))
    p.add_argument("--crop", type=int, default=192)
    return p.parse_args()


def main():
    args = parse_args()
    for frame in args.frames:
        ds = CardiacACDCDataset(root_dir=args.acdc_root, frame=frame,
                                split="test", data_setting="standard", cval=0)
        for pid_index, pid in enumerate(ds.patient_ids):
            if pid not in TEST_LIST:
                continue
            img, lbl = ds.get_patient_data_for_testing(
                pid_index, crop_size=(args.crop, args.crop))
            vol = np.asarray(img)[..., 0]  # (N, H, W) in [0,1]
            # true z spacing from the source header (the dataset's -1 z
            # sentinel means 'unresampled'; do not bake |−1| = 1 mm into
            # the generated files)
            from cooperative_training_and_latent_space_data_augmentation_tpu.data.acdc import (
                _read_volume,
            )

            _, src_spacing = _read_volume(ds._img_path(pid))
            out_spacing = (abs(ds.voxelspacing[0]), abs(ds.voxelspacing[1]),
                           float(src_spacing[2]))
            for attack in args.attacks:
                for seed in args.seeds:
                    # deterministic across processes (Python hash() is
                    # salted per interpreter; zlib.crc32 is stable)
                    tag = f"{attack}/{pid}/{frame}/{seed}".encode()
                    key = jax.random.PRNGKey(zlib.crc32(tag) & 0x7FFFFFFF)
                    corrupted = np.asarray(corrupt_volume_jit(
                        key, vol.astype(np.float32), attack))
                    out_dir = join(args.out_root, attack, f"{pid}_{seed}")
                    os.makedirs(out_dir, exist_ok=True)
                    write_nrrd(join(out_dir, f"{frame}_img.nrrd"),
                               corrupted.astype(np.float32),
                               spacing=out_spacing)
                    write_nrrd(join(out_dir, f"{frame}_seg.nrrd"),
                               np.asarray(lbl).astype(np.int16),
                               spacing=out_spacing)
            print(f"{frame} {pid}: done")


if __name__ == "__main__":
    main()
