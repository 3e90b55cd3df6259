"""Offline ACDC preprocessing driver.

Re-design of ``medseg/dataset_loader/acdc_preprocess.py`` (:16-149) as a
one-command CLI: for every raw ACDC patient dir (``patient001/Info.cfg`` +
``patient001_frame{XX}.nii.gz``), per ED/ES frame it

  1. 2-98-percentile min-max normalizes intensities to [0, 1]
     (normalize_minmax_data, acdc_preprocess.py:16-36),
  2. resamples in-plane to 1.36719 mm keeping the z spacing
     (resample_np_array, :83-91,127-133),
  3. swaps the RV<->LV labels 3<->1 (:135-137), and
  4. writes ``{out_root}/{pid}/{frame}_{img,seg}.nrrd`` with the corrected
     spacing (:139-149) — the layout ``data/acdc.py`` scans at train time.

Pure numpy/scipy (no SimpleITK in this image; see data/nifti.py).

Usage:
    python cli/preprocess.py --raw_root /data/ACDC_raw --out_root /data/ACDC
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cooperative_training_and_latent_space_data_augmentation_tpu.data.preprocess import (
    DEFAULT_TARGET_SPACING,
    preprocess_acdc_dataset,
)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--raw_root", type=str, required=True,
                   help="raw ACDC root (patientXXX dirs with Info.cfg)")
    p.add_argument("--out_root", type=str, required=True,
                   help="output root (per-patient NRRD dirs)")
    p.add_argument("--frames", nargs="+", default=["ED", "ES"])
    p.add_argument("--target_spacing", nargs=3, type=float,
                   default=list(DEFAULT_TARGET_SPACING),
                   help="x y z target spacing; z<=0 keeps the source z")
    args = p.parse_args()

    count = preprocess_acdc_dataset(args.raw_root, args.out_root,
                                    frames=tuple(args.frames),
                                    target_spacing=tuple(args.target_spacing))
    print(f"preprocessed {count} frames -> {args.out_root}")


if __name__ == "__main__":
    main()
