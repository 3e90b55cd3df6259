"""ACDC-C corrupted test-set generator.

Re-design of ``medseg/dataset_loader/generate_artefacted_data.py`` (:48-110):
for each of the 20 ACDC test patients x seeds x 4 corruption models
{RandomBias, RandomSpike, RandomGhosting, RandomMotion}, crop to 192x192,
per-slice 0-1 rescale (preprocess3D, :17-35), apply the corruption ON DEVICE
(jnp FFT k-space ops, ops/corruptions.py), rescale to [0,1], then UN-CROP the
corrupted volume back to the original HxW on a zero canvas (recover_image,
common_utils/basic_operations.py:161-170) and save it as
``{attack}/{pid}_{seed}/{frame}_img.nrrd`` with the ORIGINAL full-size label
alongside as ``{frame}_label.nrrd`` (the reference symlinks the source label,
generate_artefacted_data.py:103-110) — so volumes generated here are
drop-in comparable with reference-generated ACDC-C.

The reference loads the source volumes without resampling or whole-volume
normalization (load_img_label_from_path with defaults, :70-71); only the
per-slice min-max of the 192x192 crop is applied before the attack.

Usage:
    python cli/generate_acdc_c.py --acdc_root /data/ACDC --out_root /data/ACDC-C \
        --frames ED ES --seeds 0 1 2
"""

from __future__ import annotations

import argparse
import os
import shutil
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
    _read_volume,
    probe_format_names,
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


def crop_with_offsets(vol_nhw: np.ndarray, crop: int):
    """Center crop/pad to (crop, crop) returning the reference's recover
    parameters (basic_operations.crop_or_pad:173-219): (cropped, h_s, w_s,
    post_pad_h, post_pad_w).  Padding puts the extra row/col on the
    lower-index side (torch pastes at -h_s = ceil((new-h)/2))."""
    n, h, w = vol_nhw.shape
    if h < crop:
        top = -((h - crop) // 2)
        canvas = np.zeros((n, crop, w), vol_nhw.dtype)
        canvas[:, top:top + h] = vol_nhw
        vol_nhw, h = canvas, crop
    if w < crop:
        left = -((w - crop) // 2)
        canvas = np.zeros((n, h, crop), vol_nhw.dtype)
        canvas[:, :, left:left + w] = vol_nhw
        vol_nhw, w = canvas, crop
    h_s, w_s = (h - crop) // 2, (w - crop) // 2
    return vol_nhw[:, h_s:h_s + crop, w_s:w_s + crop], h_s, w_s, h, w


def recover(vol_nhw: np.ndarray, h_s: int, w_s: int, orig_h: int, orig_w: int):
    """Paste the corrupted crop back onto a zero canvas of the original size
    (recover_image, basic_operations.py:161-170)."""
    n, h, w = vol_nhw.shape
    canvas = np.zeros((n, orig_h, orig_w), vol_nhw.dtype)
    canvas[:, h_s:h_s + h, w_s:w_s + w] = vol_nhw
    return canvas


def per_slice_minmax(vol_nhw: np.ndarray):
    """preprocess3D (generate_artefacted_data.py:17-35): per-slice min-max."""
    flat = vol_nhw.reshape(vol_nhw.shape[0], -1)
    lo = flat.min(axis=1)[:, None, None]
    hi = flat.max(axis=1)[:, None, None]
    return ((vol_nhw - lo) / (hi - lo + 1e-20)).astype(np.float32)


def parse_args():
    p = argparse.ArgumentParser("ACDC-C generator (TPU)")
    p.add_argument("--acdc_root", type=str, required=True)
    p.add_argument("--out_root", type=str, required=True)
    p.add_argument("--frames", nargs="+", default=["ED", "ES"])
    p.add_argument("--seeds", nargs="+", type=int, default=[0, 1, 2])
    p.add_argument("--attacks", nargs="+", default=list(CORRUPTIONS),
                   choices=list(CORRUPTIONS))
    p.add_argument("--crop", type=int, default=192)
    p.add_argument("--copy_labels", action="store_true",
                   help="copy the source label file instead of symlinking")
    return p.parse_args()


def main():
    args = parse_args()
    n_done = 0
    for frame in args.frames:
        # accept .nii.gz (reference download layout) or .nrrd
        # (cli/preprocess.py output) trees
        img_fmt, label_fmt = probe_format_names(args.acdc_root, frame)
        # reference parity: no resampling, no whole-volume normalization
        # before the crop (generate_artefacted_data.py:70-71 loads raw)
        ds = CardiacACDCDataset(root_dir=args.acdc_root, frame=frame,
                                split="test", data_setting="standard", cval=0,
                                image_format_name=img_fmt,
                                label_format_name=label_fmt,
                                if_resample=False, normalize=False)
        for pid in ds.patient_ids:
            if pid not in TEST_LIST:
                continue
            img_path = ds._img_path(pid)
            vol, src_spacing = _read_volume(img_path)
            vol = np.asarray(vol, np.float32)
            cropped, h_s, w_s, oh, ow = crop_with_offsets(vol, args.crop)
            cropped = per_slice_minmax(cropped)
            for attack in args.attacks:
                for seed in args.seeds:
                    # deterministic across processes (Python hash() is
                    # salted per interpreter; zlib.crc32 is stable)
                    tag = f"{attack}/{pid}/{frame}/{seed}".encode()
                    key = jax.random.PRNGKey(zlib.crc32(tag) & 0x7FFFFFFF)
                    corrupted = np.asarray(
                        corrupt_volume_jit(key, cropped, attack))
                    full = recover(corrupted, h_s, w_s, oh, ow)
                    out_dir = join(args.out_root, attack, f"{pid}_{seed}")
                    os.makedirs(out_dir, exist_ok=True)
                    write_nrrd(join(out_dir, f"{frame}_img.nrrd"),
                               full.astype(np.float32),
                               spacing=tuple(float(s) for s in src_spacing))
                    # original full-size label alongside (reference symlinks,
                    # generate_artefacted_data.py:103-110); keep the SOURCE
                    # extension so suffix-dispatching readers parse it
                    # correctly (a .nii.gz label must not be named .nrrd)
                    label_src = ds._label_path(pid)
                    label_ext = next(e for e in (".nii.gz", ".nrrd", ".nii")
                                     if label_src.endswith(e))
                    label_dst = join(out_dir, f"{frame}_label{label_ext}")
                    if os.path.islink(label_dst) or os.path.exists(label_dst):
                        os.unlink(label_dst)
                    if args.copy_labels:
                        shutil.copyfile(label_src, label_dst)
                    else:
                        os.symlink(os.path.abspath(label_src), label_dst)
            n_done += 1
            print(f"{frame} {pid}: done")
    if n_done == 0:
        raise SystemExit(
            f"no ACDC test patients found under {args.acdc_root} — expected "
            f"{{pid}}/{{frame}}_img.nii.gz|.nrrd dirs for the 20-patient test "
            f"list (data/splits.TEST_LIST)")


if __name__ == "__main__":
    main()
