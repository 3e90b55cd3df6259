"""Materialize a synthetic ACDC-layout NRRD tree of cardiac phantoms.

Writes ``{out_root}/{pid}/{frame}_{img,seg}.nrrd`` for the requested patient
ids (default: every id the ACDC split policies reference), with phantom
volumes drawn from the SAME generator as the synthetic training dataset
(data/synthetic.make_phantom) but under a held-out, pid-derived seed stream
— so models trained with ``cli/train.py --synthetic`` can be evaluated
patient-wise through the REAL file-based pipeline: this tree feeds
``cli/test.py --acdc_root`` and ``cli/generate_acdc_c.py --acdc_root``
(whose output feeds ``--acdc_c_root``), exercising NRRD IO, the split
policies, volume chunking, spacing-aware metrics, and the corruption
generator end-to-end without the (license-gated) real ACDC data.

Usage:
    python cli/make_synthetic_acdc.py --out_root /tmp/synthetic_ACDC
"""

from __future__ import annotations

import argparse
import os
import sys
import zlib
from os.path import join

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cooperative_training_and_latent_space_data_augmentation_tpu.data.nifti import (  # noqa: E402
    write_nrrd,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.data.splits import (  # noqa: E402
    TEST_LIST,
    get_ACDC_split_policy,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.data.synthetic import (  # noqa: E402
    make_phantom,
)

SPACING = (1.36719, 1.36719, 10.0)


def write_patient(out_root: str, pid: str, frame: str, n_slices: int,
                  hw, num_classes: int) -> None:
    imgs, lbls = [], []
    for s in range(n_slices):
        # held-out stream: disjoint from SyntheticSegDataset's
        # seed*100003+index keys by construction (crc32 tag)
        tag = f"synthetic_acdc/{pid}/{frame}/{s}".encode()
        rng = np.random.RandomState(zlib.crc32(tag) & 0x7FFFFFFF)
        img, lbl = make_phantom(rng, tuple(hw), num_classes)
        imgs.append(img[..., 0])
        lbls.append(lbl)
    pdir = join(out_root, pid)
    os.makedirs(pdir, exist_ok=True)
    write_nrrd(join(pdir, f"{frame}_img.nrrd"),
               np.stack(imgs).astype(np.float32), spacing=SPACING)
    write_nrrd(join(pdir, f"{frame}_seg.nrrd"),
               np.stack(lbls).astype(np.int16), spacing=SPACING)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--out_root", type=str, required=True)
    p.add_argument("--pids", nargs="+", default=None,
                   help="patient ids (default: every id the ACDC split "
                        "policies reference for data_setting=10, cvals 0-2 — "
                        "so cli/validate_dataset.py reaches GO on the tree; "
                        "pass explicit ids, e.g. the test list, to narrow)")
    p.add_argument("--frames", nargs="+", default=["ED", "ES"])
    p.add_argument("--n_slices", type=int, default=10)
    p.add_argument("--hw", nargs=2, type=int, default=[224, 224])
    p.add_argument("--num_classes", type=int, default=4)
    args = p.parse_args()

    if args.pids:
        pids = args.pids
    else:
        # every pid any split policy references (patient content is
        # pid-derived, so regenerating a subset never changes other pids)
        need = set(TEST_LIST)
        for cval in (0, 1, 2):
            for ids in get_ACDC_split_policy("10", cval).values():
                if isinstance(ids, (list, tuple)):
                    need.update(ids)
        pids = sorted(need)
    for pid in pids:
        for frame in args.frames:
            write_patient(args.out_root, pid, frame, args.n_slices, args.hw,
                          args.num_classes)
    print(f"wrote {len(pids)} patients x {args.frames} -> {args.out_root}")


if __name__ == "__main__":
    main()
