"""Result-saving utilities: PNG segmentation grids, npy/nrrd dumps.

Re-design of ``medseg/common_utils/save.py`` — the pieces the train/test
drivers use: save_testing_images_results (grid PNG of input/GT/pred,
:286-325), save_nrrd_to_disk (:351-374), misc npy savers.
"""

from __future__ import annotations

import os
from os.path import join
from typing import Optional

import numpy as np


def save_testing_images_results(images, gts, predicts, save_dir: str,
                                epoch_iter, max_slices: int = 10,
                                file_name: str = "Seg_plots.png") -> Optional[str]:
    """Grid PNG: rows = input / GT / prediction (save.py:286-325).

    ``images``: (N, H, W) floats; ``gts``/``predicts``: (N, H, W) ints.
    """
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    images = np.asarray(images)
    gts = np.asarray(gts)
    predicts = np.asarray(predicts)
    n = min(max_slices, images.shape[0])
    if n == 0:
        return None
    out_dir = join(save_dir, str(epoch_iter))
    os.makedirs(out_dir, exist_ok=True)
    fig, axes = plt.subplots(3, n, figsize=(2 * n, 6), squeeze=False)
    for i in range(n):
        axes[0][i].imshow(images[i], cmap="gray")
        axes[1][i].imshow(gts[i], vmin=0, vmax=max(gts.max(), 1))
        axes[2][i].imshow(predicts[i], vmin=0, vmax=max(gts.max(), 1))
        for r in range(3):
            axes[r][i].axis("off")
    axes[0][0].set_title("image")
    axes[1][0].set_title("GT")
    axes[2][0].set_title("pred")
    path = join(out_dir, file_name)
    fig.savefig(path, bbox_inches="tight", dpi=80)
    plt.close(fig)
    return path


def save_npy(array, save_dir: str, name: str) -> str:
    os.makedirs(save_dir, exist_ok=True)
    path = join(save_dir, name if name.endswith(".npy") else name + ".npy")
    np.save(path, np.asarray(array))
    return path


def save_nrrd_to_disk(save_dir: str, name: str, array_zyx,
                      spacing=(1.0, 1.0, 1.0)) -> str:
    from cooperative_training_and_latent_space_data_augmentation_tpu.data.nifti import (
        write_nrrd,
    )

    os.makedirs(save_dir, exist_ok=True)
    path = join(save_dir, name if name.endswith(".nrrd") else name + ".nrrd")
    write_nrrd(path, np.asarray(array_zyx), spacing)
    return path
