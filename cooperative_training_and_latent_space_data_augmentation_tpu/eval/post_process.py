"""Segmentation post-processing.

TPU-note: these run host-side on final predictions (numpy), exactly like
the reference (medseg/common_utils/post_process.py:5-22) — connected-
component labeling is inherently sequential/data-dependent and is not worth
forcing through XLA for a per-volume eval step.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage


def keep_largest_connected_components(mask: np.ndarray, n_classes: int) -> np.ndarray:
    """Keep only the largest 4-connected component of each foreground class
    (post_process.keep_largest_connected_components:5-22)."""
    out = np.zeros(mask.shape, dtype=np.uint8)
    structure = ndimage.generate_binary_structure(mask.ndim, 1)  # connectivity=1
    for cls in range(1, n_classes):
        binary = mask == cls
        labels, n = ndimage.label(binary, structure=structure)
        if n == 0:
            continue
        sizes = ndimage.sum_labels(binary, labels, index=np.arange(1, n + 1))
        largest = 1 + int(np.argmax(sizes))
        out[labels == largest] = cls
    return out
