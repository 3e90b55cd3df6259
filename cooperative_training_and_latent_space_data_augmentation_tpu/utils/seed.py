"""Seeding (basic_operations.set_seed:22-34, minus the torch/cudnn toggles —
JAX randomness is already explicit via threaded PRNG keys)."""

from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int = 42) -> int:
    random.seed(seed)
    np.random.seed(seed)
    return seed
