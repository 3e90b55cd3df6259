"""Functional train state: the 5-subnetwork pytree.

Replaces the reference's module-dict + 5 per-module Adam optimizers
(advanced_triplet_recon_segmentation_model.py:140-145,774-781) with ONE
pytree.  Adam is per-parameter, so a single optax.adam over the combined
tree is numerically identical to five independent Adams at the same lr.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar

    def replace_step(self, step):
        return self.replace(step=jnp.asarray(step, jnp.int32))
