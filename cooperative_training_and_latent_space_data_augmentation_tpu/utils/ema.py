"""Exponential moving average of a parameter pytree.

TPU-native re-design of ``medseg/models/model_util.ExponentialMovingAverage``
(:21-101): same surface (update / copy_to / store / restore) and the same
warm-up decay schedule ``min(decay, (1+n)/(10+n))``, but over immutable JAX
pytrees — update returns the new shadow instead of mutating tensors, and the
update itself is a jitted tree-map.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp


@jax.jit
def _ema_update(shadow, params, decay):
    return jax.tree.map(lambda s, p: s - (1.0 - decay) * (s - p), shadow, params)


class ExponentialMovingAverage:
    """Maintains an EMA of a params pytree."""

    def __init__(self, parameters, decay: float, use_num_updates: bool = True):
        if decay < 0.0 or decay > 1.0:
            raise ValueError("Decay must be between 0 and 1")
        self.decay = decay
        self.num_updates: Optional[int] = 0 if use_num_updates else None
        self.shadow_params = jax.tree.map(jnp.asarray, parameters)
        self.collected_params: Any = None

    def update(self, parameters) -> None:
        """Fold the current parameters into the shadow (call after each
        optimizer step)."""
        decay = self.decay
        if self.num_updates is not None:
            self.num_updates += 1
            decay = min(decay, (1 + self.num_updates) / (10 + self.num_updates))
        self.shadow_params = _ema_update(self.shadow_params, parameters,
                                         jnp.asarray(decay, jnp.float32))

    def copy_to(self):
        """Return the EMA parameters (functional equivalent of torch's
        in-place copy_to)."""
        return self.shadow_params

    def store(self, parameters) -> None:
        """Stash the online parameters before swapping in the EMA ones."""
        self.collected_params = parameters

    def restore(self):
        """Return the stashed online parameters (or None with a warning,
        mirroring the reference's fallback print)."""
        if self.collected_params is None:
            print("did not find any copy, use the original params")
            return None
        return self.collected_params
