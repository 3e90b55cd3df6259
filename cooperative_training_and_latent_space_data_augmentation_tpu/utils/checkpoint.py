"""Orbax checkpointing of the whole train state (SURVEY §5 checkpoint/resume).

Complements the reference-parity formats in the solvers (per-submodule
msgpack files mirroring the per-module ``.pth`` layout, and monolithic
``.pkl`` crash snapshots) with the TPU-native production format: an orbax
checkpoint of the single train-state pytree ({params x5, batch_stats x5,
opt_state, step}), which restores correctly under any device/sharding
topology.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _manager(directory: str, max_to_keep: Optional[int] = 3):
    import orbax.checkpoint as ocp

    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


def save_checkpoint(directory: str, state: Any, step: int,
                    max_to_keep: Optional[int] = 3, wait: bool = True) -> None:
    """Save ``state`` (any pytree) at ``step`` under ``directory``."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    if wait:
        mgr.wait_until_finished()
    mgr.close()


def restore_checkpoint(directory: str, target: Any,
                       step: Optional[int] = None) -> Any:
    """Restore into the structure of ``target`` (a template pytree, e.g. a
    freshly initialized TrainState).  ``step=None`` -> latest."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory, None)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    restored = mgr.restore(step, args=ocp.args.StandardRestore(target))
    mgr.close()
    return restored


def latest_step(directory: str) -> Optional[int]:
    mgr = _manager(directory, None)
    step = mgr.latest_step()
    mgr.close()
    return step
