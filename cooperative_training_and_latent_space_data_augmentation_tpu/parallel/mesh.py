"""Data-parallel sharding over a TPU mesh.

The reference is single-process single-GPU (SURVEY C23/C24: no DDP, no
torch.distributed anywhere); the one required TPU strategy is batch data
parallelism over ICI: batch axis sharded, parameters/optimizer state
replicated, gradient all-reduce inserted by the partitioner (psum over the
mesh) — no hand-written collectives needed at this model scale.

These helpers wrap `jax.sharding.Mesh` + `NamedSharding` so solvers stay
sharding-agnostic: `shard_train_step` re-jits a train step with explicit
in/out shardings (params replicated, batch sharded on axis 0).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """1-D data mesh over the first n (default: all) local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices).reshape(len(devices)), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard axis 0 (batch) over the mesh's data axis."""
    return NamedSharding(mesh, P(axis))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    return jax.device_put(batch, batch_sharding(mesh, axis))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicate_sharding(mesh))


def shard_train_step(step_fn, mesh: Mesh, axis: str = "data",
                     donate: bool = True):
    """Jit a (state, batch, rng) -> (state, metrics) step with DP shardings:
    state replicated, batch sharded on dim 0, metrics replicated.

    XLA inserts the gradient psum over the mesh automatically because the
    replicated params consume sharded-batch gradients.
    """
    repl = replicate_sharding(mesh)
    data = batch_sharding(mesh, axis)
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def pad_batch_to_multiple(batch, multiple: int):
    """Pad axis-0 of every array in the batch dict (by wrap-tiling) so it is
    divisible by the mesh size; returns (batch, real_count).

    Tiles the batch as many times as needed, so shortfalls larger than the
    batch itself (n < multiple) still fill exactly."""
    n = next(iter(batch.values())).shape[0]
    rem = n % multiple
    out = {k: np.asarray(v) for k, v in batch.items()}
    if rem == 0:
        return out, n
    pad = multiple - rem
    for k, v in out.items():
        idx = np.resize(np.arange(n), pad)
        out[k] = np.concatenate([v, v[idx]], axis=0)
    return out, n
