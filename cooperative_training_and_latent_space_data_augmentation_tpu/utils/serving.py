"""Serving export: freeze a trained predictor into a portable StableHLO
artifact.

The reference deploys by shipping python + torch + the checkpoint directory
and re-instantiating ``AdvancedTripletReconSegmentationModel`` at inference
time (test_ACDC_triplet_segmentation.py:126-142).  The TPU-native serving
story is ahead-of-time export instead: ``jax.export`` lowers the full
FTN + (n_iter-1)-STN-refinement predict function — with the trained
params/batch_stats BAKED IN as constants — to a versioned StableHLO blob
that any later process (or a C++ PJRT serving binary) can deserialize and
run WITHOUT the model code, on any exported platform.

* The batch dimension is exported symbolically (``b``), so one artifact
  serves any batch size with static-shape XLA compilation per size.
* ``platforms`` defaults to both ``cpu`` and ``tpu`` so the same artifact
  runs on a TPU serving cell and on CPU fallback hosts.
* Round-trip numerics are covered by ``tests/test_serving.py``.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

MAGIC_SUFFIX = ".stablehlo"


def export_predictor(solver, params, batch_stats, path: str,
                     input_hw: Tuple[int, int] = (192, 192),
                     image_ch: int = 1,
                     n_iter: Optional[int] = None,
                     softmax: bool = True,
                     platforms: Optional[Sequence[str]] = ("cpu", "tpu"),
                     ) -> str:
    """Export ``solver.predict`` (params baked in) to ``path``.

    Returns the written file path (``path`` gains ``.stablehlo`` if it has
    no extension).  The exported callable takes ONE argument: an
    ``(b, H, W, C)`` float32 image batch in [0, 1] — the same contract as
    ``CooperativeTripletSolver.predict`` — and returns ``(b, H, W,
    num_classes)`` probabilities (``softmax=True``) or logits.
    """
    params = jax.device_get(params)
    batch_stats = jax.device_get(batch_stats)

    def fn(x):
        return solver.predict(params, batch_stats, x,
                              n_iter=n_iter, softmax=softmax)

    (b,) = jax_export.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, input_hw[0], input_hw[1], image_ch),
                                jnp.float32)
    exported = jax_export.export(jax.jit(fn), platforms=list(platforms)
                                 if platforms else None)(spec)
    blob = exported.serialize()
    if not os.path.splitext(path)[1]:
        path = path + MAGIC_SUFFIX
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_predictor(path: str):
    """Deserialize an exported predictor; returns a callable
    ``fn(images) -> probs`` (jit-compatible, shape-polymorphic in batch)."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(bytearray(f.read()))

    def fn(x):
        return exported.call(jnp.asarray(x, jnp.float32))

    return fn
