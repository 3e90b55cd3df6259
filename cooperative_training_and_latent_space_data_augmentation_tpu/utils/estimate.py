"""Model introspection: size estimation and intermediate-feature capture.

TPU-native equivalents of the reference's ad-hoc profiling tools:

  * ``SizeEstimator`` (medseg/models/model_util.py:454-530) — estimates
    parameter/activation memory by hook-walking a torch module.  Here the
    same questions are answered functionally: parameter bytes from the
    params pytree, activation/workspace bytes from XLA's own compiled
    memory analysis (exact, not an estimate).
  * ``HookBasedFeatureExtractor`` (model_util.py:674-727) — captures a
    layer's input/output via forward hooks.  Flax equivalent:
    ``capture_intermediates``, which records every submodule's outputs in
    one pass with no hook bookkeeping.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def count_params(params) -> int:
    """Total parameter count of a pytree."""
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def param_bytes(params) -> int:
    """Total parameter bytes of a pytree."""
    return sum(int(np.prod(p.shape)) * jnp.dtype(p.dtype).itemsize
               for p in jax.tree_util.tree_leaves(params))


def estimate_size(fn: Callable, *example_args) -> Dict[str, float]:
    """Memory analysis of ``jit(fn)(*example_args)`` from the compiled
    executable (replaces SizeEstimator's hand-walked activation estimate
    with XLA ground truth).

    Returns MB figures: ``params_mb`` (argument bytes), ``output_mb``,
    ``temp_mb`` (activation workspace), ``total_mb``.
    """
    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    try:
        analysis = compiled.memory_analysis()
        return {
            "params_mb": analysis.argument_size_in_bytes / 2**20,
            "output_mb": analysis.output_size_in_bytes / 2**20,
            "temp_mb": analysis.temp_size_in_bytes / 2**20,
            "total_mb": (analysis.argument_size_in_bytes
                         + analysis.output_size_in_bytes
                         + analysis.temp_size_in_bytes) / 2**20,
        }
    except Exception:  # pragma: no cover - backend without memory analysis
        flat = jax.tree_util.tree_leaves(example_args)
        arg_bytes = sum(int(np.prod(np.shape(a))) * jnp.dtype(
            getattr(a, "dtype", jnp.float32)).itemsize for a in flat)
        return {"params_mb": arg_bytes / 2**20, "output_mb": float("nan"),
                "temp_mb": float("nan"), "total_mb": float("nan")}


def extract_features(module, variables, x, layer_filter: Optional[str] = None,
                     train: bool = False, rng=None) -> Tuple[Any, Dict[str, Any]]:
    """Run ``module`` capturing every submodule's output
    (HookBasedFeatureExtractor, model_util.py:674-727).

    ``layer_filter``: substring to select layers (e.g. 'ResConvDown_3');
    None captures everything.  Returns (output, {layer_path: activation}).
    """
    filter_fn = (lambda mdl, method: True) if layer_filter is None else (
        lambda mdl, method: layer_filter in mdl.path[-1] if mdl.path else False)
    rngs = None
    if train:
        # modules with nn.Dropout need a 'dropout' PRNG in train mode
        rngs = {"dropout": rng if rng is not None else jax.random.PRNGKey(0)}
    out, state = module.apply(
        variables, x, train=train, mutable=["intermediates", "batch_stats"],
        capture_intermediates=filter_fn, rngs=rngs)
    inter = state.get("intermediates", {})

    flat: Dict[str, Any] = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        else:
            flat[prefix] = node[0] if isinstance(node, tuple) and len(node) == 1 else node

    walk(inter, "")
    return out, flat
