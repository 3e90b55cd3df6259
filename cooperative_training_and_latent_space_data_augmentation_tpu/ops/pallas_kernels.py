"""Pallas TPU kernels (SURVEY C22).

The reference has zero native kernels (pure PyTorch); the TPU-native
equivalents here fuse the framework's novel ops where XLA's generic lowering
is wasteful.

``fused_percentile_mask`` — the heart of targeted latent masking
(medseg/models/model_util.py:230-244,292-306): given a saliency matrix
(N, D), mask every element strictly greater than the value at index
``int(D * p)`` of the row's descending sort.  XLA lowers the reference
formulation as a full per-row sort + gather; this kernel instead uses the
rank identity

    sal_e > sorted_desc[idx]  <=>  count_j(sal_j >= sal_e) <= idx

(valid including ties: elements *equal* to the threshold value stay
unmasked, exactly like the reference's strict ``>``), which is a pairwise
compare + row reduce on the VPU — no sort, no gather, one fused pass with
the soft-value select (``0.5 * U(0,1)`` on masked elements,
model_util.py:237-244).  The uniforms come in as an operand so the random
stream is identical to the portable jnp path (and testable in interpret
mode, where the on-core PRNG is unavailable).

Latent saliencies are tiny (N<=batch, D<=256), so the whole problem lives
in VMEM as a single block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mask_kernel(idx_ref, sal_ref, soft_ref, mask_ref):
    """mask[n, e] = masked(e)? soft_vals[n, e] : 1."""
    sal = sal_ref[:]                                   # (N, D)
    idx = idx_ref[0]                                   # int32: int(D * p)
    # rank_e = #{j : sal_j >= sal_e} per row, via pairwise compare.
    # (N, 1, D) >= (N, D, 1) -> (N, D, D); sum over j (last axis).
    ge = (sal[:, None, :] >= sal[:, :, None]).astype(jnp.float32)
    rank = jnp.sum(ge, axis=-1)                        # (N, D)
    exceed = rank <= idx.astype(jnp.float32)           # strictly above threshold value
    mask_ref[:] = jnp.where(exceed, soft_ref[:], jnp.ones_like(sal))


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_percentile_mask(saliency, percentile, soft_vals,
                          interpret: bool = False):
    """Percentile-threshold mask over per-row saliency.

    Args:
      saliency: (N, D) float32 — per-channel or per-location mean gradients.
      percentile: scalar p in [0, 1]; threshold index = int(D * p)
        (model_util.py:230-236 semantics).
      soft_vals: (N, D) values written at masked positions — ``0.5*U(0,1)``
        for soft masking, zeros for hard masking.

    Returns: (N, D) float32 mask to multiply into the latent code.
    """
    n, d = saliency.shape
    idx = jnp.clip(jnp.floor(d * percentile).astype(jnp.int32), 0, d - 1)
    return pl.pallas_call(
        _mask_kernel,
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # idx
            pl.BlockSpec(memory_space=pltpu.VMEM),   # saliency
            pl.BlockSpec(memory_space=pltpu.VMEM),   # soft values
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idx.reshape(1), saliency.astype(jnp.float32),
      soft_vals.astype(jnp.float32))
