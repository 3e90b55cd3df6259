"""Gradient chaos-amplification diagnostic for equivalence tolerances.

Measures how far the SEQUENTIAL cooperative step's gradients move under a
1e-7 relative (ulp-scale) input perturbation — the intrinsic float32
noise floor any reformulated-but-exact step (fused STN / fused FTN) must
be compared against.  Round-5 result on the 8-virtual-device CPU mesh:

    max grad movement = 1.03e-2 abs = 2.3e-3 of the global grad max
    (code_decoupler BatchNorm bias leaf: 1.07e-3 abs)

while the fused-FTN-vs-sequential diff observed at the same batch/seed is
2.85e-4 abs = 6e-5 of grad max — 36x below the chaos floor.  This
calibrates the gradient atol in
tests/test_cooperative.py::test_fused_ftn_step_matches_sequential.

No reference counterpart (tolerance-calibration harness; the reference
has no equivalence tests at all).  Run:
    JAX_PLATFORMS=cpu python cli/diag_grad_chaos.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import conftest  # noqa: F401  (forces the 8-virtual-device CPU mesh config)
import jax
import numpy as np
import optax

from tests.test_cooperative import _batch
from cooperative_training_and_latent_space_data_augmentation_tpu.train.cooperative import (
    CooperativeTripletSolver,
    LatentDAConfig,
)


def main():
    latent_da = LatentDAConfig(mask_scope=("image code", "shape code"))
    solver = CooperativeTripletSolver(num_classes=4, image_ch=1,
                                      input_hw=(32, 32))
    solver.tx = optax.sgd(1.0)
    state0 = solver.init_state(jax.random.PRNGKey(3))
    step = solver.make_train_step(latent_da=latent_da, donate=False,
                                  separate_training=False, fused_ftn=False)
    base = _batch(n=4, seed=7)
    grads = {}
    for tag, eps in (("base", 0.0), ("ulp", 1e-7)):
        b = dict(base)
        b["image"] = b["image"] * (1.0 + eps)
        st, m = step(state0, b, jax.random.PRNGKey(11))
        grads[tag] = jax.tree.map(lambda a, c: np.asarray(a - c),
                                  state0.params, st.params)
        print(tag, "loss", float(m["loss/total"]))

    flat0 = jax.tree_util.tree_flatten_with_path(grads["base"])[0]
    flat1 = jax.tree.leaves(grads["ulp"])
    rows = []
    for (path, a), b in zip(flat0, flat1):
        rows.append((float(np.max(np.abs(a - b))),
                     float(np.max(np.abs(a))),
                     "/".join(str(getattr(k, "key", "")) for k in path)))
    rows.sort(reverse=True)
    gmax = max(r[1] for r in rows)
    print(f"grad max          : {gmax:.3e}")
    print(f"chaos floor (abs) : {rows[0][0]:.3e}  "
          f"({rows[0][0] / gmax:.1e} of grad max)  at {rows[0][2]}")
    for d, s, p in rows[:6]:
        print(f"  maxdiff={d:.3e} leafmax={s:.3e} {p}")


if __name__ == "__main__":
    main()
