"""On-chip numerics check: cooperative train step with PALLAS_CONV on vs off.

The CHW-lanes kernel (ops/pallas_conv.py) is bit-exact against stock
``lax.conv`` in isolation; this drives the FULL fused cooperative train
step (losses + grads + Adam updates) both ways on the real TPU and prints
the loss trajectories side by side.  bf16 conv stacks accumulate in a
different order under the two lowerings, so agreement is expected to
reorder tolerance, not bitwise.

Usage: python cli/check_pallas_values.py [--steps 3] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cooperative_training_and_latent_space_data_augmentation_tpu.utils.cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cooperative_training_and_latent_space_data_augmentation_tpu.config import (  # noqa: E402
    LatentDAConfig,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.train.cooperative import (  # noqa: E402
    CooperativeTripletSolver,
)


def run(enabled: bool, steps: int, batch: int):
    os.environ["PALLAS_CONV"] = "1" if enabled else "0"
    solver = CooperativeTripletSolver(num_classes=4, input_hw=(192, 192),
                                      compute_dtype=jnp.bfloat16)
    state = solver.init_state(jax.random.PRNGKey(0))
    step = solver.make_train_step(latent_da=LatentDAConfig(), donate=False)
    rs = np.random.RandomState(0)
    batch_d = {
        "image": jnp.asarray(rs.rand(batch, 192, 192, 1), jnp.float32),
        "label": jnp.asarray(rs.randint(0, 4, (batch, 192, 192)), jnp.int32),
    }
    losses = []
    for i in range(steps):
        state, m = step(state, batch_d, jax.random.PRNGKey(i + 1))
        losses.append([float(m["loss/standard/total"]),
                       float(m["loss/hard/total"])])
    return losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    off = run(False, args.steps, args.batch)
    on = run(True, args.steps, args.batch)
    rel = max(abs(a - b) / max(abs(a), 1e-6)
              for ra, rb in zip(off, on) for a, b in zip(ra, rb))
    print(json.dumps({"pallas_off": off, "pallas_on": on,
                      "max_rel_diff": rel,
                      "agree_to_bf16_reorder_tol": rel < 2e-2}))


if __name__ == "__main__":
    main()
