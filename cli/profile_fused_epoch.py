"""Per-batch marginal INSIDE the fused epoch scan (real TPU).

The K-epoch window measurement (RESULTS.md round 4) bounded the epoch at
1.74 s on-device, ~0.29 s above the then-current decomposition 16 x (86 ms
step + 4.5 ms augmentation) — ~18 ms/batch unaccounted.  RESOLVED: the
4.5 ms augmentation figure came from a profiler harness that closed ONE
key over the whole vmapped batch; with per-sample keys (what the shipped
pipeline does, ops/augment.py:781,801) the honest augmentation cost is
~21 ms/batch, 96 % of it the fused order-3 warp gather
(cli/profile_augment.py, saved/augment_profile.md) — and
16 x (86 + 21) ms = 1.71 s closes the window to within val+scan overhead.
This profiler cross-checks that decomposition in situ: it times the
SHIPPED ``CooperativeBatcher.fused_epoch_runner`` (the exact graph
`train/driver.py` dispatches per epoch, train...triplet.py:158-235
equivalent) with index matrices of K_LARGE vs K_SMALL batches and reports
the marginal per batch (expected ~107 ms: step + augment together).

Usage: python cli/profile_fused_epoch.py [--batch 20] [--train_length 160]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from cooperative_training_and_latent_space_data_augmentation_tpu.utils.cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402

from cooperative_training_and_latent_space_data_augmentation_tpu.config import (  # noqa: E402
    ExperimentConfig,
    LatentDAConfig,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.data.loader import (  # noqa: E402
    CooperativeBatcher,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.data.synthetic import (  # noqa: E402
    SyntheticSegDataset,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.train.cooperative import (  # noqa: E402
    CooperativeTripletSolver,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--train_length", type=int, default=160)
    ap.add_argument("--k_small", type=int, default=4)
    ap.add_argument("--k_large", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
    cfg = ExperimentConfig()

    solver = CooperativeTripletSolver(
        network_type="FCN_16_standard", image_ch=1, num_classes=4,
        input_hw=(192, 192), compute_dtype=dtype)
    state = solver.init_state(jax.random.PRNGKey(0))
    train_step = solver.make_train_step(
        latent_da=LatentDAConfig(),
        separate_training=cfg.learning.separate_training,
        input_noise_std=cfg.learning.input_noise_std)

    train_set = SyntheticSegDataset(length=args.train_length,
                                    num_classes=4, seed=40)
    batcher = CooperativeBatcher(
        train_set, batch_size=args.batch,
        policy_name=cfg.data.data_aug_policy,
        pad_hw=cfg.data.pad_hw, crop_hw=cfg.data.crop_hw,
        num_classes=4,
        keep_orig=cfg.data.keep_orig_image_label_pair_for_training,
        seed=40)
    runner = batcher.fused_epoch_runner(
        getattr(train_step, "__wrapped__", train_step), donate=False)
    img_all, lbl_all = batcher._device_dataset()
    idx_full = batcher.epoch_index_matrix()

    def timed(K, reps=3):
        idx = jnp.asarray(np.tile(idx_full, (max(1, K // len(idx_full) + 1),
                                             1))[:K])
        bk, sk = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
        # compile + first-dispatch stall, value-forced
        st, _, ms = runner(state, img_all, lbl_all, idx, bk, sk)
        _ = float(ms["loss/standard/total"][-1])
        best = float("inf")
        for _r in range(reps):
            t0 = time.perf_counter()
            st, _, ms = runner(state, img_all, lbl_all, idx, bk, sk)
            _ = float(ms["loss/standard/total"][-1])
            best = min(best, time.perf_counter() - t0)
        return best

    t_small = timed(args.k_small)
    t_large = timed(args.k_large)
    marginal = (t_large - t_small) / (args.k_large - args.k_small)
    out = {"metric": "fused-epoch per-batch marginal",
           "ms_per_batch": round(1e3 * marginal, 2),
           "k_small_s": round(t_small, 3), "k_large_s": round(t_large, 3),
           "batch": args.batch,
           "epoch_s_at_16_batches": round(16 * marginal, 3)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
