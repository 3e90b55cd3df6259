"""Serving export CLI: checkpoint -> portable StableHLO predictor artifact.

The reference serves by re-instantiating the torch model from per-module
.pth files inside a python process (test_ACDC_triplet_segmentation.py:
126-142).  This driver instead freezes the trained FTN + (n_iter-1)-STN
predictor into ONE ahead-of-time-lowered StableHLO file (params baked in,
batch-size-polymorphic, cpu+tpu platforms) via jax.export — deployable
without the model code (utils/serving.py).

Usage:
    python cli/export.py --checkpoint saved/.../model/best/checkpoints \
        --out serving/predictor.stablehlo --n_iter 2
    # later / elsewhere:
    #   from ...utils.serving import load_predictor
    #   probs = load_predictor("serving/predictor.stablehlo")(images)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# XLA-CPU space-to-batch pass workaround (see bench.py / __graft_entry__.py)
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    _flags = os.environ.get("XLA_FLAGS", "")
    if "space-to-batch-converter" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_disable_hlo_passes=space-to-batch-converter").strip()

from cooperative_training_and_latent_space_data_augmentation_tpu.utils.cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

import jax  # noqa: E402

from cooperative_training_and_latent_space_data_augmentation_tpu.train.cooperative import (  # noqa: E402
    CooperativeTripletSolver,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.utils.serving import (  # noqa: E402
    export_predictor,
    load_predictor,
)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--checkpoint", type=str, default=None,
                   help="per-module msgpack checkpoint dir (as written by "
                        "save_model / loaded by cli/test.py); omit for "
                        "random-init export (smoke)")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--network_type", type=str, default="FCN_16_standard")
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--image_ch", type=int, default=1)
    p.add_argument("--input_hw", nargs=2, type=int, default=[192, 192])
    p.add_argument("--n_iter", type=int, default=2,
                   help="1 = FTN only; k>=2 = FTN + (k-1) STN refinements")
    p.add_argument("--logits", action="store_true",
                   help="emit logits instead of softmax probabilities")
    p.add_argument("--platforms", nargs="+", default=["cpu", "tpu"])
    p.add_argument("--verify_batch", type=int, default=2,
                   help="smoke-call the reloaded artifact at this batch size "
                        "(0 disables)")
    args = p.parse_args()

    hw = tuple(args.input_hw)
    solver = CooperativeTripletSolver(
        network_type=args.network_type, image_ch=args.image_ch,
        num_classes=args.num_classes, input_hw=hw)
    state = solver.init_state(jax.random.PRNGKey(0))
    if args.checkpoint:
        state = solver.load_model(state, args.checkpoint)
    path = export_predictor(solver, state.params, state.batch_stats, args.out,
                            input_hw=hw, image_ch=args.image_ch,
                            n_iter=args.n_iter, softmax=not args.logits,
                            platforms=tuple(args.platforms))
    size_mb = os.path.getsize(path) / 1e6
    print(f"exported {args.network_type} n_iter={args.n_iter} "
          f"platforms={args.platforms} -> {path} ({size_mb:.1f} MB)")
    if args.verify_batch:
        served = load_predictor(path)
        x = jax.random.uniform(jax.random.PRNGKey(1),
                               (args.verify_batch, *hw, args.image_ch))
        out = served(x)
        print(f"verify: served(batch={args.verify_batch}) -> "
              f"{tuple(out.shape)} {out.dtype}")


if __name__ == "__main__":
    main()
