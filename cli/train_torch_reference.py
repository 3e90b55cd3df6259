"""Head-to-head: train the REFERENCE torch solver on the synthetic tree.

VERDICT r2 items #2 and #5.  This driver imports the reference's actual
``AdvancedTripletReconSegmentationModel`` from ``/root/reference`` (the same
import the parity tests use) and reproduces the reference training loop
(``medseg/train_adv_supervised_segmentation_triplet.py:150-237``: per-iter
optimizer resets, 0.05-N(0,1) input noise clamped to [0,1],
``standard_training`` -> ``hard_example_generation`` ->
``hard_example_training`` -> single backward -> 5 Adam steps) on the SAME
synthetic phantom datasets and augmentation pipeline as
``cli/train.py --synthetic`` — so the rebuild's quality can be compared
against reference math at equal data/budget/seeds (BASELINE.md's 0.5-pt
Dice parity criterion, previously untested).

The reference code is USED (imported), not copied; SimpleITK/medpy/skimage
(absent in this image, only needed for file IO / plotting paths) are stubbed
before import.

Modes:
    # quality run (writes best checkpoint + per-epoch IoU JSONL):
    python cli/train_torch_reference.py --max_epochs 150 --seed 40 \
        --out_dir saved/head_to_head/torch_seed40
    # timing anchor (prints one JSON line: sec/iter at batch 20):
    python cli/train_torch_reference.py --bench_iters 3
    # held-out volume Dice of a saved run:
    python cli/train_torch_reference.py --eval_only --acdc_root /tmp/synthetic_ACDC \
        --out_dir saved/head_to_head/torch_seed40
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---- force jax (used only for the shared augmentation pipeline) onto CPU.
# Unconditional: the harness exports JAX_PLATFORMS=axon globally, and this
# torch-side driver must never contend for the one TPU chip.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "space-to-batch-converter" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_disable_hlo_passes=space-to-batch-converter").strip()

# ---- stub the reference's unimportable file-IO/plotting deps, then import it
sys.path.insert(0, "/root/reference")


class _AnyAttr(types.ModuleType):
    def __getattr__(self, name):
        return None


_shim = types.ModuleType("numpy.lib.function_base")
_shim.copy = np.copy
sys.modules.setdefault("numpy.lib.function_base", _shim)
for _name in ("SimpleITK", "medpy", "medpy.metric", "medpy.metric.binary",
              "skimage", "skimage.transform", "skimage.exposure",
              "skimage.util", "cv2", "seaborn", "umap"):
    sys.modules.setdefault(_name, _AnyAttr(_name))

import torch  # noqa: E402

from medseg.models.advanced_triplet_recon_segmentation_model import (  # noqa: E402
    AdvancedTripletReconSegmentationModel,
)

from cooperative_training_and_latent_space_data_augmentation_tpu.utils.cache import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()

from cooperative_training_and_latent_space_data_augmentation_tpu.config import (  # noqa: E402
    ExperimentConfig,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.data.loader import (  # noqa: E402
    CooperativeBatcher,
    EvalBatcher,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.data.synthetic import (  # noqa: E402
    SyntheticSegDataset,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.eval.metrics import (  # noqa: E402
    RunningScore,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.utils.seed import (  # noqa: E402
    set_seed,
)

# the active latent-DA config (config/ACDC/cooperative_training.json:51-67)
IMAGE_CODE_CFG = {"loss_name": "mse", "mask_type": "random",
                  "max_threshold": 0.5, "random_threshold": True,
                  "if_soft": True, "decoder_function_name": "image_decoder"}
SHAPE_CODE_CFG = {"loss_name": "ce", "mask_type": "random",
                  "max_threshold": 0.5, "random_threshold": True,
                  "if_soft": True, "decoder_function_name": "segmentation_decoder"}


def to_nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.moveaxis(np.asarray(x_nhwc), -1, 1).copy()).float()


def build_solver(num_classes: int = 4, lr: float = 1e-4):
    return AdvancedTripletReconSegmentationModel(
        network_type="FCN_16_standard", image_ch=1, num_classes=num_classes,
        learning_rate=lr, use_gpu=False, n_iter=1)


def train_iteration(solver, clean_nchw, label, latent_da: bool = True,
                    separate_training: bool = False):
    """One reference cooperative iteration (train...py:171-237)."""
    solver.train()
    solver.reset_all_optimizers()
    noise = 0.05 * torch.randn(*clean_nchw.shape)
    noised = torch.clamp(clean_nchw + noise, 0, 1).detach().clone()
    seg_l, img_l, gt_l, shape_l = solver.standard_training(
        clean_nchw, label, perturbed_image=noised,
        separate_training=separate_training)
    standard_loss = seg_l + img_l + shape_l + gt_l
    if latent_da:
        solver.reset_all_optimizers()
        p_img, p_seg = solver.hard_example_generation(
            clean_nchw.detach().clone(), label.detach().clone(),
            gen_corrupted_seg=True, gen_corrupted_image=True,
            corrupted_image_DA_config=IMAGE_CODE_CFG,
            corrupted_seg_DA_config=SHAPE_CODE_CFG)
        h_seg, h_img, h_shape2, h_cshape = solver.hard_example_training(
            perturbed_image=p_img, perturbed_seg=p_seg,
            clean_image_l=clean_nchw, label_l=label,
            separate_training=separate_training, use_gpu=False)
        hard_loss = h_seg + h_img + h_shape2 + h_cshape
    else:
        hard_loss = torch.tensor(0.0)
    loss = standard_loss + hard_loss
    solver.reset_all_optimizers()
    loss.backward()
    solver.optimize_all_params()
    return float(standard_loss.item()), float(hard_loss.item())


@torch.no_grad()
def eval_epoch(solver, eval_batcher, num_classes: int) -> float:
    """Val Mean IoU with STN refinement n_iter=2 (train...py:63-78)."""
    solver.eval()
    running = RunningScore(num_classes)
    for batch in eval_batcher.epoch():
        real = batch.get("real_count", batch["image"].shape[0])
        x = to_nchw(np.asarray(batch["image"]))
        pred = solver.predict(x, n_iter=2)
        pred_lbl = pred.argmax(dim=1).cpu().numpy()
        running.update(np.asarray(batch["label"])[:real], pred_lbl[:real])
    score, _ = running.get_scores()
    return float(score["Mean IoU : \t"])


def make_torch_predict(solver, n_iter: int = 2):
    """NHWC-numpy -> NHWC-logits adapter for eval.tester.TestSegmentationNetwork."""

    @torch.no_grad()
    def predict(images_nhwc):
        solver.eval()
        out = solver.predict(to_nchw(np.asarray(images_nhwc)), n_iter=n_iter)
        return np.moveaxis(out.cpu().numpy(), 1, -1)

    return predict


def heldout_eval(solver, acdc_root: str, num_classes: int = 4):
    from cooperative_training_and_latent_space_data_augmentation_tpu.data.acdc import (
        CardiacACDCDataset,
        probe_format_names,
    )
    from cooperative_training_and_latent_space_data_augmentation_tpu.data.base import (
        ConcatDataset,
    )
    from cooperative_training_and_latent_space_data_augmentation_tpu.eval.tester import (
        TestSegmentationNetwork,
    )

    img_fmt, lbl_fmt = probe_format_names(acdc_root)
    sets = [CardiacACDCDataset(
        root_dir=acdc_root, frame=frame, split="test", data_setting="10",
        cval=0, pad_size=(224, 224), num_classes=num_classes, use_cache=False,
        image_format_name=img_fmt, label_format_name=lbl_fmt,
        seed=0) for frame in ("ED", "ES")]
    assert sum(len(s) for s in sets) > 0, (
        f"no test volumes found under {acdc_root}")
    tester = TestSegmentationNetwork(
        ConcatDataset(sets), make_torch_predict(solver, n_iter=2),
        num_classes=num_classes, metrics_list=("Dice",))
    summary = tester.run()
    return summary


def main():
    ap = argparse.ArgumentParser("reference torch head-to-head driver")
    ap.add_argument("--max_epochs", type=int, default=150)
    ap.add_argument("--seed", type=int, default=40)
    ap.add_argument("--batch_size", type=int, default=20)
    ap.add_argument("--out_dir", default="saved/head_to_head/torch")
    ap.add_argument("--no_latent_da", action="store_true")
    ap.add_argument("--bench_iters", type=int, default=0,
                    help="timing-anchor mode: run N iterations, print "
                         "sec/iter JSON, exit")
    ap.add_argument("--eval_only", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="continue from {out_dir}/best_model.pth (the "
                         "reference snapshot holds 5 model + 5 optimizer "
                         "states + epoch, advanced...py:680-738); the jax "
                         "augmentation key stream is re-advanced so epochs "
                         "see the same batches as an uninterrupted run")
    ap.add_argument("--acdc_root", default=None,
                    help="synthetic ACDC tree for held-out volume Dice")
    ap.add_argument("--eval_every", type=int, default=1)
    args = ap.parse_args()
    cfg = ExperimentConfig()
    set_seed(args.seed)
    torch.manual_seed(args.seed)
    os.makedirs(args.out_dir, exist_ok=True)

    solver = build_solver(num_classes=cfg.data.num_classes, lr=cfg.learning.lr)
    ckpt_path = os.path.join(args.out_dir, "best_model.pth")

    if args.eval_only:
        solver.load_snapshots(ckpt_path)
        summary = heldout_eval(solver, args.acdc_root, cfg.data.num_classes)
        print(json.dumps({"heldout": summary}))
        return

    # same datasets + augmentation as cli/train.py --synthetic
    train_set = SyntheticSegDataset(length=20, pad_size=cfg.data.pad_hw,
                                    num_classes=cfg.data.num_classes, seed=0)
    val_set = SyntheticSegDataset(length=10, pad_size=cfg.data.pad_hw,
                                  num_classes=cfg.data.num_classes, seed=1)
    batcher = CooperativeBatcher(
        train_set, batch_size=args.batch_size,
        policy_name=cfg.data.data_aug_policy, pad_hw=cfg.data.pad_hw,
        crop_hw=cfg.data.crop_hw, num_classes=cfg.data.num_classes,
        keep_orig=cfg.data.keep_orig_image_label_pair_for_training,
        seed=args.seed)
    eval_batcher = EvalBatcher(val_set, batch_size=args.batch_size,
                               pad_hw=cfg.data.pad_hw, crop_hw=cfg.data.crop_hw)

    import jax

    rng = jax.random.PRNGKey(args.seed + 1)

    if args.bench_iters:
        # timing anchor (VERDICT r2 #5): reference cooperative iteration,
        # batch 20, CPU — a MEASURED lower anchor next to the nominal GPU
        # estimate in bench.py.
        rng, epoch_key = jax.random.split(rng)
        batch = next(iter(batcher.epoch(epoch_key)))
        clean = to_nchw(np.asarray(batch["image"]))
        label = torch.from_numpy(np.asarray(batch["label"])).long()
        train_iteration(solver, clean, label,
                        latent_da=not args.no_latent_da)  # warmup
        t0 = time.perf_counter()
        for _ in range(args.bench_iters):
            train_iteration(solver, clean, label,
                            latent_da=not args.no_latent_da)
        per = (time.perf_counter() - t0) / args.bench_iters
        print(json.dumps({
            "metric": "reference torch cooperative iteration (CPU, 1 core)",
            "sec_per_iter": round(per, 2),
            "slices_per_sec": round(clean.shape[0] / per, 2),
            "batch": int(clean.shape[0]),
            "torch_threads": torch.get_num_threads()}))
        return

    log_path = os.path.join(args.out_dir, "epochs.jsonl")
    best = -1e9
    start_epoch = 0
    if args.resume and os.path.exists(ckpt_path):
        start_epoch = int(solver.load_snapshots(ckpt_path)) + 1
        # re-advance the per-epoch augmentation key stream so resumed
        # epochs draw the same batches an uninterrupted run would have
        for _ in range(start_epoch):
            rng, _ = jax.random.split(rng)
        if os.path.exists(log_path):
            # keep one coherent trajectory: drop records past the snapshot
            # (a crash may have logged epochs after the last best save)
            recs = [json.loads(l) for l in open(log_path)]
            kept = [r for r in recs if r["epoch"] < start_epoch]
            best = max((r["val_iou"] for r in kept if "val_iou" in r),
                       default=-1e9)
            with open(log_path, "w") as f:
                for r in kept:
                    f.write(json.dumps(r) + "\n")
        print(json.dumps({"resumed_from_epoch": start_epoch - 1,
                          "best_so_far": best}), flush=True)
    with open(log_path, "a") as log:
        for epoch in range(start_epoch, args.max_epochs):
            t0 = time.perf_counter()
            std_sum = hard_sum = 0.0
            n = 0
            rng, epoch_key = jax.random.split(rng)
            for batch in batcher.epoch(epoch_key):
                clean = to_nchw(np.asarray(batch["image"]))
                label = torch.from_numpy(np.asarray(batch["label"])).long()
                s, h = train_iteration(solver, clean, label,
                                       latent_da=not args.no_latent_da)
                std_sum += s
                hard_sum += h
                n += 1
            rec = {"epoch": epoch, "std_loss": std_sum / n,
                   "hard_loss": hard_sum / n,
                   "epoch_sec": round(time.perf_counter() - t0, 1)}
            if (epoch + 1) % args.eval_every == 0 or epoch == 0:
                iou = eval_epoch(solver, eval_batcher, cfg.data.num_classes)
                rec["val_iou"] = iou
                if iou > best:
                    best = iou
                    rec["best"] = True
                    # writes {out_dir}/interrupted/checkpoints/<net>.pkl
                    saved = solver.save_snapshots(args.out_dir, epoch)
                    os.replace(saved, ckpt_path)
            print(json.dumps(rec), flush=True)
            log.write(json.dumps(rec) + "\n")
            log.flush()
    print(json.dumps({"best_val_iou": best, "epochs": args.max_epochs}))
    if args.acdc_root:
        solver.load_snapshots(ckpt_path)
        print(json.dumps(
            {"heldout": heldout_eval(solver, args.acdc_root,
                                     cfg.data.num_classes)}))


if __name__ == "__main__":
    main()
