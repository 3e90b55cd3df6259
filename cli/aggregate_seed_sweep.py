"""Aggregate the round-5 seed sweep + deviation A/Bs into summary tables.

Reads `saved/seed_sweep_r5/` (rebuild seeds 41-45 at the 300-epoch
head-to-head protocol), the round-4 seed-40 runs in `saved/head_to_head/`,
and `saved/deviation_ab_r5/` (equal-seed SEQ_WARP / SALIENCY_BN_UPDATE
arms), printing mean +- std rows ready for RESULTS.md.  Protocol match:
the reference averages over cvals (test_ACDC_triplet_segmentation.py:
121-126); the synthetic task has one split, so variance comes from seeds.

No reference counterpart (analysis helper).
"""

import csv
import json
import os
import sys
from os.path import join

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def best_val_iou(run_dir):
    ep = join(run_dir, "epochs.jsonl")
    if os.path.exists(ep):  # torch reference driver format
        best = -1.0
        for line in open(ep):
            best = max(best, float(json.loads(line).get("val_iou", -1.0)))
        return best if best >= 0 else None
    for dirpath, _d, files in os.walk(run_dir):
        if "scalars.jsonl" in files:
            best = -1.0
            for line in open(join(dirpath, "scalars.jsonl")):
                t = json.loads(line)
                if t.get("tag") == "iou/val_iou":
                    best = max(best, float(t["value"]))
            return best if best >= 0 else None
    return None


def dice_row(eval_dir):
    p = join(eval_dir, "ACDC", "summary.csv")
    if os.path.exists(p):
        with open(p) as f:
            rows = list(csv.reader(f))
        head, mean = rows[0], [float(x) for x in rows[1]]
        d = dict(zip(head, mean))
    else:
        # torch runs: cli/train_torch_reference.py prints the heldout
        # summary as JSON; a heldout.json beside epochs.jsonl carries it
        p = join(eval_dir, "heldout.json")
        if not os.path.exists(p):
            return None
        h = json.load(open(p))
        d = {k[: -len("_mean")]: v for k, v in h.items() if k.endswith("_mean")}
    lv, myo, rv = d["LV_Dice"], d["MYO_Dice"], d["RV_Dice"]
    return lv, myo, rv, (lv + myo + rv) / 3.0


def collect(pairs):
    out = []
    for tag, run_dir, eval_dir in pairs:
        iou = best_val_iou(run_dir)
        row = dice_row(eval_dir)
        if row is None:
            print(f"  [missing eval] {tag}")
            continue
        lv, myo, rv, mean = row
        out.append((tag, iou, lv, myo, rv, mean))
        print(f"  {tag}: best_val_iou={iou if iou is not None else float('nan'):.4f} "
              f"LV={lv:.3f} MYO={myo:.3f} RV={rv:.3f} mean={mean:.3f}")
    return out


def stats(rows, label):
    if not rows:
        return
    arr = np.array([[r[1] if r[1] is not None else np.nan, *r[2:]] for r in rows],
                   float)
    m, s = np.nanmean(arr, 0), np.nanstd(arr, 0)
    print(f"{label} (n={len(rows)}): "
          f"val_iou {m[0]:.4f}+-{s[0]:.4f}  LV {m[1]:.3f}+-{s[1]:.3f}  "
          f"MYO {m[2]:.3f}+-{s[2]:.3f}  RV {m[3]:.3f}+-{s[3]:.3f}  "
          f"mean {m[4]:.3f}+-{s[4]:.3f}")


def main():
    ss = join(REPO, "saved", "seed_sweep_r5")
    hh = join(REPO, "saved", "head_to_head")
    print("== rebuild seeds (300-epoch protocol, current HEAD)")
    pairs = [("seed40(r4 code)", join(hh, "rebuild_seed40_e300"),
              join(hh, "rebuild_seed40_e300_eval"))]
    pairs += [(f"seed{s}", join(ss, f"rebuild_seed{s}_e300"),
               join(ss, f"eval_seed{s}")) for s in range(41, 46)]
    rows = collect(pairs)
    stats([r for r in rows if r[0] != "seed40(r4 code)"],
          "rebuild r5 seeds 41-45")
    stats(rows, "rebuild all incl. seed40")

    print("== deviation A/Bs (equal seed 40)")
    ab = join(REPO, "saved", "deviation_ab_r5")
    collect([(t, join(ab, f"{t}_seed40"), join(ab, f"eval_{t}_seed40"))
             for t in ("control", "seq_warp", "saliency_bn")])

    print("== torch reference")
    collect([("torch_seed40", join(hh, "torch_seed40_e300"),
              join(hh, "torch_seed40_e300")),
             ("torch_seed41", join(hh, "torch_seed41_e300"),
              join(hh, "torch_seed41_e300"))])

    print("== robustness across seeds (cooperative - standard, mean Dice)")
    robustness_stats(join(REPO, "saved", "robustness_seeds_r5"))


def robustness_stats(root):
    """Mean +- std across seed dirs of per-dataset mean Dice and the
    cooperative-minus-standard delta (the +11.5 pt headline, VERDICT r4
    missing #3)."""
    per_seed = {}
    for name in sorted(os.listdir(root)) if os.path.isdir(root) else []:
        if not name.startswith("eval_seed"):
            continue
        p = join(root, name, "aggregated.csv")
        if not os.path.exists(p):
            continue
        rows = list(csv.DictReader(open(p)))
        d = {}
        for r in rows:
            if r["metric"].endswith("_Dice"):
                d.setdefault((r["dataset"], r["method"]), []).append(
                    float(r["mean"]))
        per_seed[name] = {k: float(np.mean(v)) for k, v in d.items()}
    if not per_seed:
        print("  [no robustness evals found]")
        return
    datasets = sorted({ds for seed in per_seed.values() for ds, _m in seed})
    corr = [d for d in datasets if d.startswith("Random")]
    for ds in datasets + ["corrupted_avg"]:
        deltas, coops, stds = [], [], []
        for seed_vals in per_seed.values():
            if ds == "corrupted_avg":
                c = np.mean([seed_vals[(d, "cooperative_training")] for d in corr])
                s = np.mean([seed_vals[(d, "standard_training")] for d in corr])
            else:
                c = seed_vals.get((ds, "cooperative_training"))
                s = seed_vals.get((ds, "standard_training"))
                if c is None or s is None:
                    continue
            coops.append(c)
            stds.append(s)
            deltas.append(c - s)
        if deltas:
            print(f"  {ds}: std {np.mean(stds):.3f}+-{np.std(stds):.3f}  "
                  f"coop {np.mean(coops):.3f}+-{np.std(coops):.3f}  "
                  f"delta {np.mean(deltas)*100:+.1f}+-{np.std(deltas)*100:.1f} pt "
                  f"(n={len(deltas)})")


if __name__ == "__main__":
    sys.exit(main())
