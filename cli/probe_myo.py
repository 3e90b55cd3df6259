"""MYO-quality probe (VERDICT r2 #8): does the augmentation label warp
erode the thin myocardium ring?

MYO Dice lags LV/RV across every synthetic run (RESULTS.md).  Hypothesis
under test: the geometric label warp (ops/augment.py warp_label — per-class
order-3 warp with the reference's >=0.5 overwrite,
elastic_transform.py:86-96) systematically destroys thin structures, so the
training targets themselves under-represent MYO.

Method: run the full device augmentation pipeline over N phantoms under
three policies — the ACDC training policy, the same policy with elastic
fields off, and affine-only with order-1 (bilinear) label sampling — and
measure per class:

  * retention = augmented area / original (center-cropped) area, normalized
    by the geometric mean retention of LV+RV (divides out zoom);
  * ring integrity = fraction of LV boundary pixels whose outward neighbor
    is MYO (a broken ring exposes LV directly to background/RV).

Output: one JSON line per policy + a conclusion line.  CPU-runnable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    _flags = os.environ.get("XLA_FLAGS", "")
    if "space-to-batch-converter" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_disable_hlo_passes=space-to-batch-converter").strip()

import jax
import jax.numpy as jnp
import numpy as np

from cooperative_training_and_latent_space_data_augmentation_tpu.data.synthetic import (
    make_phantom,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.ops import augment


def ring_integrity(label_hw: np.ndarray) -> float:
    """Fraction of LV(1) boundary pixels whose 4-neighborhood outside LV is
    MYO(2).  1.0 = closed ring; lower = the warp broke the ring open."""
    lv = label_hw == 1
    if not lv.any():
        return np.nan
    pad = np.pad(label_hw, 1, constant_values=0)
    lvp = np.pad(lv, 1, constant_values=False)
    hits = total = 0
    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        nb = pad[1 + dy:pad.shape[0] - 1 + dy, 1 + dx:pad.shape[1] - 1 + dx]
        nb_lv = lvp[1 + dy:lvp.shape[0] - 1 + dy, 1 + dx:lvp.shape[1] - 1 + dx]
        edge = lv & ~nb_lv          # LV pixels whose neighbor is not LV
        total += int(edge.sum())
        hits += int((nb[edge] == 2).sum())
    return hits / max(total, 1)


def run_policy(name: str, policy, images, labels, seed: int,
               crop_hw=(192, 192)):
    batch_aug = jax.jit(jax.vmap(
        lambda key, img, lab: augment.augment_sample(
            key, img, lab, policy, crop_hw=crop_hw)))
    keys = jax.random.split(jax.random.PRNGKey(seed), images.shape[0])
    _, out_lab = batch_aug(keys, images, labels)
    out_lab = np.asarray(out_lab)

    # originals center-cropped to the same frame
    oh = (labels.shape[1] - crop_hw[0]) // 2
    ow = (labels.shape[2] - crop_hw[1]) // 2
    orig = np.asarray(labels[:, oh:oh + crop_hw[0], ow:ow + crop_hw[1]])

    rec = {"policy": name, "n": int(images.shape[0])}
    ret = {}
    for c, cname in ((1, "LV"), (2, "MYO"), (3, "RV")):
        a_o = (orig == c).sum(axis=(1, 2)).astype(np.float64)
        a_a = (out_lab == c).sum(axis=(1, 2)).astype(np.float64)
        ok = a_o > 0
        ret[cname] = a_a[ok] / a_o[ok]
    # divide out isotropic zoom using LV+RV (thick structures)
    zoom = np.sqrt(np.maximum(ret["LV"] * ret["RV"], 1e-9))
    for cname in ("LV", "MYO", "RV"):
        rec[f"retention_{cname}"] = round(float(np.mean(ret[cname])), 4)
    rec["myo_over_thick"] = round(
        float(np.mean(ret["MYO"] / np.maximum(zoom, 1e-9))), 4)
    rec["myo_vanished_frac"] = round(float(np.mean(ret["MYO"] == 0)), 4)
    ring = [ring_integrity(l) for l in out_lab]
    ring0 = [ring_integrity(l) for l in orig]
    rec["ring_integrity_aug"] = round(float(np.nanmean(ring)), 4)
    rec["ring_integrity_orig"] = round(float(np.nanmean(ring0)), 4)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    pairs = [make_phantom(rng) for _ in range(args.n)]
    images = jnp.asarray(np.stack([p[0] for p in pairs]))
    labels = jnp.asarray(np.stack([p[1] for p in pairs]))

    full = augment.get_policy("ACDC_affine_elastic_intensity")
    from dataclasses import replace

    no_elastic = replace(full, elastic_prob=0.0, elastic_prob_v2=0.0)
    affine_only = replace(no_elastic, perturb_prob=0.0, perturb_v2_prob=0.0,
                          intensity_prob=0.0, gamma_prob=0.0)

    rows = []
    for name, pol in (("full_ACDC_policy", full),
                      ("no_elastic", no_elastic),
                      ("affine_only", affine_only)):
        rec = run_policy(name, pol, images, labels, args.seed + 1)
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    f, ne = rows[0], rows[1]
    verdict = {
        "elastic_myo_penalty": round(ne["myo_over_thick"]
                                     - f["myo_over_thick"], 4),
        "elastic_ring_penalty": round(ne["ring_integrity_aug"]
                                      - f["ring_integrity_aug"], 4),
    }
    print(json.dumps({"conclusion": verdict}))


if __name__ == "__main__":
    main()
