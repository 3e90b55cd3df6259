"""Central registry of every trace-time env knob (VERDICT r4 #6).

The framework's measured-winner discipline is: *shipped defaults are the
configurations that won an end-to-end A/B on the real chip; measured-negative
alternates stay in-tree behind env flags as decision records.*  This module
is the single authoritative table of those knobs — name, shipped default,
what the default ships, and the measurement that set it — so defaults can't
silently drift from their evidence (round 4's TILED_WARP shipped ON
unmeasured; tests/test_defaults.py pins this table against both the live
accessor functions and the inline ``os.environ.get`` call sites).

No reference counterpart (repo hygiene); the reference has a single
hard-coded execution path (`medseg/train_adv_supervised_segmentation_triplet
.py`).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Tuple


@dataclass(frozen=True)
class Flag:
    name: str           # env var
    default: str        # value when unset
    kind: str           # 'bool01' | 'str' | 'int'
    ships: str          # what the default configuration runs
    evidence: str       # the measurement that set the default
    where: str          # module:symbol reading it


REGISTRY: Tuple[Flag, ...] = (
    Flag("PALLAS_CONV", "1", "bool01",
         "CHW-lanes Pallas 3x3 conv on every eligible stride-1 SAME stage",
         "end-to-end 183.0 -> 86.3 ms/step (2.12x), bench.py A/B r3; "
         "RESULTS.md 'Pallas CHW-lanes conv'",
         "ops/pallas_conv.py:pallas_conv_enabled"),
    Flag("PALLAS_VJP", "pallas", "str",
         "Pallas dx (flipped-weight forward kernel) + Pallas dw batch "
         "reduction backward route",
         "86.0 ms (pallas) vs 115.3 (hybrid) vs 139.4 (stock), bench.py "
         "A/B r4; RESULTS.md 'backward-route A/B'",
         "ops/pallas_conv.py:vjp_mode"),
    Flag("PALLAS_CONV_MAX_CH", "64", "int",
         "Pallas conv eligibility cutoff: stages with >64 channels stay on "
         "stock XLA",
         "128-ch stages run 94-173 TFLOP/s under stock XLA and LOSE on the "
         "Pallas path (saved/layer_profile.md)",
         "ops/pallas_conv.py:_eligible"),
    Flag("PALLAS_CONV_S2", "0", "bool01",
         "stride-2 downsamples on stock XLA (phase-decomposed Pallas kernel "
         "OFF)",
         "measured NEGATIVE: 93.3 vs 86.2 ms/step end-to-end, bench.py A/B "
         "r3; RESULTS.md 'stride-2 phase kernel'",
         "ops/pallas_conv.py:pallas_s2_enabled"),
    Flag("PALLAS_CONV_NL", "0", "bool01",
         "NL-sublanes kernel OFF",
         "measured NEGATIVE end-to-end (r4, RESULTS.md 'NL-sublanes')",
         "ops/pallas_conv.py:pallas_nl_enabled"),
    Flag("PALLAS_CONV_NL_MAX_CH", "256", "int",
         "(inactive while PALLAS_CONV_NL=0) NL-kernel eligibility cutoff",
         "tuning knob of a measured-negative path",
         "ops/pallas_conv.py:_nl_eligible"),
    Flag("PALLAS_CONV_INTERPRET", "0", "bool01",
         "compiled Mosaic kernels (interpret mode only for CPU dryruns/tests)",
         "interpret mode is a correctness harness, never a perf path "
         "(__graft_entry__.py dryrun sets it explicitly)",
         "ops/pallas_conv.py:_interpret"),
    Flag("FAST_CONV", "0", "bool01",
         "staircase-packed conv OFF",
         "measured NEGATIVE end-to-end (r2: isolation win, fused loss; "
         "RESULTS.md 'staircase')",
         "ops/fast_conv.py:fast_conv_enabled"),
    Flag("FUSED_WARP", "1", "bool01",
         "single fused order-3 warp of image+one-hot-label coefficient "
         "stack (one gather for both)",
         "the unfused two-gather route measures far slower standalone "
         "(saved/augment_profile.md note); value-pinned bit-exact",
         "ops/augment.py:_fused_warp_enabled"),
    Flag("TILED_WARP", "1", "bool01",
         "tile-local MXU evaluation of the fused warp (16x16 output tiles, "
         "48x48 dynamic-sliced windows, one-hot selector matmuls) with "
         "batch-level exact gather fallback",
         "measured WIN r5: warp isolation 20.30 -> 6.77 ms/batch-10 "
         "(3.00x, cli/bench_tiled_warp.py); epoch 1.757 -> 1.554 s (b20), "
         "1.413 -> 1.222 s (b80) — RESULTS.md round 5, "
         "saved/epoch_timing_r5/",
         "ops/augment.py:_tiled_warp_enabled"),
    Flag("SEQ_WARP", "0", "bool01",
         "single composed order-3 geometric resample (the shipped "
         "quality-favoring deviation); '1' = the reference's SEQUENTIAL "
         "affine-then-elastic double resample (deviation-A/B arm)",
         "measured A/B r5 (PARITY.md D1): three equal-seed pairs, paired "
         "delta (reference - composed) = -0.3 +- 1.7 held-out Dice — "
         "composed is neutral-to-slightly-better AND 3.0x faster, stays "
         "default",
         "ops/augment.py:_seq_warp_enabled"),
    Flag("SALIENCY_BN_UPDATE", "0", "bool01",
         "saliency forwards leave BN running stats untouched (the shipped "
         "deviation); '1' = reference semantics, the raw train-mode "
         "saliency decoder forward updates running stats "
         "(model_util.py:214-218)",
         "measured A/B r5 (PARITY.md D2): quality-neutral (+0.001 Dice / "
         "+0.001 val IoU equal-seed e300)",
         "train/cooperative.py:hard_example_generation"),
    Flag("FUSED_STN", "0", "bool01",
         "sequential STN passes (fused 4-pass STN batching OFF)",
         "measured WASH: 86.2 sequential vs 86.6 fused ms/step (bench.py "
         "A/B r3; train/cooperative.py:488 comment)",
         "train/cooperative.py:make_train_step(fused_stn=None)"),
    Flag("FUSED_FTN", "0", "bool01",
         "sequential standard + hard FTN passes (2N-batched FTN with "
         "value-only generation pre-pass OFF)",
         "measured NEGATIVE r5: 88.7 vs 86.1 ms/step end-to-end (bench.py "
         "A/B, calib 193/192 TFLOP/s in-band) — batching does not lift the "
         "channel-bound MXU-fill wall and the value-only pre-pass is pure "
         "overhead; exact-equivalence pinned in tests/test_cooperative.py; "
         "RESULTS.md round 5",
         "train/cooperative.py:make_train_step(fused_ftn=None)"),
    Flag("FUSED_EPOCH", "", "str",
         "auto: whole-epoch fused scan ON when backend is TPU and the "
         "dataset is device-resident; '1'/'0' force",
         "fused epoch is the 12.4 -> 1.77 s/epoch win (r3, RESULTS.md); "
         "XLA-CPU compiles the scanned epoch graph for minutes, hence auto",
         "train/driver.py:199"),
    Flag("PIPELINE_EPOCH", "", "str",
         "serial per-epoch fetch (unset/'0' = off; '1' opts in)",
         "measured NEGATIVE on the tunneled backend: 12.1 s/epoch pipelined "
         "vs 1.77 serial (driver.py:202 comment, r4)",
         "train/driver.py:214"),
    Flag("MULTI_EPOCH", "0", "int",
         "one fused dispatch per epoch (no K-epoch window)",
         "measured WASH at the bench protocol: 1.74 vs 1.77 s/epoch at "
         "MULTI_EPOCH=8 (RESULTS.md r4).  Operational note r5: when the "
         "per-epoch sync IS expensive (host-contended tunnel) the window "
         "is a big win — the r5 seed sweep ran ~12 s/epoch serial vs "
         "~1.4 s/epoch at MULTI_EPOCH=30 (window==serial pinned per "
         "entry run)",
         "train/driver.py:238"),
    Flag("FULL_SHAPE_SHARDING", "0", "bool01",
         "192^2 8-device sharded-vs-single equivalence test SKIPPED in "
         "default CI (compile-heavy)",
         "test gate only; the full-shape artifact is re-validated per round "
         "via `python __graft_entry__.py --full` (saved/multichip_full_*.json)",
         "tests/test_sharding.py:82"),
    Flag("BENCH_BATCH", "20", "int",
         "bench.py step batch size (the reference's batch 20)",
         "harness knob (config parity, not a tuned winner)",
         "bench.py"),
    Flag("BENCH_DTYPE", "bfloat16", "str",
         "bench.py mixed-precision step (convs bf16 on the MXU)",
         "bf16 is the shipped training config; quality-neutral (RESULTS.md "
         "60-epoch bracket: bf16 0.287 vs f32 0.260 mean Dice)",
         "bench.py"),
    Flag("BENCH_REMAT", "0", "bool01",
         "no rematerialization in the bench step",
         "remat trades FLOPs for memory; not needed at batch 20-80 on v5e",
         "bench.py"),
    Flag("DRYRUN_REAL_DEVICES", "0", "bool01",
         "__graft_entry__.py dryrun forces an 8-device virtual CPU mesh",
         "harness knob (the driver validates multi-chip without 8 chips)",
         "__graft_entry__.py"),
)


def lookup(name: str) -> Flag:
    for f in REGISTRY:
        if f.name == name:
            return f
    raise KeyError(name)


def current(name: str) -> str:
    """The live value of a registered knob (default when unset)."""
    return os.environ.get(name, lookup(name).default)


def markdown_table() -> str:
    """Render the registry as the MIGRATION.md table (kept in sync by
    tests/test_defaults.py)."""
    lines = ["| env var | default | ships | evidence |", "|---|---|---|---|"]
    for f in REGISTRY:
        lines.append(f"| `{f.name}` | `{f.default or '(unset=auto)'}` | "
                     f"{f.ships} | {f.evidence} |")
    return "\n".join(lines)
