"""Shipped defaults = measured winners (VERDICT r4 #6).

Pins the flag registry (utils/flags.py) against the LIVE accessor functions
and inline ``os.environ.get`` call sites, so a default can't drift from its
recorded measurement without failing CI (round 4's TILED_WARP shipped ON
with no measurement — this test makes that class of drift loud).

No reference counterpart (repo hygiene; the reference has one hard-coded
path, `medseg/train_adv_supervised_segmentation_triplet.py`).
"""

from __future__ import annotations

import os
import re

import pytest

from cooperative_training_and_latent_space_data_augmentation_tpu.utils import (
    flags,
)

PKG = os.path.dirname(os.path.dirname(os.path.abspath(flags.__file__)))
REPO = os.path.dirname(PKG)

# every knob any first-party source reads must be registered
SOURCE_ROOTS = [PKG, os.path.join(REPO, "bench.py"),
                os.path.join(REPO, "__graft_entry__.py")]

# knobs that are harness/test-gate only (registered, not winner-backed)
HARNESS = {"BENCH_BATCH", "BENCH_DTYPE", "BENCH_REMAT",
           "DRYRUN_REAL_DEVICES", "FULL_SHAPE_SHARDING",
           "PALLAS_CONV_INTERPRET"}

# std env vars the code reads but that are not framework knobs
EXEMPT = {"XLA_FLAGS", "JAX_PLATFORMS", "JAX_COMPILATION_CACHE_DIR", "HOME",
          "RUN_SLOW", "TPU_SKIP_MDS_QUERY"}


def _scrub(monkeypatch):
    for f in flags.REGISTRY:
        monkeypatch.delenv(f.name, raising=False)


def _iter_sources():
    for root in SOURCE_ROOTS:
        if os.path.isfile(root):
            yield root
            continue
        for dirpath, _dirnames, filenames in os.walk(root):
            for fn in filenames:
                if fn.endswith(".py"):
                    yield os.path.join(dirpath, fn)


def test_every_env_knob_is_registered():
    """Walk the package + entry points for os.environ reads; each must be
    in the registry (or an exempt std var)."""
    pat = re.compile(r"""os\.environ(?:\.get\(|\[)\s*["']([A-Z0-9_]+)["']""")
    seen = set()
    for path in _iter_sources():
        with open(path) as f:
            for m in pat.finditer(f.read()):
                seen.add(m.group(1))
    registered = {f.name for f in flags.REGISTRY}
    unknown = seen - registered - EXEMPT
    assert not unknown, f"unregistered env knobs: {sorted(unknown)}"


def test_registry_defaults_match_inline_call_sites():
    """Each registered knob's default must equal the fallback literal at its
    actual os.environ.get call site (accessor or inline)."""
    source = {}
    for path in _iter_sources():
        with open(path) as f:
            source[path] = f.read()
    pat = r"""os\.environ\.get\(\s*["']{name}["']\s*,\s*["']([^"']*)["']"""
    for flag in flags.REGISTRY:
        hits = set()
        for text in source.values():
            hits.update(re.findall(pat.format(name=flag.name), text))
        if not hits:  # read without a .get default (e.g. test gates)
            continue
        assert hits == {flag.default}, (
            f"{flag.name}: registry default {flag.default!r} vs call-site "
            f"fallbacks {hits} — update utils/flags.py AND its evidence")


def test_accessors_return_measured_winners(monkeypatch):
    """With a scrubbed env, the live accessors ship the measured winners."""
    _scrub(monkeypatch)
    from cooperative_training_and_latent_space_data_augmentation_tpu.ops import (
        augment,
        fast_conv,
        pallas_conv,
    )

    assert pallas_conv.pallas_conv_enabled() is True      # 2.12x win (r3)
    assert pallas_conv.vjp_mode() == "pallas"             # 86 vs 115/139 ms
    assert pallas_conv.pallas_s2_enabled() is False       # negative (r3)
    assert pallas_conv.pallas_nl_enabled() is False       # negative (r4)
    assert fast_conv.fast_conv_enabled() is False         # negative (r2)
    assert augment._fused_warp_enabled() is True          # fused gather win
    # TILED_WARP: default must match the registry (earned by r5 measurement)
    assert augment._tiled_warp_enabled() is (
        flags.lookup("TILED_WARP").default == "1")


def test_registry_is_internally_consistent():
    names = [f.name for f in flags.REGISTRY]
    assert len(names) == len(set(names))
    for f in flags.REGISTRY:
        if f.kind == "bool01":
            assert f.default in ("0", "1")
        elif f.kind == "int":
            assert f.default == "" or f.default.lstrip("-").isdigit()
        assert f.evidence, f.name
        assert f.ships, f.name
        if f.name not in HARNESS and f.kind == "bool01":
            # winner-backed booleans must cite a measurement or its absence
            assert any(w in f.evidence.lower()
                       for w in ("measured", "bench", "ms", "pending",
                                 "profile")), f.name


def test_migration_table_in_sync():
    """MIGRATION.md carries the rendered registry table verbatim."""
    path = os.path.join(REPO, "MIGRATION.md")
    with open(path) as f:
        text = f.read()
    assert flags.markdown_table() in text, (
        "MIGRATION.md flag table out of sync — re-render with "
        "utils/flags.markdown_table()")


def test_current_reads_env(monkeypatch):
    _scrub(monkeypatch)
    assert flags.current("PALLAS_VJP") == "pallas"
    monkeypatch.setenv("PALLAS_VJP", "stock")
    assert flags.current("PALLAS_VJP") == "stock"
    with pytest.raises(KeyError):
        flags.lookup("NOT_A_FLAG")
