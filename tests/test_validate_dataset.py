"""Tests for cli/validate_dataset.py (VERDICT r4 #3).

Builds tiny synthetic ACDC/M&Ms/ACDC-C trees — healthy and deliberately
broken (truncated header, shape mismatch, out-of-range labels, empty label,
missing patients/frames) — and asserts the validator's go/no-go verdicts
and specific FAIL lines.  Mirrors the invariants the data layer relies on
(`medseg/dataset_loader/cardiac_ACDC_dataset.py:117-161`,
`medseg/test_ACDC_triplet_segmentation.py:25-30`).
"""

from __future__ import annotations

import os
import sys
from os.path import join

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cli.validate_dataset import Report, check_volume_pair, main  # noqa: E402
from cooperative_training_and_latent_space_data_augmentation_tpu.data.nifti import (  # noqa: E402
    write_nrrd,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.data.splits import (  # noqa: E402
    get_ACDC_split_policy,
)


def _write_patient(root, pid, frames=("ED", "ES"), shape=(4, 32, 32),
                   spacing=(1.36719, 1.36719, 10.0), label_value=1,
                   img=None, lbl=None):
    pdir = join(root, pid)
    os.makedirs(pdir, exist_ok=True)
    rng = np.random.default_rng(hash(pid) % 2**32)
    for frame in frames:
        vol = img if img is not None else rng.uniform(
            0, 1, size=shape).astype(np.float32)
        seg = lbl if lbl is not None else np.zeros(shape, np.int16)
        if lbl is None:
            seg[:, 8:16, 8:16] = label_value
        write_nrrd(join(pdir, f"{frame}_img.nrrd"), vol, spacing)
        write_nrrd(join(pdir, f"{frame}_seg.nrrd"), seg, spacing)


@pytest.fixture()
def healthy_tree(tmp_path):
    root = str(tmp_path / "ACDC")
    pol = get_ACDC_split_policy("10", 0)
    for pid in pol["train"] + pol["validate"] + pol["test"]:
        _write_patient(root, pid)
    return root


def test_healthy_tree_is_go(healthy_tree, capsys):
    rc = main(["--acdc_root", healthy_tree, "--cvals", "0",
               "--max_patients", "4"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "VERDICT: GO" in out
    assert "[FAIL]" not in out


def test_missing_patients_no_go(tmp_path, capsys):
    root = str(tmp_path / "ACDC")
    _write_patient(root, "001")
    rc = main(["--acdc_root", root, "--cvals", "0"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "split-policy patients missing" in out
    assert "VERDICT: NO-GO" in out


def test_truncated_header_fails(tmp_path):
    root = str(tmp_path / "ACDC")
    _write_patient(root, "001")
    img = join(root, "001", "ED_img.nrrd")
    with open(img, "rb") as f:
        head = f.read(40)
    with open(img, "wb") as f:
        f.write(head)
    rep = Report()
    assert check_volume_pair(rep, "t", img,
                             join(root, "001", "ED_seg.nrrd"), 4) is False
    assert rep.counts["FAIL"] == 1
    assert "unreadable" in rep.lines[0][1]


def test_shape_mismatch_fails(tmp_path):
    root = str(tmp_path / "ACDC")
    os.makedirs(join(root, "001"))
    write_nrrd(join(root, "001", "ED_img.nrrd"),
               np.zeros((4, 32, 32), np.float32), (1.36719, 1.36719, 10.0))
    write_nrrd(join(root, "001", "ED_seg.nrrd"),
               np.zeros((4, 30, 32), np.int16), (1.36719, 1.36719, 10.0))
    rep = Report()
    check_volume_pair(rep, "t", join(root, "001", "ED_img.nrrd"),
                      join(root, "001", "ED_seg.nrrd"), 4)
    assert any("shape" in m for _lvl, m in rep.lines if _lvl == "FAIL")


def test_label_range_and_empty_label_fail(tmp_path):
    root = str(tmp_path / "ACDC")
    bad_lbl = np.zeros((4, 32, 32), np.int16)
    bad_lbl[:, 2:4, 2:4] = 7  # outside [0, 4)
    _write_patient(root, "001", frames=("ED",), lbl=bad_lbl)
    rep = Report()
    check_volume_pair(rep, "t", join(root, "001", "ED_img.nrrd"),
                      join(root, "001", "ED_seg.nrrd"), 4)
    assert any("outside [0, 4)" in m for _l, m in rep.lines)

    empty = np.zeros((4, 32, 32), np.int16)
    _write_patient(root, "002", frames=("ED",), lbl=empty)
    rep2 = Report()
    check_volume_pair(rep2, "t", join(root, "002", "ED_img.nrrd"),
                      join(root, "002", "ED_seg.nrrd"), 4)
    assert any("entirely background" in m for _l, m in rep2.lines)


def test_nan_image_fails_and_odd_spacing_warns(tmp_path):
    root = str(tmp_path / "ACDC")
    img = np.full((4, 32, 32), np.nan, np.float32)
    _write_patient(root, "001", frames=("ED",), img=img,
                   spacing=(1.0, 1.0, 10.0))
    rep = Report()
    check_volume_pair(rep, "t", join(root, "001", "ED_img.nrrd"),
                      join(root, "001", "ED_seg.nrrd"), 4)
    assert any("NaN" in m for lvl, m in rep.lines if lvl == "FAIL")
    assert any("spacing" in m for lvl, m in rep.lines if lvl == "WARN")


def test_mm_and_acdc_c_trees(tmp_path, capsys):
    mm = str(tmp_path / "MM")
    for pid in ("A0S9V9", "A1D0Q7"):
        _write_patient(mm, pid)
    cc = str(tmp_path / "ACDC_C")
    for attack in ("RandomBias", "RandomSpike", "RandomGhosting",
                   "RandomMotion"):
        for pid in ("001_0", "001_1"):
            _write_patient(join(cc, attack), pid, frames=("ED",))
    rc = main(["--mm_root", mm, "--acdc_c_root", cc, "--frames", "ED"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "M&Ms: 2 patients" in out
    assert "seeds=['0', '1']" in out


def test_acdc_c_missing_attack_warns_then_fails_when_all_missing(
        tmp_path, capsys):
    cc = str(tmp_path / "ACDC_C")
    _write_patient(join(cc, "RandomBias"), "001_0", frames=("ED",))
    rc = main(["--acdc_c_root", cc, "--frames", "ED"])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.count("corruption subset") == 3  # 3 WARNs, 1 present

    empty = str(tmp_path / "ACDC_C_empty")
    os.makedirs(empty)
    rc = main(["--acdc_c_root", empty, "--frames", "ED"])
    assert rc == 1
