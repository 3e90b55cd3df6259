"""Header-variant tests for the pure-numpy NIfTI reader (VERDICT r3 #6).

The real-data run happens outside this environment, so ``data/nifti.py``
must cope with the header dialects real ACDC/M&Ms exports use (SimpleITK/
nibabel writers, both byte orders, scl scaling, sform spacing, .hdr/.img
pairs, NIfTI-2) and fail loudly otherwise.  Each test synthesizes the
header bytes directly — no external writer is available in this image.
"""

from __future__ import annotations

import gzip
import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cooperative_training_and_latent_space_data_augmentation_tpu.data.nifti import (  # noqa: E402
    read_nifti,
    write_nifti,
)

SHAPE_ZYX = (3, 5, 4)  # tiny volume: z=3, y=5, x=4


def _vol(dtype) -> np.ndarray:
    rng = np.random.RandomState(0)
    if np.issubdtype(np.dtype(dtype), np.floating):
        return rng.uniform(-2, 7, SHAPE_ZYX).astype(dtype)
    info = np.iinfo(dtype)
    return rng.randint(max(info.min, -100), min(info.max, 200),
                       SHAPE_ZYX).astype(dtype)


_DT_CODE = {np.dtype(np.uint8): 2, np.dtype(np.int16): 4,
            np.dtype(np.int32): 8, np.dtype(np.float32): 16,
            np.dtype(np.float64): 64, np.dtype(np.uint16): 512,
            np.dtype(np.int64): 1024}


def _make_nifti1(arr_zyx: np.ndarray, *, endian: str = "<",
                 scl_slope: float = 1.0, scl_inter: float = 0.0,
                 pixdim=(1.25, 1.25, 8.0), sform=None, magic: bytes = b"n+1",
                 extra_dim_t: int = 0, vox_offset: float = 352.0) -> bytes:
    """Hand-rolled NIfTI-1 blob covering the header fields under test."""
    dt = arr_zyx.dtype.newbyteorder(endian)
    xyz = np.transpose(arr_zyx, (2, 1, 0)).astype(dt)
    if extra_dim_t:
        # 4-D: replicate the volume over t; the reader must take t=0
        xyz = np.stack([xyz if t == 0 else xyz * 0 + t
                        for t in range(extra_dim_t)], axis=-1).astype(dt)
    hdr = bytearray(max(352, int(vox_offset)))
    struct.pack_into(endian + "i", hdr, 0, 348)
    ndim = 4 if extra_dim_t else 3
    dims = [ndim, xyz.shape[0], xyz.shape[1], xyz.shape[2],
            extra_dim_t or 1, 1, 1, 1]
    struct.pack_into(endian + "8h", hdr, 40, *dims)
    struct.pack_into(endian + "h", hdr, 70, _DT_CODE[arr_zyx.dtype])
    struct.pack_into(endian + "h", hdr, 72, arr_zyx.dtype.itemsize * 8)
    struct.pack_into(endian + "8f", hdr, 76, 1.0, *pixdim, 1.0, 0.0, 0.0, 0.0)
    struct.pack_into(endian + "f", hdr, 108, vox_offset)
    struct.pack_into(endian + "f", hdr, 112, scl_slope)
    struct.pack_into(endian + "f", hdr, 116, scl_inter)
    if sform is not None:
        struct.pack_into(endian + "h", hdr, 254, 1)  # sform_code
        struct.pack_into(endian + "12f", hdr, 280, *sform)
    hdr[344:347] = magic
    return bytes(hdr) + xyz.tobytes(order="F")


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.uint16, np.int32,
                                   np.int64, np.float32, np.float64])
@pytest.mark.parametrize("gz", [False, True])
def test_dtypes_and_gzip_roundtrip(tmp_path, dtype, gz):
    arr = _vol(dtype)
    path = str(tmp_path / ("v.nii.gz" if gz else "v.nii"))
    blob = _make_nifti1(arr)
    with open(path, "wb") as f:
        f.write(gzip.compress(blob) if gz else blob)
    got, spacing = read_nifti(path)
    np.testing.assert_array_equal(got, arr)
    assert spacing == pytest.approx((1.25, 1.25, 8.0))


def test_big_endian_header_and_data(tmp_path):
    arr = _vol(np.int16)
    path = str(tmp_path / "be.nii")
    with open(path, "wb") as f:
        f.write(_make_nifti1(arr, endian=">"))
    got, spacing = read_nifti(path)
    np.testing.assert_array_equal(got, arr)
    assert spacing == pytest.approx((1.25, 1.25, 8.0))


def test_scl_slope_inter_applied(tmp_path):
    arr = _vol(np.int16)
    path = str(tmp_path / "scl.nii")
    with open(path, "wb") as f:
        f.write(_make_nifti1(arr, scl_slope=2.5, scl_inter=-7.0))
    got, _ = read_nifti(path)
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, arr.astype(np.float32) * 2.5 - 7.0,
                               rtol=1e-6)


def test_nan_slope_means_no_scaling(tmp_path):
    arr = _vol(np.float32)
    path = str(tmp_path / "nan.nii")
    with open(path, "wb") as f:
        f.write(_make_nifti1(arr, scl_slope=float("nan"),
                             scl_inter=float("nan")))
    got, _ = read_nifti(path)
    np.testing.assert_array_equal(got, arr)


def test_sform_spacing_overrides_stale_pixdim(tmp_path):
    arr = _vol(np.float32)
    # sform: voxel axes scaled 1.367, 1.367, 10 with a permuted orientation
    sform = (0.0, 1.367, 0.0, -5.0,
             -1.367, 0.0, 0.0, 3.0,
             0.0, 0.0, 10.0, 0.0)
    path = str(tmp_path / "sform.nii")
    with open(path, "wb") as f:
        f.write(_make_nifti1(arr, pixdim=(0.0, 0.0, 0.0), sform=sform))
    got, spacing = read_nifti(path)
    np.testing.assert_array_equal(got, arr)
    assert spacing == pytest.approx((1.367, 1.367, 10.0))


def test_zero_pixdim_falls_back_to_one(tmp_path):
    arr = _vol(np.float32)
    path = str(tmp_path / "zp.nii")
    with open(path, "wb") as f:
        f.write(_make_nifti1(arr, pixdim=(0.0, -1.0, 5.0)))
    _, spacing = read_nifti(path)
    assert spacing == pytest.approx((1.0, 1.0, 5.0))


def test_4d_takes_first_timepoint(tmp_path):
    arr = _vol(np.float32)
    path = str(tmp_path / "t4.nii")
    with open(path, "wb") as f:
        f.write(_make_nifti1(arr, extra_dim_t=3))
    got, _ = read_nifti(path)
    np.testing.assert_array_equal(got, arr)


def test_hdr_img_pair(tmp_path):
    arr = _vol(np.int16)
    blob = _make_nifti1(arr, magic=b"ni1", vox_offset=0.0)
    with open(tmp_path / "pair.hdr", "wb") as f:
        f.write(blob[:352])
    with open(tmp_path / "pair.img", "wb") as f:
        f.write(blob[352:])
    got, _ = read_nifti(str(tmp_path / "pair.hdr"))
    np.testing.assert_array_equal(got, arr)


def test_nifti2_roundtrip(tmp_path):
    arr = _vol(np.float32)
    xyz = np.transpose(arr, (2, 1, 0))
    hdr = bytearray(544)
    struct.pack_into("<i", hdr, 0, 540)
    struct.pack_into("<h", hdr, 12, 16)  # float32
    struct.pack_into("<h", hdr, 14, 32)
    struct.pack_into("<8q", hdr, 16, 3, *xyz.shape, 1, 1, 1, 1)
    struct.pack_into("<8d", hdr, 104, 1.0, 1.1, 1.2, 1.3, 0, 0, 0, 0)
    struct.pack_into("<q", hdr, 168, 544)   # vox_offset
    struct.pack_into("<d", hdr, 176, 1.0)   # scl_slope
    struct.pack_into("<d", hdr, 184, 0.0)
    path = str(tmp_path / "v2.nii")
    with open(path, "wb") as f:
        f.write(bytes(hdr) + xyz.astype("<f4").tobytes(order="F"))
    got, spacing = read_nifti(path)
    np.testing.assert_array_equal(got, arr)
    assert spacing == pytest.approx((1.1, 1.2, 1.3))


def test_truncated_data_raises_clearly(tmp_path):
    arr = _vol(np.float32)
    blob = _make_nifti1(arr)
    path = str(tmp_path / "trunc.nii")
    with open(path, "wb") as f:
        f.write(blob[:-40])
    with pytest.raises(ValueError, match="truncated"):
        read_nifti(path)


def test_garbage_header_raises_clearly(tmp_path):
    path = str(tmp_path / "junk.nii")
    with open(path, "wb") as f:
        f.write(b"\x00" * 400)
    with pytest.raises(ValueError, match="sizeof_hdr"):
        read_nifti(path)


def test_writer_reader_roundtrip(tmp_path):
    arr = _vol(np.float32)
    for name in ("w.nii", "w.nii.gz"):
        path = str(tmp_path / name)
        write_nifti(path, arr, spacing=(1.36719, 1.36719, 10.0))
        got, spacing = read_nifti(path)
        np.testing.assert_array_equal(got, arr)
        assert spacing == pytest.approx((1.36719, 1.36719, 10.0))
