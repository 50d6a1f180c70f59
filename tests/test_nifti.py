"""From-scratch NIfTI-1 writer (utils/nifti.py): round-trip, header fields,
and gzip container — restores the reference's .nii.gz export contract
(``test_3D_util.py:111-124``, ``test_2D_fully.py:73-81``)."""
import gzip
import struct

import numpy as np
import pytest

from cvssl_tpu.utils.nifti import load_nifti, save_nifti


@pytest.mark.parametrize("dtype,shape", [
    (np.float32, (5, 7, 9)),
    (np.uint8, (4, 6, 8)),
    (np.int16, (3, 5, 7)),
    (np.float32, (12, 10)),
])
def test_roundtrip(tmp_path, dtype, shape):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.floating):
        arr = rng.normal(size=shape).astype(dtype)
    else:
        arr = rng.integers(0, 100, shape).astype(dtype)
    path = str(tmp_path / "x.nii.gz")
    save_nifti(path, arr, spacing=(1.0, 1.0, 10.0))
    back, spacing = load_nifti(path)
    assert back.dtype == arr.dtype
    np.testing.assert_array_equal(back, arr)
    assert spacing[:len(shape)] == (1.0, 1.0, 10.0)[:len(shape)]


def test_header_fields_are_valid_nifti1(tmp_path):
    arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    path = str(tmp_path / "h.nii.gz")
    save_nifti(path, arr, spacing=(1.0, 1.0, 1.0))
    with gzip.open(path, "rb") as f:
        raw = f.read()
    assert struct.unpack_from("<i", raw, 0)[0] == 348       # sizeof_hdr
    assert raw[344:348] == b"n+1\x00"                       # magic
    dim = struct.unpack_from("<8h", raw, 40)
    assert dim[0] == 3 and tuple(dim[1:4]) == (4, 3, 2)     # x, y, z
    assert struct.unpack_from("<h", raw, 70)[0] == 16       # float32 code
    assert struct.unpack_from("<f", raw, 108)[0] == 352.0   # vox_offset
    # sform encodes spacing on the diagonal
    assert struct.unpack_from("<4f", raw, 280)[0] == 1.0
    # x-fastest voxel order: first row of the last slice
    data = np.frombuffer(raw, np.float32, count=24, offset=352)
    np.testing.assert_array_equal(data[:4], arr[0, 0, :])


def test_plain_nii_without_gzip(tmp_path):
    arr = np.ones((2, 2, 2), np.uint8)
    path = str(tmp_path / "p.nii")
    save_nifti(path, arr)
    with open(path, "rb") as f:
        assert f.read(4) == struct.pack("<i", 348)
    back, _ = load_nifti(path)
    np.testing.assert_array_equal(back, arr)


def test_unsupported_dtype_coerced_to_f32(tmp_path):
    arr = np.ones((2, 2), np.int64)
    path = str(tmp_path / "c.nii.gz")
    save_nifti(path, arr)
    back, _ = load_nifti(path)
    assert back.dtype == np.float32


def test_scl_slope_inter_applied(tmp_path):
    """A compliant third-party file with rescaling must load with the
    rescaled values (value = slope * stored + inter)."""
    arr = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    path = str(tmp_path / "scl.nii.gz")
    save_nifti(path, arr)
    import gzip
    with gzip.open(path, "rb") as f:
        raw = bytearray(f.read())
    struct.pack_into("<f", raw, 112, 2.5)   # scl_slope
    struct.pack_into("<f", raw, 116, -1.0)  # scl_inter
    with gzip.open(path, "wb") as f:
        f.write(bytes(raw))
    back, _ = load_nifti(path)
    assert back.dtype == np.float32
    np.testing.assert_allclose(back, arr.astype(np.float32) * 2.5 - 1.0)


def test_foreign_int8_and_uint16_read(tmp_path):
    """Read-only support for dtype codes we never write (int8=256,
    uint16=512)."""
    import gzip
    for code, dtype in ((256, np.int8), (512, np.uint16)):
        arr = np.arange(8).astype(dtype).reshape(2, 2, 2)
        path = str(tmp_path / f"dt{code}.nii.gz")
        save_nifti(path, arr.astype(np.int32))
        with gzip.open(path, "rb") as f:
            raw = bytearray(f.read())
        struct.pack_into("<h", raw, 70, code)            # datatype
        struct.pack_into("<h", raw, 72, arr.itemsize * 8)  # bitpix
        raw[352:] = arr.tobytes()
        with gzip.open(path, "wb") as f:
            f.write(bytes(raw))
        back, _ = load_nifti(path)
        assert back.dtype == dtype
        np.testing.assert_array_equal(back, arr)


def test_unsupported_datatype_code_raises(tmp_path):
    import gzip
    import pytest
    arr = np.ones((2, 2, 2), np.float32)
    path = str(tmp_path / "bad.nii.gz")
    save_nifti(path, arr)
    with gzip.open(path, "rb") as f:
        raw = bytearray(f.read())
    struct.pack_into("<h", raw, 70, 1536)  # float128 — unsupported
    with gzip.open(path, "wb") as f:
        f.write(bytes(raw))
    with pytest.raises(NotImplementedError, match="1536"):
        load_nifti(path)
