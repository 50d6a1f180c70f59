"""End-to-end preprocessing on real .nii.gz files — possible fully offline
now that utils/nifti.py provides the reader (closes the round-1 'NIfTI IO
gated, untested' gap for acdc_data_processing.py / brats_proprecessing.py)."""
import os

import h5py
import numpy as np

from cvssl_tpu.data import preprocessing as pp
from cvssl_tpu.utils.nifti import save_nifti


def test_process_acdc_from_nifti(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.uniform(10, 200, (5, 32, 28)).astype(np.float32)
    lab = rng.integers(0, 4, (5, 32, 28)).astype(np.uint8)
    src = tmp_path / "raw"
    src.mkdir()
    save_nifti(str(src / "patient001_image.nii.gz"), img)
    save_nifti(str(src / "patient001_label_gt.nii.gz"), lab)
    out = str(tmp_path / "slices")

    n = pp.process_acdc(str(src), out)
    assert n == 5
    with h5py.File(os.path.join(out, "patient001_image_slice_2.h5")) as f:
        got_img = f["image"][:]
        got_lab = f["label"][:]
    np.testing.assert_allclose(got_img, pp.minmax_normalize(img)[2],
                               rtol=1e-6)
    np.testing.assert_array_equal(got_lab, lab[2])


def test_process_brats_from_nifti(tmp_path):
    rng = np.random.default_rng(1)
    img = np.zeros((16, 16, 16), np.float32)
    img[4:12, 4:12, 4:12] = rng.uniform(50, 500, (8, 8, 8))
    seg = np.zeros((16, 16, 16), np.uint8)
    seg[6:10, 6:10, 6:10] = 2
    src = tmp_path / "raw"
    src.mkdir()
    save_nifti(str(src / "caseA_flair.nii.gz"), img)
    save_nifti(str(src / "caseA_seg.nii.gz"), seg)
    out = str(tmp_path / "vols")

    n = pp.process_brats(str(src), out)
    assert n == 1
    with h5py.File(os.path.join(out, "caseA.h5")) as f:
        got_img = f["image"][:]
        got_lab = f["label"][:]
    want_img, want_lab = pp.process_brats_volume(img, seg)
    np.testing.assert_allclose(got_img, want_img, rtol=1e-6)
    np.testing.assert_array_equal(got_lab, want_lab)
    assert set(np.unique(got_lab)) <= {0, 1}
