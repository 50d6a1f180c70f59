"""h5 slice/volume datasets + label-budget tables.

Parity with the reference data layer:
* ``SliceDataset`` mirrors ``BaseDataSets`` (``dataset.py:24-76``): list files
  ``train_slices.list`` / ``val.list``; train slices at ``data/slices/{case}.h5``,
  val volumes at ``data/{case}.h5``; each h5 holds ``image`` and ``label``.
* ``VolumeDataset`` mirrors ``BraTS2019`` (``brats2019.py:11-46``): ``train.txt``
  / ``val.txt`` lists (first comma field), volumes at ``data/{name}.h5``.
* ``patients_to_slices`` mirrors the table duplicated in every 2D trainer
  (``train_fully_supervised_2D.py:54-64``) — including FIXING the reference
  bug where the 'Prostate' branch is always-true (SURVEY §8): here unknown
  dataset names raise instead of silently using the Prostate table.

No torch: samples are numpy dicts; transforms are callables from
``cvssl_tpu.data.transforms``.
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import h5py
import numpy as np

ACDC_SLICE_TABLE = {1: 32, 3: 68, 7: 136, 14: 256, 21: 396, 28: 512,
                    35: 664, 140: 1312}
PROSTATE_SLICE_TABLE = {2: 27, 4: 53, 8: 120, 12: 179, 16: 256, 21: 312,
                        42: 623}


def patients_to_slices(dataset: str, patients_num) -> int:
    """Map a labeled-patient budget to a slice count."""
    name = os.path.basename(os.path.normpath(str(dataset))) or str(dataset)
    if "ACDC" in str(dataset):
        table = ACDC_SLICE_TABLE
    elif "Prostate" in str(dataset):
        table = PROSTATE_SLICE_TABLE
    else:
        raise ValueError(f"no slice table for dataset {name!r}")
    return table[int(patients_num)]


class SliceDataset:
    """2D per-slice dataset (ACDC / Prostate layout)."""

    def __init__(self, base_dir: str, split: str = "train",
                 num: Optional[int] = None,
                 transform: Optional[Callable] = None,
                 ops_weak=None, ops_strong=None):
        if bool(ops_weak) != bool(ops_strong):
            raise ValueError("provide both weak and strong CTAugment policies")
        self.base_dir = base_dir
        self.split = split
        self.transform = transform
        self.ops_weak = ops_weak
        self.ops_strong = ops_strong
        list_file = "train_slices.list" if split == "train" else "val.list"
        with open(os.path.join(base_dir, list_file)) as f:
            self.sample_list = [ln.strip() for ln in f if ln.strip()]
        if num is not None and split == "train":
            self.sample_list = self.sample_list[:num]

    def __len__(self):
        return len(self.sample_list)

    def case_path(self, case: str) -> str:
        sub = "data/slices" if self.split == "train" else "data"
        return os.path.join(self.base_dir, sub, f"{case}.h5")

    def __getitem__(self, idx: int) -> dict:
        case = self.sample_list[idx]
        with h5py.File(self.case_path(case), "r") as h5f:
            image = h5f["image"][:]
            label = h5f["label"][:]
        sample = {"image": image.astype(np.float32), "label": label,
                  "case": case}
        if self.transform is not None:
            if self.ops_weak is not None:
                sample = self.transform(sample, self.ops_weak, self.ops_strong)
            else:
                sample = self.transform(sample)
        sample["idx"] = idx
        return sample


class VolumeDataset:
    """3D volume dataset (BraTS2019 layout)."""

    def __init__(self, base_dir: str, split: str = "train",
                 num: Optional[int] = None,
                 transform: Optional[Callable] = None):
        self.base_dir = base_dir
        self.transform = transform
        # train.txt / val.txt / test.txt — the test split is what the
        # reference's test_3D.py:33 evaluates (test_list="test.txt").
        list_file = {"train": "train.txt", "val": "val.txt",
                     "test": "test.txt"}[split]
        with open(os.path.join(base_dir, list_file)) as f:
            self.image_list = [ln.strip().split(",")[0] for ln in f
                               if ln.strip()]
        if num is not None:
            self.image_list = self.image_list[:num]

    def __len__(self):
        return len(self.image_list)

    def case_path(self, name: str) -> str:
        return os.path.join(self.base_dir, "data", f"{name}.h5")

    def __getitem__(self, idx: int) -> dict:
        name = self.image_list[idx]
        with h5py.File(self.case_path(name), "r") as h5f:
            image = h5f["image"][:]
            label = h5f["label"][:]
        sample = {"image": image.astype(np.float32),
                  "label": label.astype(np.uint8), "case": name}
        if self.transform is not None:
            sample = self.transform(sample)
        sample["idx"] = idx
        return sample
