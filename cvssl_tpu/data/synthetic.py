"""Synthetic dataset fixtures matching the reference on-disk contracts.

Creates tiny ACDC-style (2D slices) and BraTS-style (3D volumes) h5 trees so
train/eval paths run on CPU in tests and smoke runs — the reference ships no
fixtures at all (SURVEY §4).
"""
from __future__ import annotations

import os

import h5py
import numpy as np


def _blob_image(rng, shape, num_classes):
    """Image with class-correlated blobs so training can actually learn."""
    label = np.zeros(shape, np.uint8)
    image = rng.normal(0.3, 0.1, shape).astype(np.float32)
    for c in range(1, num_classes):
        center = [rng.integers(s // 4, 3 * s // 4) for s in shape]
        radius = max(min(shape) // 6, 2)
        grids = np.ogrid[tuple(slice(0, s) for s in shape)]
        dist = sum((g - ctr) ** 2 for g, ctr in zip(grids, center))
        mask = dist <= radius ** 2
        label[mask] = c
        image[mask] += 0.2 * c
    image = np.clip(image, 0, 1)
    return image, label


def make_synthetic_acdc(root: str, num_cases: int = 8,
                        slices_per_case: int = 4, num_val: int = 2,
                        size: int = 64, num_classes: int = 4,
                        seed: int = 0) -> str:
    """ACDC-style tree: data/slices/{case}_slice_{i}.h5 (2D), data/{case}.h5
    (3D stack for val), train_slices.list, val.list. Returns root."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "data", "slices"), exist_ok=True)
    train_lines, val_lines = [], []
    for ci in range(num_cases):
        case = f"patient{ci:03d}"
        vol_img, vol_lab = [], []
        for si in range(slices_per_case):
            img, lab = _blob_image(rng, (size, size), num_classes)
            vol_img.append(img)
            vol_lab.append(lab)
            name = f"{case}_slice_{si}"
            with h5py.File(os.path.join(root, "data", "slices",
                                        f"{name}.h5"), "w") as f:
                f.create_dataset("image", data=img)
                f.create_dataset("label", data=lab)
            train_lines.append(name)
        with h5py.File(os.path.join(root, "data", f"{case}.h5"), "w") as f:
            f.create_dataset("image", data=np.stack(vol_img))
            f.create_dataset("label", data=np.stack(vol_lab))
        if ci < num_val:
            val_lines.append(case)
    with open(os.path.join(root, "train_slices.list"), "w") as f:
        f.write("\n".join(train_lines) + "\n")
    with open(os.path.join(root, "val.list"), "w") as f:
        f.write("\n".join(val_lines) + "\n")
    return root


def make_synthetic_brats(root: str, num_train: int = 4, num_val: int = 2,
                         size: int = 32, seed: int = 0, num_test: int = 0
                         ) -> str:
    """BraTS-style tree: data/{name}.h5 volumes, train/val/test.txt lists
    (test.txt mirrors the real tree's held-out split, test_3D.py:33; when
    num_test == 0 it aliases the val cases so test CLIs stay runnable)."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    lines = {"train": [], "val": [], "test": []}
    for i in range(num_train + num_val + num_test):
        name = f"case_{i:03d}"
        img, lab = _blob_image(rng, (size, size, size), 2)
        with h5py.File(os.path.join(root, "data", f"{name}.h5"), "w") as f:
            f.create_dataset("image", data=img)
            f.create_dataset("label", data=lab)
        split = ("train" if i < num_train
                 else "val" if i < num_train + num_val else "test")
        lines[split].append(name)
    if not lines["test"]:
        lines["test"] = list(lines["val"])
    for split, names in lines.items():
        with open(os.path.join(root, f"{split}.txt"), "w") as f:
            f.write("\n".join(names) + "\n")
    return root
