"""2D per-volume validation — parity with ``code/val_2D.py:18-39``.

The reference loops slices one at a time with a host->GPU round trip per
slice. Here all slices of a volume go through ONE jitted batched forward
(padded to a bucket size so XLA compiles a handful of shapes, not one per
volume), then argmax comes back to host for the zoom-back + medpy-style
metrics (Dice + HD95, background excluded, empty-pred guard).
"""
from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
from scipy import ndimage

from cvssl_tpu.ops import metrics as M


def _bucket(n: int, sizes=(8, 16, 32, 64, 128, 256)) -> int:
    for s in sizes:
        if n <= s:
            return s
    return int(np.ceil(n / 256) * 256)


def _predict_volume(image: np.ndarray, predict_fn, patch_size):
    s, x, y = image.shape
    zoomed = ndimage.zoom(image, (1, patch_size[0] / x, patch_size[1] / y),
                          order=0)
    b = _bucket(s)
    batch = np.zeros((b, patch_size[0], patch_size[1], 1), np.float32)
    batch[:s, ..., 0] = zoomed
    pred_patch = np.asarray(predict_fn(batch))[:s]
    return ndimage.zoom(pred_patch,
                        (1, x / patch_size[0], y / patch_size[1]), order=0)


def test_single_volume(image: np.ndarray, label: np.ndarray,
                       predict_fn: Callable[[np.ndarray], np.ndarray],
                       classes: int,
                       patch_size: Sequence[int] = (256, 256)):
    """image/label: (S, H, W). predict_fn: batched (B, ph, pw, 1) float32 ->
    (B, ph, pw) int predictions (argmax already applied on device).
    Returns [(dice, hd95)] for classes 1..classes-1."""
    prediction = _predict_volume(image, predict_fn, patch_size)
    return [M.calculate_metric_percase_val(prediction == c, label == c)
            for c in range(1, classes)]


def evaluate(dataset, predict_fn, classes: int,
             patch_size: Sequence[int] = (256, 256),
             device_metrics: bool = None) -> np.ndarray:
    """Mean (dice, hd95) per foreground class over a val dataset of volumes
    (the reference's val loop, ``train_fully_supervised_2D.py:143-150``).

    ``device_metrics`` (default: auto — on unless running on CPU) computes
    dice + HD95 for all volumes/classes in one jitted call via the exact
    on-device EDT (``ops/edt.py``) instead of the per-volume scipy loop —
    host EDT on a 16-volume val set costs seconds per val pass and stalls
    training; the device path matches scipy to f32 interpolation noise."""
    if device_metrics is None:
        import jax
        device_metrics = jax.default_backend() != "cpu"
    if device_metrics:
        from cvssl_tpu.ops import edt
        samples = [dataset[i] for i in range(len(dataset))]
        shapes = {tuple(s["image"].shape) for s in samples}
        if len(shapes) == 1 and next(iter(shapes))[1:] == tuple(patch_size):
            # all-device path (uniform val sets at patch resolution, no
            # zoom): ONE forward dispatch for every slice of every volume
            # and the predictions never leave the device — the per-volume
            # loop paid a D2H prediction fetch + re-upload per volume
            # (~1.9 s of a ~2 s val pass through the tunnel at 16 volumes)
            n = len(samples)
            sv, xv, yv = next(iter(shapes))
            flat = _bucket(n * sv)
            batch = np.zeros((flat, xv, yv, 1), np.float32)
            batch[:n * sv, ..., 0] = np.stack(
                [s["image"] for s in samples]).reshape(n * sv, xv, yv)
            preds = predict_fn(batch)[:n * sv].reshape(n, sv, xv, yv)
            labels = np.stack([np.asarray(s["label"])
                               for s in samples]).astype(np.uint8)
            out = np.asarray(edt._jitted_val_metrics(
                (sv, xv, yv), classes)(preds.astype(np.uint8), labels))
            return out.sum(axis=0) / n
        preds, labels = [], []
        for sample in samples:
            preds.append(_predict_volume(sample["image"], predict_fn,
                                         patch_size).astype(np.uint8))
            labels.append(np.asarray(sample["label"]).astype(np.uint8))
        return edt.val_metrics_device(preds, labels, classes) / len(dataset)
    total = np.zeros((classes - 1, 2))
    for i in range(len(dataset)):
        sample = dataset[i]
        total += np.asarray(test_single_volume(
            sample["image"], sample["label"], predict_fn, classes,
            patch_size))
    return total / len(dataset)
