"""On-device exact EDT + surface metrics (ops/edt.py) vs the host scipy
implementation (ops/metrics.py, itself medpy-parity-tested)."""
import numpy as np
import pytest

from cvssl_tpu.ops import edt, metrics as M


def _blob_volume(rng, shape=(6, 48, 48), classes=(1, 2, 3), skip=None):
    lab = np.zeros(shape, np.uint8)
    yy, xx = np.mgrid[: shape[1], : shape[2]]
    for s in range(shape[0]):
        for c in classes:
            if c == skip:
                continue
            cy, cx = rng.integers(6, shape[1] - 6, 2)
            r = rng.integers(3, 10)
            lab[s][(yy - cy) ** 2 + (xx - cx) ** 2 < r * r] = c
    return lab


def test_squared_edt_matches_scipy():
    from scipy import ndimage
    rng = np.random.default_rng(3)
    mask = rng.random((5, 32, 32)) < 0.02
    mask[0, 0, 0] = True  # ensure nonempty
    ours = np.asarray(edt.squared_edt(mask))
    ref = ndimage.distance_transform_edt(~mask) ** 2
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_border_matches_scipy_erosion_semantics():
    from scipy import ndimage
    rng = np.random.default_rng(4)
    mask = rng.random((4, 24, 24)) < 0.3
    mask[:, :3] = True  # touch the array edge: border_value=0 semantics
    foot = ndimage.generate_binary_structure(3, 1)
    ref = mask ^ ndimage.binary_erosion(mask, structure=foot, iterations=1)
    ours = np.asarray(edt.border(mask))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("seed", [0, 1])
def test_val_metrics_device_matches_host(seed):
    rng = np.random.default_rng(seed)
    preds, labels = [], []
    for k in range(4):
        lab = _blob_volume(rng, skip=2 if k == 1 else None)
        pred = np.roll(lab, (1, 2), axis=(1, 2))
        pred[rng.random(pred.shape) < 0.01] = 0
        if k == 3:
            pred[pred == 3] = 0  # empty-pred guard: (0, 0) incl. dice
        preds.append(pred)
        labels.append(lab)
    dev = edt.val_metrics_device(preds, labels, 4)
    host = np.zeros((3, 2))
    for p, l in zip(preds, labels):
        host += np.asarray([M.calculate_metric_percase_val(p == c, l == c)
                            for c in (1, 2, 3)])
    np.testing.assert_allclose(dev, host, atol=1e-4)


def test_val_metrics_device_padding_is_exact():
    """Bucket zero-padding must not change the metrics (the correctness
    argument for batching ragged volumes)."""
    rng = np.random.default_rng(7)
    lab = _blob_volume(rng, shape=(5, 40, 52))
    pred = np.roll(lab, 1, axis=1)
    dev = edt.val_metrics_device([pred], [lab], 4)
    host = np.asarray([M.calculate_metric_percase_val(pred == c, lab == c)
                       for c in (1, 2, 3)])
    np.testing.assert_allclose(dev, host, atol=1e-4)


def test_evaluate_device_metrics_path():
    """val2d.evaluate(device_metrics=True) == host path on the same data."""
    from cvssl_tpu.eval import val2d
    rng = np.random.default_rng(9)
    data = []
    for _ in range(3):
        lab = _blob_volume(rng, shape=(4, 48, 48))
        img = lab.astype(np.float32) + rng.normal(0, .1, lab.shape)
        data.append({"image": img.astype(np.float32), "label": lab})

    def predict(batch):  # (B, 48, 48, 1) -> int map
        return np.clip(np.round(batch[..., 0]), 0, 3).astype(np.uint8)

    dev = val2d.evaluate(data, predict, 4, (48, 48), device_metrics=True)
    host = val2d.evaluate(data, predict, 4, (48, 48), device_metrics=False)
    np.testing.assert_allclose(dev, host, atol=1e-4)
