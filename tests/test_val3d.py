"""Sliding-window 3D inference tests + a 3D end-to-end fit smoke."""
import numpy as np
import pytest

from cvssl_tpu.eval import val3d
from cvssl_tpu.data.synthetic import make_synthetic_brats


class TestCornerGrid:
    def test_matches_reference_arithmetic(self):
        # val_3D.py:42-44: sx = ceil((ww - patch) / stride) + 1
        corners = val3d.compute_corners((144, 144, 96), (96, 96, 96), 64, 64)
        # x: ceil(48/64)+1 = 2 -> [0, 48]; same y; z: dim==patch -> [0]
        xs = sorted(set(c[0] for c in corners))
        assert xs == [0, 48]
        assert len(corners) == 2 * 2 * 1

    def test_volume_equal_patch(self):
        corners = val3d.compute_corners((96, 96, 96), (96, 96, 96), 64, 64)
        assert corners.shape == (1, 3)


class TestSlidingWindow:
    def _constant_predictor(self, num_classes=2):
        import jax.numpy as jnp

        def predict(patches):
            b = patches.shape[0]
            # class 1 wherever the input is > 0.5
            fg = (patches[..., 0] > 0.5).astype(jnp.float32)
            return jnp.stack([1 - fg, fg], axis=-1)
        return predict

    def test_predict_matches_thresholding(self):
        ev = val3d.SlidingWindowEvaluator(
            self._constant_predictor(), (16, 16, 16), 2, stride_xy=8,
            stride_z=8)
        rng = np.random.default_rng(0)
        vol = (rng.uniform(0, 1, (24, 20, 16)) > 0.5).astype(np.float32)
        pred = ev.predict_volume(vol)
        assert pred.shape == vol.shape
        np.testing.assert_array_equal(pred, vol.astype(np.int32))

    def test_small_volume_padded(self):
        ev = val3d.SlidingWindowEvaluator(
            self._constant_predictor(), (16, 16, 16), 2, stride_xy=8,
            stride_z=8)
        vol = np.ones((8, 8, 8), np.float32)
        pred = ev.predict_volume(vol)
        assert pred.shape == (8, 8, 8)
        np.testing.assert_array_equal(pred, 1)

    def test_overlapping_windows_average(self):
        # predictor that returns softmax .6/.4 for fg everywhere: averaging
        # any number of overlaps keeps argmax stable
        import jax.numpy as jnp

        def predict(patches):
            b = patches.shape[0]
            shape = patches.shape[:-1]
            return jnp.stack([jnp.full(shape, 0.4), jnp.full(shape, 0.6)],
                             axis=-1)
        ev = val3d.SlidingWindowEvaluator(predict, (16, 16, 16), 2, 8, 8)
        pred = ev.predict_volume(np.zeros((32, 32, 32), np.float32))
        np.testing.assert_array_equal(pred, 1)


class TestEndToEnd3D:
    def test_fit_3d_supervised(self, tmp_path):
        from cvssl_tpu.train.config import TrainConfig
        from cvssl_tpu.train.engine import fit
        root = make_synthetic_brats(str(tmp_path / "brats"), num_train=4,
                                    num_val=1, size=24)
        cfg = TrainConfig(root_path=root, exp="smoke3d", model="vnet",
                          method="supervised", num_classes=2, dim=3,
                          max_iterations=2, batch_size=2, labeled_bs=1,
                          labeled_num=4, patch_size=(16, 16, 16),
                          snapshot_root=str(tmp_path / "model"),
                          val_every=2, ckpt_every=1000, num_workers=2)
        result = fit(cfg)
        assert result["iterations"] == 2
        assert np.isfinite(list(result["best_dice"].values())[0])

    def test_fit_3d_mean_teacher(self, tmp_path):
        from cvssl_tpu.train.config import TrainConfig
        from cvssl_tpu.train.engine import fit
        root = make_synthetic_brats(str(tmp_path / "brats"), num_train=4,
                                    num_val=1, size=24)
        cfg = TrainConfig(root_path=root, exp="smoke3d_mt", model="unet_3D",
                          method="mean_teacher", num_classes=2, dim=3,
                          max_iterations=2, batch_size=4, labeled_bs=2,
                          labeled_num=2, total_num=4,
                          patch_size=(16, 16, 16),
                          snapshot_root=str(tmp_path / "model"),
                          val_every=2, ckpt_every=1000, num_workers=2)
        result = fit(cfg)
        assert result["iterations"] == 2
