"""Tests for datasets, samplers, transforms, synthetic fixtures, pipeline."""
import numpy as np
import pytest

from cvssl_tpu.data import (DataPipeline, ShuffleBatchSampler, SliceDataset,
                            TwoStreamBatchSampler, VolumeDataset, collate,
                            patients_to_slices)
from cvssl_tpu.data import transforms as T
from cvssl_tpu.data.synthetic import make_synthetic_acdc, make_synthetic_brats


@pytest.fixture(scope="module")
def acdc_root(tmp_path_factory):
    return make_synthetic_acdc(str(tmp_path_factory.mktemp("acdc")))


@pytest.fixture(scope="module")
def brats_root(tmp_path_factory):
    return make_synthetic_brats(str(tmp_path_factory.mktemp("brats")))


class TestPatientsToSlices:
    def test_acdc_table(self):
        assert patients_to_slices("/data/ACDC", 7) == 136
        assert patients_to_slices("/data/ACDC", 140) == 1312

    def test_prostate_table(self):
        assert patients_to_slices("/data/Prostate", 8) == 120

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            patients_to_slices("/data/FooBar", 7)


class TestSliceDataset:
    def test_train_split(self, acdc_root):
        ds = SliceDataset(acdc_root, "train")
        assert len(ds) == 32  # 8 cases x 4 slices
        s = ds[0]
        assert s["image"].shape == (64, 64)
        assert s["image"].dtype == np.float32
        assert s["label"].shape == (64, 64)
        assert s["idx"] == 0

    def test_num_truncation(self, acdc_root):
        assert len(SliceDataset(acdc_root, "train", num=5)) == 5

    def test_val_split_volumes(self, acdc_root):
        ds = SliceDataset(acdc_root, "val")
        assert len(ds) == 2
        s = ds[0]
        assert s["image"].shape == (4, 64, 64)

    def test_transform_applied(self, acdc_root):
        ds = SliceDataset(acdc_root, "train",
                          transform=T.RandomGenerator((32, 32),
                                                      np.random.default_rng(0)))
        s = ds[0]
        assert s["image"].shape == (32, 32)
        assert s["label"].dtype == np.int32


class TestVolumeDataset:
    def test_splits(self, brats_root):
        tr = VolumeDataset(brats_root, "train")
        va = VolumeDataset(brats_root, "val")
        assert len(tr) == 4 and len(va) == 2
        assert tr[0]["image"].shape == (32, 32, 32)

    def test_crop_pipeline(self, brats_root):
        tf = T.Compose([T.RandomRotFlip3D(np.random.default_rng(0)),
                        T.RandomCrop((16, 16, 16),
                                     rng=np.random.default_rng(0))])
        ds = VolumeDataset(brats_root, "train", transform=tf)
        assert ds[0]["image"].shape == (16, 16, 16)


class TestSampler:
    def test_two_stream_composition(self):
        s = TwoStreamBatchSampler(list(range(10)), list(range(10, 100)),
                                  batch_size=8, secondary_batch_size=4,
                                  rng=np.random.default_rng(0))
        batches = list(iter(s))
        assert len(batches) == len(s) == 2  # 10 // 4
        for b in batches:
            assert len(b) == 8
            assert all(i < 10 for i in b[:4])
            assert all(i >= 10 for i in b[4:])

    def test_primary_seen_once_per_epoch(self):
        s = TwoStreamBatchSampler(list(range(8)), list(range(8, 20)),
                                  batch_size=6, secondary_batch_size=2,
                                  rng=np.random.default_rng(0))
        seen = [i for b in iter(s) for i in b[:4]]
        assert len(seen) == len(set(seen)) == 8

    def test_epochs_infinite(self):
        s = ShuffleBatchSampler(10, 4, np.random.default_rng(0))
        it = s.epochs()
        batches = [next(it) for _ in range(7)]
        assert all(len(b) == 4 for b in batches)


class TestTransforms:
    def test_random_generator_shapes(self, rng):
        t = T.RandomGenerator((32, 32), rng)
        out = t({"image": rng.random((48, 48), np.float32).astype(np.float32),
                 "label": rng.integers(0, 4, (48, 48)).astype(np.uint8)})
        assert out["image"].shape == (32, 32)
        assert out["label"].shape == (32, 32)

    def test_rot_flip_preserves_values(self, rng):
        img = np.arange(16.0).reshape(4, 4)
        out = T.random_rot_flip(rng, img)
        assert sorted(out.ravel()) == sorted(img.ravel())

    def test_color_jitter_stays_in_unit_range(self, rng):
        img = rng.random((16, 16)).astype(np.float32)
        out = T.color_jitter(rng, img)
        assert out.min() >= 0 and out.max() <= 1

    def test_weak_strong_keys(self, rng):
        t = T.WeakStrongAugment((32, 32), rng)
        out = t({"image": rng.random((48, 48)).astype(np.float32),
                 "label": rng.integers(0, 4, (48, 48)).astype(np.uint8)})
        assert set(out) >= {"image", "image_weak", "image_strong", "label_aug"}
        assert out["image_strong"].shape == (32, 32)

    def test_affine_matches_torchvision(self, rng):
        # order-0 affine should keep the value set (plus zeros from padding)
        img = rng.random((24, 24)).astype(np.float32)
        out = T.rand_affine(rng, img)
        assert out.shape == img.shape

    def test_gaussian_blur_smooths(self, rng):
        img = np.zeros((9, 9), np.float32)
        img[4, 4] = 1.0
        out = T.gaussian_blur(rng, img)
        assert out[4, 4] < 1.0 and out[3, 4] > 0

    def test_grid_mask_zeroes_squares(self, rng):
        img = np.ones((64, 64), np.float32)
        out = T.grid_mask(rng, img, prob=1.0)
        assert (out == 0).sum() > 0

    def test_center_crop_3d(self):
        t = T.CenterCrop((8, 8, 8))
        out = t({"image": np.ones((16, 16, 16), np.float32),
                 "label": np.ones((16, 16, 16), np.uint8)})
        assert out["image"].shape == (8, 8, 8)

    def test_random_crop_pads_small_volumes(self, rng):
        t = T.RandomCrop((16, 16, 16), rng=rng)
        out = t({"image": np.ones((8, 8, 8), np.float32),
                 "label": np.ones((8, 8, 8), np.uint8)})
        assert out["image"].shape == (16, 16, 16)

    def test_noise_bounded(self, rng):
        t = T.RandomNoise3D(sigma=0.1, rng=rng)
        out = t({"image": np.zeros((8, 8, 8), np.float32),
                 "label": np.zeros((8, 8, 8), np.uint8)})
        assert np.abs(out["image"]).max() <= 0.2 + 1e-6

    def test_onehot(self):
        t = T.CreateOnehotLabel(3)
        out = t({"image": np.zeros((4, 4, 4), np.float32),
                 "label": np.eye(4, dtype=np.uint8)[None].repeat(4, 0)})
        assert out["onehot_label"].shape == (4, 4, 4, 3)
        np.testing.assert_allclose(out["onehot_label"].sum(-1), 1.0)


class TestPipeline:
    def test_collate_nhwc(self, rng):
        samples = [{"image": rng.random((32, 32)).astype(np.float32),
                    "label": rng.integers(0, 4, (32, 32)), "idx": i}
                   for i in range(4)]
        batch = collate(samples)
        assert batch["image"].shape == (4, 32, 32, 1)
        assert batch["label"].shape == (4, 32, 32)
        assert batch["label"].dtype == np.int32

    def test_epoch_iteration(self, acdc_root):
        ds = SliceDataset(acdc_root, "train",
                          transform=T.RandomGenerator((32, 32),
                                                      np.random.default_rng(0)))
        pipe = DataPipeline(ds, ShuffleBatchSampler(len(ds), 8,
                                                    np.random.default_rng(0)))
        batches = list(iter(pipe))
        assert len(batches) == 4
        assert batches[0]["image"].shape == (8, 32, 32, 1)

    def test_stream_prefetch(self, acdc_root):
        ds = SliceDataset(acdc_root, "train",
                          transform=T.RandomGenerator((32, 32),
                                                      np.random.default_rng(0)))
        pipe = DataPipeline(ds, ShuffleBatchSampler(len(ds), 8,
                                                    np.random.default_rng(0)))
        it = pipe.stream()
        got = [next(it) for _ in range(10)]  # crosses epoch boundary
        assert all(b["image"].shape == (8, 32, 32, 1) for b in got)
        it.close()

    def test_pipeline_deterministic(self, acdc_root):
        """Two identically-seeded streams yield BYTE-identical batches.
        Regression: the original thread-pool loader let worker interleaving
        shuffle the shared transform Generator's draws between samples
        (nondeterministic batches -> irreproducible trajectories; the
        mean-teacher fit-parity flake)."""
        def pull(n=12):
            ds = SliceDataset(acdc_root, "train",
                              transform=T.RandomGenerator(
                                  (32, 32), np.random.default_rng(7)))
            pipe = DataPipeline(ds, ShuffleBatchSampler(
                len(ds), 8, np.random.default_rng(7)))
            it = pipe.stream()
            out = [next(it) for _ in range(n)]
            it.close()
            return out

        for a, b in zip(pull(), pull()):
            np.testing.assert_array_equal(a["image"], b["image"])
            np.testing.assert_array_equal(a["label"], b["label"])

    def test_two_stream_with_pipeline(self, acdc_root):
        ds = SliceDataset(acdc_root, "train",
                          transform=T.RandomGenerator((32, 32),
                                                      np.random.default_rng(0)))
        sampler = TwoStreamBatchSampler(list(range(8)), list(range(8, 32)),
                                        8, 4, np.random.default_rng(0))
        pipe = DataPipeline(ds, sampler)
        it = pipe.stream()
        b = next(it)
        assert b["image"].shape == (8, 32, 32, 1)
        assert np.all(b["idx"][:4] < 8) and np.all(b["idx"][4:] >= 8)
        it.close()
