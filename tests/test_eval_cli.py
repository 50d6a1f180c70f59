"""Tests: test CLIs end-to-end on synthetic data, Gaussian sliding window,
post-processing."""
import os

import numpy as np
import pytest

from cvssl_tpu.data.synthetic import make_synthetic_acdc, make_synthetic_brats


class TestTest2DCLI:
    def test_inference_roundtrip(self, tmp_path):
        import jax
        from cvssl_tpu.eval import test_2d
        from cvssl_tpu.models import net_factory
        from cvssl_tpu.utils import checkpoint as ckpt
        import jax.numpy as jnp

        root = make_synthetic_acdc(str(tmp_path / "acdc"), num_cases=3,
                                   num_val=2, size=48)
        # synthesize test.list from the val volumes
        with open(os.path.join(root, "val.list")) as f:
            cases = f.read().split()
        with open(os.path.join(root, "test.list"), "w") as f:
            f.write("\n".join(cases) + "\n")

        flags = test_2d.build_parser().parse_args([
            "--root_path", root, "--exp", "smoke", "--model", "unet",
            "--num_classes", "4", "--labeled_num", "3",
            "--patch_size", "48", "48",
            "--snapshot_root", str(tmp_path / "model")])
        # save a random-init best checkpoint with the reference naming
        snapshot = os.path.join(str(tmp_path / "model"), "smoke_3_labeled",
                                "unet")
        os.makedirs(snapshot, exist_ok=True)
        net = net_factory("unet", in_chns=1, class_num=4)
        v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 1)),
                     train=False)
        ckpt.save_weights(os.path.join(snapshot, "unet_best_model.ckpt"),
                          jax.device_get(v["params"]))

        avg = test_2d.inference(flags)
        assert avg.shape[0] == 3  # classes 1..3
        assert np.all(np.isfinite(avg))
        pred_dir = snapshot + "_predictions"
        # reference export contract: {case}_{pred,img,gt}.nii.gz that
        # round-trip through the NIfTI reader with spacing (1,1,10)
        from cvssl_tpu.utils.nifti import load_nifti
        preds = [f for f in os.listdir(pred_dir) if f.endswith("_pred.nii.gz")]
        assert preds
        arr, spacing = load_nifti(os.path.join(pred_dir, preds[0]))
        assert spacing == (1.0, 1.0, 10.0)
        assert arr.ndim == 3 and np.isfinite(arr).all()


class TestTest3DCLI:
    def test_inference_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from cvssl_tpu.eval import test_3d
        from cvssl_tpu.models import net_factory_3d
        from cvssl_tpu.utils import checkpoint as ckpt

        root = make_synthetic_brats(str(tmp_path / "brats"), num_train=1,
                                    num_val=2, size=24)
        flags = test_3d.build_parser().parse_args([
            "--root_path", root, "--exp", "smoke3d", "--model", "vnet",
            "--num_classes", "2", "--labeled_num", "1",
            "--patch_size", "16", "16", "16", "--stride_xy", "8",
            "--stride_z", "8", "--snapshot_root", str(tmp_path / "model")])
        snapshot = os.path.join(str(tmp_path / "model"), "smoke3d_1_labeled",
                                "vnet")
        os.makedirs(snapshot, exist_ok=True)
        net = net_factory_3d("vnet", in_chns=1, class_num=2)
        v = net.init({"params": jax.random.PRNGKey(0),
                      "dropout": jax.random.PRNGKey(1)},
                     jnp.zeros((1, 16, 16, 16, 1)), train=False)
        ckpt.save_weights(os.path.join(snapshot, "vnet_best_model.ckpt"),
                          jax.device_get(v["params"]))
        mean = test_3d.inference(flags)
        assert mean.shape == (1, 4)
        assert os.path.exists(os.path.join(snapshot + "_predictions",
                                           "metrics.txt"))


class TestGaussianWindow:
    def test_importance_map(self):
        from cvssl_tpu.eval.val3d import gaussian_importance_map
        g = gaussian_importance_map((16, 16, 16))
        assert g.shape == (16, 16, 16)
        assert g.max() == pytest.approx(1.0)
        assert g.min() > 0
        assert g[8, 8, 8] == pytest.approx(1.0)

    def test_gaussian_evaluator_matches_uniform_argmax(self):
        import jax.numpy as jnp
        from cvssl_tpu.eval.val3d import SlidingWindowEvaluator

        def predict(patches):
            fg = (patches[..., 0] > 0.5).astype(jnp.float32)
            return jnp.stack([1 - fg, fg], axis=-1)

        rng = np.random.default_rng(0)
        vol = (rng.uniform(0, 1, (24, 24, 16)) > 0.5).astype(np.float32)
        for gaussian in (False, True):
            ev = SlidingWindowEvaluator(predict, (16, 16, 16), 2, 8, 8,
                                        gaussian=gaussian)
            pred = ev.predict_volume(vol)
            np.testing.assert_array_equal(pred, vol.astype(np.int32))


class TestPostProcessing:
    def test_small_components_removed(self):
        from cvssl_tpu.data.postprocess import post_processing
        pred = np.zeros((32, 32), np.int32)
        pred[4:20, 4:20] = 1   # big component (256 px)
        pred[28:30, 28:30] = 1  # small (4 px < 10%)
        out = post_processing(pred)
        assert out[10, 10] == 1
        assert out[28, 28] == 0
