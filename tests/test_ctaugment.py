"""CTAugment + contrastive_consistency tests."""
import numpy as np
import pytest

from cvssl_tpu.data import ctaugment as C


class TestCTAugment:
    def test_registry_split(self):
        keys = list(C.OPS.keys())
        assert len(keys) == 16
        assert keys[:9] == ["autocontrast", "brightness", "color", "contrast",
                            "equalize", "smooth", "blur", "sharpness",
                            "cutout"]
        assert "identity" in keys[9:]

    def test_policy_pools(self):
        cta = C.CTAugment()
        weak = cta.policy(probe=False, weak=True)
        strong = cta.policy(probe=False, weak=False)
        strong_pool = set(list(C.OPS.keys())[:9])
        assert all(op.f not in strong_pool for op in weak)
        assert all(op.f in strong_pool for op in strong)
        assert len(weak) == cta.random_depth_weak

    def test_rate_to_p_threshold(self):
        cta = C.CTAugment()
        rate = np.array([1.0, 0.5, 0.1], "f")
        p = cta.rate_to_p(rate)
        assert p[0] > 0 and p[2] == 0  # below threshold zeroed

    def test_update_rates_moves_toward_proximity(self):
        cta = C.CTAugment()
        pol = [C.OP("brightness", [0.5])]
        before = cta.rates["brightness"][0].copy()
        cta.update_rates(pol, proximity=0.0)
        after = cta.rates["brightness"][0]
        idx = int(0.5 * len(before) * 0.999)
        assert after[idx] < before[idx]

    def test_state_roundtrip(self):
        cta = C.CTAugment()
        cta.update_rates([C.OP("blur", [0.3])], 0.2)
        state = cta.state_dict()
        cta2 = C.CTAugment()
        cta2.load_state_dict(state)
        np.testing.assert_array_equal(cta2.rates["blur"][0],
                                      cta.rates["blur"][0])

    def test_apply_ops_runs(self):
        img = C._to_pil(np.random.default_rng(0).uniform(0, 1, (64, 64)))
        cta = C.CTAugment()
        for weak in (True, False):
            ops = cta.policy(probe=False, weak=weak)
            out = C.cta_apply(img, ops)
            assert out.size == (64, 64)

    def test_cta_transform_keys(self):
        cta = C.CTAugment()
        t = C.CTATransform((32, 32), cta)
        sample = {"image": np.random.default_rng(0).uniform(
            0, 1, (48, 48)).astype(np.float32),
            "label": np.random.default_rng(0).integers(0, 4, (48, 48))}
        out = t(sample, cta.policy(False, True), cta.policy(False, False))
        assert set(out) == {"image", "image_weak", "image_strong",
                            "label_aug", "label"}
        assert out["image_weak"].shape == (32, 32)
        assert out["image_weak"].max() <= 1.0


class TestContrastiveConsistencyMethod:
    def test_train_step(self):
        import jax
        from cvssl_tpu.train.config import TrainConfig
        from cvssl_tpu.train.engine import Engine
        cfg = TrainConfig(method="contrastive_consistency", model="unet",
                          model2="unet", num_classes=4, batch_size=8,
                          labeled_bs=4, patch_size=(32, 32),
                          max_iterations=100, labeled_slices_override=4)
        engine = Engine(cfg)
        rng = np.random.default_rng(0)
        img = rng.normal(size=(8, 32, 32, 1)).astype(np.float32)
        lab = rng.integers(0, 4, (8, 32, 32)).astype(np.int32)
        batch = {"image": img, "image_weak": img, "image_strong": img + .01,
                 "label": lab, "label_aug": lab,
                 "idx": np.arange(8, dtype=np.int32)}
        state = engine.init_state(jax.random.PRNGKey(0), batch)
        state, metrics = engine.train_step(state, batch)
        for k, v in jax.device_get(metrics).items():
            assert np.isfinite(float(v)), k
        # EMA link: projector1 moved toward projector3 (decay 0 at step 0 ->
        # equal after one step)
        p1 = jax.tree_util.tree_leaves(state.params["projector1"])
        p3 = jax.tree_util.tree_leaves(state.params["projector3"])
        for a, b in zip(p1, p3):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)

    def test_full_fit_with_cta_hooks(self, tmp_path):
        """End-to-end fit through the CTA data path: policy refresh per
        epoch, per-batch unfavorable-crop check, rate updates."""
        from cvssl_tpu.data.synthetic import make_synthetic_acdc
        from cvssl_tpu.train.config import TrainConfig
        from cvssl_tpu.train.engine import fit

        root = make_synthetic_acdc(str(tmp_path / "acdc"), num_cases=6,
                                   slices_per_case=2, size=32)
        cfg = TrainConfig(root_path=root, exp="smoke_cta",
                          method="contrastive_consistency", model="unet",
                          model2="unet", num_classes=4, max_iterations=4,
                          batch_size=4, labeled_bs=2,
                          labeled_slices_override=4, patch_size=(32, 32),
                          snapshot_root=str(tmp_path / "model"),
                          val_every=4, ckpt_every=100, num_workers=2)
        result = fit(cfg)
        assert result["iterations"] == 4

    def test_epoch_hooks(self):
        from cvssl_tpu.train.methods.base import get_method
        from cvssl_tpu.train.config import TrainConfig

        class DS:
            ops_weak = None
            ops_strong = None
        cfg = TrainConfig(method="contrastive_consistency")
        m = get_method("contrastive_consistency", cfg)
        ds = DS()
        m.on_epoch_start(ds, 0)
        assert ds.ops_weak and ds.ops_strong
        m.on_step_metrics({"loss": 1.0})
        m.on_epoch_end(ds)  # no crash; rates updated
