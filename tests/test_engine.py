"""End-to-end engine tests on synthetic ACDC (CPU, 8 virtual devices)."""
import dataclasses
import os

import jax
import numpy as np
import pytest

from cvssl_tpu.data import DataPipeline, ShuffleBatchSampler, SliceDataset
from cvssl_tpu.data import transforms as T
from cvssl_tpu.data.synthetic import make_synthetic_acdc
from cvssl_tpu.train.config import TrainConfig
from cvssl_tpu.train.engine import Engine, fit


@pytest.fixture(scope="module")
def acdc_root(tmp_path_factory):
    return make_synthetic_acdc(str(tmp_path_factory.mktemp("acdc")),
                               num_cases=8, slices_per_case=4, size=64)


def small_cfg(root, tmp, **kw):
    base = dict(root_path=root, exp="smoke", model="unet", method="supervised",
                num_classes=4, max_iterations=8, batch_size=8, labeled_bs=4,
                base_lr=0.01, patch_size=(64, 64), labeled_num=1,
                labeled_slices_override=16, snapshot_root=str(tmp),
                val_every=4, ckpt_every=8, num_workers=2)
    base.update(kw)
    return TrainConfig(**base)


class TestEngineStep:
    def test_supervised_step_and_loss_decreases(self, acdc_root, tmp_path):
        cfg = small_cfg(acdc_root, tmp_path)
        engine = Engine(cfg)
        rng_np = np.random.default_rng(0)
        ds = SliceDataset(acdc_root, "train",
                          transform=T.RandomGenerator((64, 64), rng_np))
        pipe = DataPipeline(ds, ShuffleBatchSampler(len(ds), 8, rng_np),
                            num_workers=2)
        batches = list(iter(pipe))
        state = engine.init_state(jax.random.PRNGKey(0), batches[0])
        losses = []
        for i in range(30):
            state, metrics = engine.train_step(state,
                                               batches[i % len(batches)])
            losses.append(float(metrics["loss"]))
        assert int(state.step) == 30
        assert np.mean(losses[-5:]) < np.mean(losses[:5])

    def test_mean_teacher_step(self, acdc_root, tmp_path):
        cfg = small_cfg(acdc_root, tmp_path, method="mean_teacher")
        engine = Engine(cfg)
        rng_np = np.random.default_rng(0)
        ds = SliceDataset(acdc_root, "train",
                          transform=T.RandomGenerator((64, 64), rng_np))
        pipe = DataPipeline(ds, ShuffleBatchSampler(len(ds), 8, rng_np),
                            num_workers=2)
        batch = next(iter(pipe))
        state = engine.init_state(jax.random.PRNGKey(0), batch)
        # teacher initialized as student copy
        tp = jax.tree_util.tree_leaves(state.teacher_params["model"])
        sp = jax.tree_util.tree_leaves(state.params["model"])
        for a, b in zip(tp, sp):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        state, metrics = engine.train_step(state, batch)
        assert "consistency_loss" in metrics
        # after one step teacher == new student (decay 0 at step 0)
        tp = jax.tree_util.tree_leaves(state.teacher_params["model"])
        sp = jax.tree_util.tree_leaves(state.params["model"])
        for a, b in zip(tp, sp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)

    def test_train_steps_fixed_matches_step_count(self, acdc_root, tmp_path):
        # bench/probe path: K scanned steps over one fixed batch advance
        # state.step by K and return finite last-step metrics
        cfg = small_cfg(acdc_root, tmp_path, method="mean_teacher")
        engine = Engine(cfg)
        rng_np = np.random.default_rng(0)
        ds = SliceDataset(acdc_root, "train",
                          transform=T.RandomGenerator((64, 64), rng_np))
        pipe = DataPipeline(ds, ShuffleBatchSampler(len(ds), 8, rng_np))
        batch = next(iter(pipe))
        state = engine.init_state(jax.random.PRNGKey(0), batch)
        state, metrics = engine.train_steps_fixed(state, batch, 3)
        assert int(state.step) == 3
        assert np.isfinite(float(metrics["loss"]))

    def test_validate(self, acdc_root, tmp_path):
        cfg = small_cfg(acdc_root, tmp_path)
        engine = Engine(cfg)
        rng_np = np.random.default_rng(0)
        ds = SliceDataset(acdc_root, "train",
                          transform=T.RandomGenerator((64, 64), rng_np))
        pipe = DataPipeline(ds, ShuffleBatchSampler(len(ds), 8, rng_np))
        batch = next(iter(pipe))
        state = engine.init_state(jax.random.PRNGKey(0), batch)
        val_ds = SliceDataset(acdc_root, "val")
        perf = engine.validate(state, val_ds)
        assert perf.shape == (3, 2)
        assert np.all(np.isfinite(perf))

    def test_resident_val_matches_evaluate(self, acdc_root, tmp_path):
        # the device-resident val path (upload-once + fused fwd->EDT, used
        # on TPU) must equal val2d.evaluate's all-device path exactly —
        # same bucket padding, same jitted metrics, zero re-upload
        from cvssl_tpu.eval import val2d
        cfg = small_cfg(acdc_root, tmp_path)
        engine = Engine(cfg)
        rng_np = np.random.default_rng(0)
        ds = SliceDataset(acdc_root, "train",
                          transform=T.RandomGenerator((64, 64), rng_np))
        pipe = DataPipeline(ds, ShuffleBatchSampler(len(ds), 8, rng_np))
        batch = next(iter(pipe))
        state = engine.init_state(jax.random.PRNGKey(0), batch)
        val_ds = SliceDataset(acdc_root, "val")
        baseline = val2d.evaluate(val_ds, engine.predict_fn("model", state),
                                  cfg.num_classes, cfg.patch_size,
                                  device_metrics=True)
        engine._resident_val = True  # CPU default is off; force the path
        resident = engine.validate(state, val_ds)
        store = engine._val_store[(id(val_ds), tuple(cfg.patch_size))]
        assert store is not None, "resident store should engage here"
        np.testing.assert_allclose(resident, baseline, rtol=1e-6, atol=1e-6)
        # second call reuses the cached store (no rebuild)
        again = engine.validate(state, val_ds)
        np.testing.assert_array_equal(again, resident)


class TestFit:
    def test_fit_supervised_smoke(self, acdc_root, tmp_path):
        cfg = small_cfg(acdc_root, tmp_path)
        result = fit(cfg)
        assert result["iterations"] == 8
        assert result["slices_per_sec"] > 0
        import os
        snap = cfg.snapshot_path()
        assert os.path.exists(os.path.join(snap, "log.txt"))
        assert os.path.exists(os.path.join(snap, "log", "metrics.jsonl"))
        # periodic full-state checkpoint written at iter 8
        assert any(f.startswith("model_iter_") for f in os.listdir(snap))

    def test_fit_mean_teacher_smoke(self, acdc_root, tmp_path):
        cfg = small_cfg(acdc_root, tmp_path, method="mean_teacher",
                        exp="smoke_mt")
        result = fit(cfg)
        assert result["iterations"] == 8

    def test_fit_fixmatch_device_weak_strong(self, acdc_root, tmp_path):
        # exercises the device-store weak/strong path end to end
        cfg = small_cfg(acdc_root, tmp_path, method="fixmatch",
                        exp="smoke_fixmatch")
        result = fit(cfg)
        assert result["iterations"] == 8

    def test_fit_fixmatch_host_path(self, acdc_root, tmp_path):
        cfg = small_cfg(acdc_root, tmp_path, method="fixmatch",
                        exp="smoke_fixmatch_host", device_data=False)
        result = fit(cfg)
        assert result["iterations"] == 8

    def test_fit_adversarial_validates_generator_only(self, acdc_root,
                                                      tmp_path):
        cfg = small_cfg(acdc_root, tmp_path, method="adversarial",
                        exp="smoke_adv")
        result = fit(cfg)
        assert result["iterations"] == 8
        assert set(result["best_dice"]) == {"model"}

    def test_fit_scan_steps_fused(self, acdc_root, tmp_path):
        # K-step lax.scan fusion: same iteration count, boundaries respected
        cfg = small_cfg(acdc_root, tmp_path, exp="smoke_scan",
                        scan_steps=4, log_every=4)
        result = fit(cfg)
        assert result["iterations"] == 8
        assert int(result["state"].step) == 8

    def test_resume_from_checkpoint(self, acdc_root, tmp_path):
        cfg = small_cfg(acdc_root, tmp_path, exp="resume", max_iterations=8,
                        ckpt_every=8)
        first = fit(cfg)
        cfg2 = dataclasses.replace(cfg, max_iterations=12)
        result = fit(cfg2)
        assert result["iterations"] == 12
        # best_dice survives resume: the resumed run can only improve on the
        # first run's best (the reference resets it to 0 and can overwrite
        # {model}_best_model.ckpt with a worse model)
        for name, d in first["best_dice"].items():
            assert result["best_dice"][name] >= d

    def test_restore_legacy_raw_state_checkpoint(self, acdc_root, tmp_path):
        """Pre-meta checkpoints held raw state bytes (no {state, meta}
        wrapper); restore_latest must fall back to that layout."""
        from flax import serialization
        from cvssl_tpu.utils import checkpoint as ckpt

        cfg = small_cfg(acdc_root, tmp_path, exp="legacy", max_iterations=4,
                        ckpt_every=4)
        result = fit(cfg)
        state = ckpt.to_host(result["state"])
        snapshot = cfg.snapshot_path()
        # rewrite the newest checkpoint in the legacy raw-state layout
        import glob as _glob
        path = sorted(_glob.glob(os.path.join(snapshot,
                                              "model_iter_*.ckpt")))[-1]
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(state))
        restored, it, meta = ckpt.restore_latest(
            snapshot, state, meta_target={"best_dice": {"model": 0.0}})
        assert it == 4 and meta == {}
        np.testing.assert_array_equal(np.asarray(restored.step),
                                      np.asarray(state.step))

    def test_profile_dir_writes_trace(self, acdc_root, tmp_path):
        """--profile_dir captures a TB-profile trace of steps 10-20."""
        prof = str(tmp_path / "prof")
        cfg = small_cfg(acdc_root, tmp_path, exp="prof", max_iterations=24,
                        profile_dir=prof)
        fit(cfg)
        import glob as _glob
        traces = _glob.glob(os.path.join(prof, "**", "*.trace.json.gz"),
                            recursive=True) + \
            _glob.glob(os.path.join(prof, "**", "*.xplane.pb"),
                       recursive=True)
        assert traces, f"no trace files under {prof}"


class TestWeightsArtifactsAndProstate:
    def test_fit_weights_artifacts_contract(self, acdc_root, tmp_path):
        """Reference weights-file contract (train_mean_teacher_2D.py:295-304):
        every ckpt_every interval writes raw student weights (iter_{k}.ckpt)
        AND the EMA teacher's (ema_model_iter_{k}.ckpt) alongside the
        full-state model_iter_{k}.ckpt; both load as plain weight trees."""
        import jax.numpy as jnp
        from cvssl_tpu.utils import checkpoint as ckpt

        cfg = small_cfg(acdc_root, tmp_path, method="mean_teacher",
                        exp="smoke_mt_artifacts")
        result = fit(cfg)
        snap = cfg.snapshot_path()
        names = os.listdir(snap)
        assert "iter_8.ckpt" in names, names
        assert "ema_model_iter_8.ckpt" in names, names
        state = result["state"]
        template = jax.device_get(state.teacher_params["model"])
        loaded = ckpt.load_weights(
            os.path.join(snap, "ema_model_iter_8.ckpt"), template)
        for a, b in zip(jax.tree_util.tree_leaves(loaded),
                        jax.tree_util.tree_leaves(template)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_fit_and_eval_prostate_2class(self, tmp_path):
        """Prostate recipe end to end (reference README rows: 2 classes,
        patients_to_slices Prostate table): fit a mean-teacher run with
        labeled_num=2 (-> 27 labeled slices via the table), then round-trip
        the saved best checkpoint through the test_2d CLI."""
        from cvssl_tpu.data.synthetic import make_synthetic_acdc
        from cvssl_tpu.eval import test_2d

        root = make_synthetic_acdc(str(tmp_path / "Prostate"), num_cases=8,
                                   slices_per_case=4, size=64, num_classes=2)
        cfg = TrainConfig(
            root_path=root, exp="smoke_prostate", model="unet",
            method="mean_teacher", num_classes=2, max_iterations=8,
            batch_size=8, labeled_bs=4, base_lr=0.01, patch_size=(64, 64),
            labeled_num=2, snapshot_root=str(tmp_path / "snap"),
            val_every=4, ckpt_every=8, num_workers=2)
        assert cfg.labeled_slices == 27  # the Prostate table row for "2"
        result = fit(cfg)
        assert result["iterations"] == 8
        assert "model" in result["best_dice"]

        snap = cfg.snapshot_path()
        assert os.path.exists(os.path.join(snap, "unet_best_model.ckpt"))
        with open(os.path.join(root, "val.list")) as f:
            cases = f.read().split()
        with open(os.path.join(root, "test.list"), "w") as f:
            f.write("\n".join(cases) + "\n")
        flags = test_2d.build_parser().parse_args([
            "--root_path", root, "--exp", "smoke_prostate", "--model",
            "unet", "--num_classes", "2", "--labeled_num", "2",
            "--patch_size", "64", "64",
            "--snapshot_root", str(tmp_path / "snap")])
        avg = test_2d.inference(flags)
        assert avg.shape[0] == 1  # one foreground class
        assert np.all(np.isfinite(avg))


def test_validate_3d_reuses_cached_evaluator():
    """Engine.validate (dim=3) routes through ONE cached
    SlidingWindowEvaluator with the weights as program ARGUMENTS — two
    validate calls with different weights reuse the same compiled program
    (a per-pass closure baked weights in as constants and recompiled every
    validation)."""
    import jax
    import numpy as np

    from cvssl_tpu.train.config import TrainConfig
    from cvssl_tpu.train.engine import Engine

    cfg = TrainConfig(method="mean_teacher", model="unet_3D", dim=3,
                      num_classes=2, batch_size=2, labeled_bs=1,
                      labeled_slices_override=1, patch_size=(32, 32, 32),
                      num_devices=1)
    engine = Engine(cfg)
    rng = np.random.default_rng(0)
    b = {"image": rng.normal(size=(2, 32, 32, 32, 1)).astype(np.float32),
         "label": rng.integers(0, 2, (2, 32, 32, 32)).astype(np.int32),
         "idx": np.arange(2, dtype=np.int32)}
    state = engine.init_state(jax.random.PRNGKey(0), b)

    class _ValSet:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            r = np.random.default_rng(10 + i)
            img = r.normal(0.5, 0.2, (36, 40, 33)).astype(np.float32)
            lab = (img > 0.6).astype(np.int64)
            return {"image": img, "label": lab}

    perf1 = engine.validate(state, _ValSet())
    ev = engine._val_fns[("sw3d", "model", (32, 32, 32))]
    state, _ = engine.train_step(state, b)  # weights move
    perf2 = engine.validate(state, _ValSet())
    assert engine._val_fns[("sw3d", "model", (32, 32, 32))] is ev
    assert perf1.shape == perf2.shape == (1, 2)
    assert np.isfinite(perf1[:, 0]).all() and np.isfinite(perf2[:, 0]).all()
