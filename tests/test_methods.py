"""One engine train-step per SSL method (CPU, 8 virtual devices)."""
import jax
import numpy as np
import pytest

from cvssl_tpu.train.config import TrainConfig
from cvssl_tpu.train.engine import Engine
from cvssl_tpu.train.methods.base import available_methods


def make_batch(rng, batch_size=8, size=32, classes=4, weak_strong=False):
    img = rng.normal(size=(batch_size, size, size, 1)).astype(np.float32)
    lab = rng.integers(0, classes, (batch_size, size, size)).astype(np.int32)
    batch = {"image": img, "label": lab,
             "idx": np.arange(batch_size, dtype=np.int32)}
    if weak_strong:
        batch["image_weak"] = img
        batch["image_strong"] = img + 0.01
        batch["label_aug"] = lab
    return batch


def run_steps(method, n_steps=2, **cfg_kw):
    cfg = TrainConfig(method=method, model="unet", model2="unet",
                      num_classes=4, batch_size=8, labeled_bs=4,
                      patch_size=(32, 32), max_iterations=100,
                      labeled_slices_override=4, **cfg_kw)
    engine = Engine(cfg)
    rng = np.random.default_rng(0)
    weak_strong = engine.method.transform == "weak_strong"
    batch = make_batch(rng, weak_strong=weak_strong)
    state = engine.init_state(jax.random.PRNGKey(0), batch)
    metrics = None
    for _ in range(n_steps):
        state, metrics = engine.train_step(state, batch)
    return state, {k: float(v) for k, v in jax.device_get(metrics).items()}


METHODS = ["supervised", "mean_teacher", "uamt", "cps", "cross_teaching",
           "ict", "deep_co_training", "fixmatch", "adversarial",
           "cnn_meet_vit", "tripleview", "exam_student_teacher",
           "adversarial_consistency", "contrastive_cross", "cct", "urpc"]


@pytest.mark.parametrize("method", METHODS)
def test_method_step_runs_and_finite(method):
    state, metrics = run_steps(method)
    assert int(state.step) == 2
    for k, v in metrics.items():
        assert np.isfinite(v), f"{method}: {k} not finite: {v}"
    assert "loss" in metrics


def test_all_reference_strategies_registered():
    av = available_methods()
    for m in METHODS:
        assert m in av


def test_uamt_mask_fraction_bounded():
    _, metrics = run_steps("uamt")
    assert 0.0 <= metrics["uncertainty_mask_frac"] <= 1.0


def test_adversarial_trains_dan():
    state, metrics = run_steps("adversarial")
    assert "loss_d" in metrics and "dan_acc" in metrics


def test_contrastive_heads_stay_frozen():
    state, _ = run_steps("contrastive_cross", n_steps=2)
    import jax as _jax
    from cvssl_tpu.train.config import TrainConfig
    from cvssl_tpu.train.engine import Engine
    # heads use a zero optimizer: re-init and compare structure only
    # (params should be unchanged across steps -> compare against a fresh
    # engine init with the same seed)
    cfg = TrainConfig(method="contrastive_cross", model="unet", model2="unet",
                      num_classes=4, batch_size=8, labeled_bs=4,
                      patch_size=(32, 32), max_iterations=100,
                      labeled_slices_override=4)
    engine = Engine(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    fresh = engine.init_state(_jax.random.PRNGKey(0), batch)
    a = _jax.tree_util.tree_leaves(state.params["classifier1"])
    b = _jax.tree_util.tree_leaves(fresh.params["classifier1"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_cps_two_models_diverge():
    state, _ = run_steps("cps")
    p1 = jax.tree_util.tree_leaves(state.params["model1"])
    p2 = jax.tree_util.tree_leaves(state.params["model2"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(p1, p2))
