"""End-to-end cross-teaching with the REAL ViT branch (SwinUnet): gradients
through window attention + shifted masks + DropPath rng + remat, two
partitioned optimizers, and SwinUnet validation — the flagship
``train_cross_teaching_between_cnn_transformer_2D.py:167-254`` config.

SwinUnet's merge/expand chain only closes at img_size 224 (like the
reference), so the smoke runs at 224^2 with a thin embed_dim=24 variant via
``cfg.vit_kwargs`` — same code paths, 1/16 the FLOPs."""
import dataclasses

import jax
import numpy as np
import pytest

from cvssl_tpu.data.synthetic import make_synthetic_acdc
from cvssl_tpu.train.config import TrainConfig
from cvssl_tpu.train.engine import Engine, build_2d_data

THIN_VIT = dict(embed_dim=24, num_heads=(1, 2, 4, 8),
                use_checkpoint=True)  # remat exercised


@pytest.fixture(scope="module")
def acdc_root(tmp_path_factory):
    return make_synthetic_acdc(str(tmp_path_factory.mktemp("acdc")),
                               num_cases=6, slices_per_case=2, num_val=1,
                               size=64)


def test_cross_teaching_cnn_vit_steps_and_validates(acdc_root, tmp_path):
    cfg = TrainConfig(
        root_path=acdc_root, exp="xt_vit", method="cross_teaching",
        model="unet", model2="ViT_Seg", num_classes=4, batch_size=2,
        labeled_bs=1, patch_size=(224, 224), labeled_num=1,
        labeled_slices_override=4, snapshot_root=str(tmp_path),
        max_iterations=2, vit_kwargs=THIN_VIT, num_devices=1,
        device_data=False, num_workers=0)
    engine = Engine(cfg)
    train_ds, sampler, val_ds = build_2d_data(
        cfg, engine.method.supervised_only, engine.method.transform)

    batch_idx = next(iter(sampler))
    from cvssl_tpu.data.pipeline import collate
    batch = collate([train_ds[i] for i in batch_idx])

    state = engine.init_state(jax.random.PRNGKey(0), batch)
    losses = []
    for _ in range(2):
        state, metrics = engine.train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert int(state.step) == 2
    # both models' params actually moved (two optimizers in the partition)
    for name in ("model1", "model2"):
        leaf0 = jax.tree_util.tree_leaves(state.params[name])[0]
        assert np.isfinite(np.asarray(leaf0)).all()

    # SwinUnet (model2) validates at its own resolution
    perf2 = engine.validate(state, val_ds, name="model2")
    assert perf2.shape == (cfg.num_classes - 1, 2)
    assert np.isfinite(perf2[:, 0]).all()


def test_param_movement_both_models(acdc_root, tmp_path):
    cfg = TrainConfig(
        root_path=acdc_root, exp="xt_vit2", method="cross_teaching",
        model="unet", model2="ViT_Seg", num_classes=4, batch_size=2,
        labeled_bs=1, patch_size=(224, 224), labeled_num=1,
        labeled_slices_override=4, snapshot_root=str(tmp_path),
        max_iterations=2, vit_kwargs=THIN_VIT, num_devices=1,
        device_data=False, num_workers=0)
    engine = Engine(cfg)
    rng = np.random.default_rng(0)
    batch = {"image": rng.normal(size=(2, 224, 224, 1)).astype(np.float32),
             "label": rng.integers(0, 4, (2, 224, 224)).astype(np.int32),
             "idx": np.arange(2, dtype=np.int32)}
    state = engine.init_state(jax.random.PRNGKey(0), batch)
    before = {n: np.asarray(jax.tree_util.tree_leaves(state.params[n])[0])
              for n in ("model1", "model2")}
    state, _ = engine.train_step(state, batch)
    for n in ("model1", "model2"):
        after = np.asarray(jax.tree_util.tree_leaves(state.params[n])[0])
        assert not np.array_equal(before[n], after), n
