"""Multi-host mesh surface: 2-axis ('dcn', 'data') folding must be
numerically identical to the flat 1-D mesh (SURVEY §2.7 — the TPU-native
replacement for the reference's dead NCCL code, utils/util.py:236-240)."""
import dataclasses

import jax
import numpy as np
import pytest

from cvssl_tpu.data import DataPipeline, ShuffleBatchSampler, SliceDataset
from cvssl_tpu.data import transforms as T
from cvssl_tpu.data.synthetic import make_synthetic_acdc
from cvssl_tpu.parallel import mesh as pmesh
from cvssl_tpu.train.config import TrainConfig
from cvssl_tpu.train.engine import Engine


@pytest.fixture(scope="module")
def acdc_root(tmp_path_factory):
    return make_synthetic_acdc(str(tmp_path_factory.mktemp("acdc_mesh")),
                               num_cases=8, slices_per_case=4, size=64)


def test_make_mesh_dcn_shape():
    mesh = pmesh.make_mesh(8, dcn=2)
    assert mesh.axis_names == ("dcn", "data")
    assert mesh.devices.shape == (2, 4)
    # device order preserved: row 0 = first 4 devices (one host's chips)
    flat = pmesh.make_mesh(8)
    np.testing.assert_array_equal(mesh.devices.ravel(), flat.devices.ravel())


def test_make_mesh_dcn_indivisible_raises():
    with pytest.raises(ValueError):
        pmesh.make_mesh(8, dcn=3)


def test_batch_sharding_folds_both_axes():
    mesh = pmesh.make_mesh(8, dcn=2)
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    sharded = jax.device_put(x, pmesh.batch_sharding(mesh))
    # 8 shards of 2 rows each, in device order — same as the flat mesh
    flat = jax.device_put(x, pmesh.batch_sharding(pmesh.make_mesh(8)))
    for a, b in zip(sharded.addressable_shards, flat.addressable_shards):
        np.testing.assert_array_equal(np.asarray(a.data), np.asarray(b.data))


def _one_step_loss(cfg, acdc_root):
    engine = Engine(cfg)
    rng_np = np.random.default_rng(0)
    ds = SliceDataset(acdc_root, "train",
                      transform=T.RandomGenerator((64, 64), rng_np))
    pipe = DataPipeline(ds, ShuffleBatchSampler(len(ds), 8, rng_np),
                        num_workers=0)
    batch = next(iter(pipe))
    state = engine.init_state(jax.random.PRNGKey(0), batch)
    state, metrics = engine.train_step(state, batch)
    return float(metrics["loss"]), state


def test_dcn_mesh_loss_identical_to_flat(acdc_root, tmp_path):
    base = TrainConfig(
        root_path=acdc_root, exp="mesh", model="unet", method="supervised",
        num_classes=4, max_iterations=2, batch_size=8, labeled_bs=4,
        patch_size=(64, 64), labeled_num=1, labeled_slices_override=16,
        snapshot_root=str(tmp_path), num_devices=8, device_data=False)
    loss_flat, state_flat = _one_step_loss(base, acdc_root)
    loss_dcn, state_dcn = _one_step_loss(
        dataclasses.replace(base, dcn_slices=2), acdc_root)
    assert loss_dcn == pytest.approx(loss_flat, rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(state_flat.params),
                    jax.tree_util.tree_leaves(state_dcn.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
