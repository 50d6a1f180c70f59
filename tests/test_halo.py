"""Halo-exchange spatially-sharded UNet3D forward (parallel/halo.py):
sharded == replicated on an 8-device mesh, same unsharded param tree."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvssl_tpu.models.unet3d import UNet3D
from cvssl_tpu.parallel.halo import sharded_unet3d_forward
from cvssl_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def model_and_vars():
    model = UNet3D(in_chns=1, num_classes=2)
    x = jnp.zeros((1, 16, 128, 16, 1), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return model, variables


def test_sharded_matches_replicated(model_and_vars):
    model, variables = model_and_vars
    ndev = len(jax.devices())
    assert ndev == 8, "conftest should give 8 virtual devices"
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 128, 16, 1)).astype(np.float32)

    ref = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    got = np.asarray(sharded_unet3d_forward(variables, x, mesh))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-5)


def test_bad_shard_extent_raises(model_and_vars):
    _, variables = model_and_vars
    mesh = make_mesh(8)
    with pytest.raises(AssertionError, match="16"):
        sharded_unet3d_forward(variables,
                               np.zeros((1, 16, 64, 16, 1), np.float32),
                               mesh)
