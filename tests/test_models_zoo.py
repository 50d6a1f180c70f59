"""Registry completeness + smoke shapes for the remaining zoo members."""
import jax
import jax.numpy as jnp
import pytest

from cvssl_tpu.models import (available_2d, available_3d, net_factory,
                              net_factory_3d)


def test_2d_registry_complete():
    av = available_2d()
    # every net_type the reference 2D factory serves (net_factory.py:77-107)
    for name in ["unet", "enet", "unet_ds", "unet_cct", "unet_urpc",
                 "efficient_unet", "ViT_Seg", "pnet", "nnUNet", "preunet",
                 "classifier", "projector"]:
        assert name in av, name


def test_3d_registry_complete():
    av = available_3d()
    # every net_type the reference 3D factory serves (net_factory_3d.py:10-41)
    for name in ["unet_3D", "attention_unet", "voxresnet", "vnet", "nnUNet",
                 "unetr", "swinunetr"]:
        assert name in av, name


@pytest.mark.parametrize("name,size", [("nnUNet", 64)])
def test_nnunet_2d_shape(name, size):
    m = net_factory(name, in_chns=1, class_num=4)
    x = jnp.zeros((1, size, size, 1))
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (1, size, size, 4)


def test_swinunetr_shape():
    m = net_factory_3d("swinunetr", in_chns=1, class_num=2)
    x = jnp.zeros((1, 32, 32, 32, 1))
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 32, 32, 32, 2)


def test_nnunet_3d_anisotropic_pools():
    m = net_factory_3d("nnUNet", in_chns=1, class_num=2)
    # depth is pooled 4x (two [1,2,2] stages skip it twice), plane 64x
    x = jnp.zeros((1, 8, 64, 64, 1))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 8, 64, 64, 2)
