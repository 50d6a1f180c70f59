"""Shape/gradient tests for the 3D model zoo."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvssl_tpu.models import net_factory_3d, available_3d


def init_apply(model, x, train=False):
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "perturb": jax.random.PRNGKey(2)}, x, train=False)
    if train:
        out = model.apply(variables, x, train=True,
                          rngs={"dropout": jax.random.PRNGKey(3),
                                "perturb": jax.random.PRNGKey(4)},
                          mutable=["batch_stats"])
        return variables, out[0]
    return variables, model.apply(variables, x, train=False)


class TestUNet3D:
    def test_shapes(self):
        m = net_factory_3d("unet_3D", in_chns=1, class_num=2)
        x = jnp.zeros((1, 16, 16, 16, 1))
        _, y = init_apply(m, x)
        assert y.shape == (1, 16, 16, 16, 2)

    def test_train_mode_runs(self):
        m = net_factory_3d("unet_3D", in_chns=1, class_num=2)
        x = jnp.zeros((1, 16, 16, 16, 1))
        _, y = init_apply(m, x, train=True)
        assert y.shape == (1, 16, 16, 16, 2)

    def test_deep_supervision_variant(self):
        m = net_factory_3d("unet_3D_dv_semi", in_chns=1, class_num=2)
        x = jnp.zeros((1, 16, 16, 16, 1))
        _, outs = init_apply(m, x, train=True)
        assert len(outs) == 4
        for o in outs:
            assert o.shape == (1, 16, 16, 16, 2)


class TestVNet:
    def test_shapes(self):
        m = net_factory_3d("vnet", in_chns=1, class_num=2)
        x = jnp.zeros((1, 32, 32, 32, 1))
        _, y = init_apply(m, x)
        assert y.shape == (1, 32, 32, 32, 2)

    def test_dropout_only_in_train(self):
        m = net_factory_3d("vnet", in_chns=1, class_num=2)
        x = jnp.array(np.random.default_rng(0).normal(
            size=(1, 16, 16, 16, 1)), jnp.float32)
        variables, y1 = init_apply(m, x)
        y2 = m.apply(variables, x, train=False)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


class TestVoxResNet:
    def test_shapes(self):
        m = net_factory_3d("voxresnet", in_chns=1, class_num=2)
        x = jnp.zeros((1, 16, 16, 16, 1))
        _, y = init_apply(m, x)
        assert y.shape == (1, 16, 16, 16, 2)


class TestAttentionUNet:
    def test_shapes(self):
        m = net_factory_3d("attention_unet", in_chns=1, class_num=2)
        x = jnp.zeros((1, 16, 16, 16, 1))
        _, y = init_apply(m, x, train=True)
        assert y.shape == (1, 16, 16, 16, 2)


class TestUNETR:
    def test_shapes_and_params(self):
        m = net_factory_3d("unetr", in_chns=1, class_num=2)
        x = jnp.zeros((1, 32, 32, 32, 1))
        variables, y = init_apply(m, x)
        assert y.shape == (1, 32, 32, 32, 2)
        n = sum(int(np.prod(p.shape)) for p in
                jax.tree_util.tree_leaves(variables["params"]))
        assert n > 85_000_000  # ViT-base backbone scale

    def test_gradients_flow(self):
        m = net_factory_3d("unetr", in_chns=1, class_num=2)
        x = jnp.ones((1, 32, 32, 32, 1))
        variables = m.init(jax.random.PRNGKey(0), x, train=False)

        def loss(params):
            return jnp.mean(m.apply({"params": params}, x, train=False) ** 2)

        g = jax.grad(loss)(variables["params"])
        total = sum(float(jnp.abs(v).sum())
                    for v in jax.tree_util.tree_leaves(g))
        assert total > 0


def test_registry_3d():
    av = available_3d()
    for name in ["unet_3D", "unet_3D_dv_semi", "vnet", "voxresnet",
                 "attention_unet", "unetr", "discriminator"]:
        assert name in av


def test_grid_attention_2d_shapes():
    """grid_attention_layer.py:162-171 dimension=2 variant (dead upstream,
    ported for surface completeness)."""
    import jax
    import jax.numpy as jnp
    from cvssl_tpu.models.attention_unet import GridAttentionBlock2D

    blk = GridAttentionBlock2D(in_channels=32, inter_channels=16)
    x = jnp.zeros((2, 32, 32, 32))
    g = jnp.zeros((2, 16, 16, 64))
    v = blk.init({"params": jax.random.PRNGKey(0)}, x, g, train=False)
    out, att = blk.apply(v, x, g, train=False)
    assert out.shape == x.shape
    assert att.shape == (2, 32, 32, 1)
    assert float(jnp.isfinite(out).all())


def test_up2_axis_closed_form_matches_resize():
    """The 2-tap closed-form upsample (_up2_axis — the halo path's
    cross-shard form, and the measured-slower-on-TPU full-model variant,
    see its docstring) == jax.image.resize 'trilinear' ==
    torch interpolate(align_corners=False), to f32 rounding."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cvssl_tpu.models.unet3d import _up2_axis

    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(2, 5, 6, 7, 3)).astype(np.float32))
    ref = jax.image.resize(x, (2, 10, 12, 14, 3), "trilinear")
    got = _up2_axis(_up2_axis(_up2_axis(x, 1), 2), 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-6)

    import torch
    t = torch.nn.functional.interpolate(
        torch.tensor(np.moveaxis(np.asarray(x), -1, 1)), scale_factor=2,
        mode="trilinear", align_corners=False)
    np.testing.assert_allclose(
        np.asarray(got), np.moveaxis(t.numpy(), 1, -1), rtol=0, atol=1e-6)
