"""Tests for ENet and PNet2D."""
import jax
import jax.numpy as jnp
import numpy as np

from cvssl_tpu.models import net_factory


def init_apply(model, x, train=False):
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False)
    if train:
        out = model.apply(variables, x, train=True,
                          rngs={"dropout": jax.random.PRNGKey(2)},
                          mutable=["batch_stats"])
        return variables, out[0]
    return variables, model.apply(variables, x, train=False)


class TestPNet:
    def test_shapes(self):
        m = net_factory("pnet", in_chns=1, class_num=4)
        x = jnp.zeros((2, 64, 64, 1))
        _, y = init_apply(m, x)
        assert y.shape == (2, 64, 64, 4)

    def test_train_mode(self):
        m = net_factory("pnet", in_chns=1, class_num=4)
        x = jnp.zeros((1, 32, 32, 1))
        _, y = init_apply(m, x, train=True)
        assert y.shape == (1, 32, 32, 4)


class TestENet:
    def test_shapes(self):
        m = net_factory("enet", in_chns=1, class_num=4)
        x = jnp.zeros((2, 64, 64, 1))
        _, y = init_apply(m, x)
        assert y.shape == (2, 64, 64, 4)

    def test_train_mode_finite(self):
        m = net_factory("enet", in_chns=1, class_num=4)
        x = jnp.array(np.random.default_rng(0).normal(
            size=(2, 64, 64, 1)), jnp.float32)
        _, y = init_apply(m, x, train=True)
        assert np.isfinite(np.asarray(y)).all()

    def test_unpool_mask_roundtrip(self):
        from cvssl_tpu.models.enet import (_max_pool_with_mask,
                                           _unpool_with_mask)
        x = jnp.array(np.random.default_rng(0).permutation(64).reshape(
            1, 8, 8, 1).astype(np.float32))
        pooled, mask = _max_pool_with_mask(x)
        un = _unpool_with_mask(pooled, mask)
        # unpooled values live exactly at the argmax positions
        assert float(jnp.sum(un > 0)) == 16.0
        np.testing.assert_allclose(np.asarray(un).sum(),
                                   np.asarray(pooled).sum())
