"""Exactness of the space-to-depth conv reformulation (ops/s2d.py) and the
s2d-mode UNet (models/unet.py s2d_levels) — the TPU fast path must be the
same mathematical function with the same param tree as the native model."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvssl_tpu.models.unet import UNet
from cvssl_tpu.ops import s2d


def _native_conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_s2d_roundtrip():
    x = np.random.default_rng(0).normal(size=(2, 8, 12, 5)).astype(np.float32)
    y = s2d.space_to_depth(jnp.asarray(x))
    assert y.shape == (2, 4, 6, 20)
    np.testing.assert_array_equal(np.asarray(s2d.depth_to_space(y)), x)


@pytest.mark.parametrize("ci,co", [(1, 16), (16, 16), (32, 16)])
def test_conv3x3_exact(ci, co):
    rng = np.random.default_rng(ci * 100 + co)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, ci)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, ci, co)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(co,)), jnp.float32)
    ref = _native_conv(x, k) + b
    got = s2d.depth_to_space(s2d.conv3x3(s2d.space_to_depth(x), k, b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_conv1x1_exact():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 32)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 1, 32, 16)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    ref = _native_conv(x, k) + b
    got = s2d.depth_to_space(s2d.conv1x1(s2d.space_to_depth(x), k, b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_group_max_is_maxpool():
    from flax import linen as nn
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 16, 16, 6)),
                    jnp.float32)
    ref = nn.max_pool(x, (2, 2), strides=(2, 2))
    got = s2d.group_max(s2d.space_to_depth(x))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_concat_matches_native():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(1, 8, 8, 6)), jnp.float32)
    ref = s2d.space_to_depth(jnp.concatenate([a, b], -1))
    got = s2d.concat([s2d.space_to_depth(a), s2d.space_to_depth(b)], [4, 6])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.fixture(scope="module")
def unet_pair():
    base = UNet(in_chns=1, num_classes=4)
    fast = UNet(in_chns=1, num_classes=4, s2d_levels=2)
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 64, 64, 1)), jnp.float32)
    variables = base.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(1)}, x, train=False)
    return base, fast, x, variables


def test_unet_s2d_param_tree_identical(unet_pair):
    base, fast, x, variables = unet_pair
    v2 = fast.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, x, train=False)
    ref_shapes = jax.tree_util.tree_map(jnp.shape, variables)
    got_shapes = jax.tree_util.tree_map(jnp.shape, v2)
    assert ref_shapes == got_shapes


def test_unet_s2d_eval_parity(unet_pair):
    base, fast, x, variables = unet_pair
    ref = base.apply(variables, x, train=False)
    got = fast.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_unet_s2d_train_parity(unet_pair):
    """Same weights, train=True (batch statistics): logits AND updated
    running stats must match the native model. Dropout is disabled by rng
    symmetry concerns? No — the level-0/1 blocks have dropout_p>0, whose
    mask layout differs between coords; use deterministic mode via train
    batchnorm but eval dropout is not separable, so compare a dropout-free
    config."""
    x = jnp.asarray(
        np.random.default_rng(4).normal(size=(2, 32, 32, 1)), jnp.float32)
    base = UNet(in_chns=1, num_classes=4, dropout=(0.0,) * 5)
    fast = UNet(in_chns=1, num_classes=4, dropout=(0.0,) * 5, s2d_levels=2)
    variables = base.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ref, ref_mut = base.apply(variables, x, train=True,
                              mutable=["batch_stats"])
    got, got_mut = fast.apply(variables, x, train=True,
                              mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_mut)
    flat_got = {jax.tree_util.keystr(p): v
                for p, v in jax.tree_util.tree_leaves_with_path(got_mut)}
    for path, v in flat_ref:
        np.testing.assert_allclose(
            flat_got[jax.tree_util.keystr(path)], np.asarray(v),
            rtol=5e-4, atol=5e-4, err_msg=jax.tree_util.keystr(path))


def test_unet_s2d_bf16_close():
    """bf16 compute dtype stays within bf16 tolerance of f32 logits."""
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(1, 32, 32, 1)), jnp.float32)
    base = UNet(in_chns=1, num_classes=4)
    fast = UNet(in_chns=1, num_classes=4, s2d_levels=2, dtype=jnp.bfloat16)
    variables = base.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ref = base.apply(variables, x, train=False)
    got = fast.apply(variables, x, train=False)
    assert got.dtype == jnp.float32
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    scale = np.abs(np.asarray(ref)).max()
    assert err < 0.05 * scale, (err, scale)


class TestCustomVjpPair:
    """conv3x3_{to,from}_shifted_cv: 2-tap fwd/dgrad with dense-aligned
    wgrad — must be grad-identical to autodiff of the plain pair."""

    def test_shifted_to_space_matches_plain_conv(self):
        import jax.lax as lax
        rng = np.random.default_rng(0)
        x_orig = jnp.asarray(rng.normal(size=(2, 16, 16, 4)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, 4, 6)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.normal(size=(6,)) * 0.1, jnp.float32)
        y_sh = s2d.conv3x3_to_shifted(s2d.space_to_depth(x_orig), k, b)
        y_plain = lax.conv_general_dilated(
            x_orig, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        np.testing.assert_allclose(np.asarray(s2d.shifted_to_space(y_sh)),
                                   np.asarray(y_plain), atol=1e-5)

    def test_grads_match_autodiff(self):
        import jax
        rng = np.random.default_rng(1)
        x = s2d.space_to_depth(
            jnp.asarray(rng.normal(size=(2, 16, 16, 4)), jnp.float32))
        k0 = jnp.asarray(rng.normal(size=(3, 3, 4, 6)) * 0.1, jnp.float32)
        b0 = jnp.asarray(rng.normal(size=(6,)) * 0.1, jnp.float32)
        k1 = jnp.asarray(rng.normal(size=(3, 3, 6, 4)) * 0.1, jnp.float32)
        b1 = jnp.asarray(rng.normal(size=(4,)) * 0.1, jnp.float32)

        def pair(use_cv):
            def f(x, k0, b0, k1, b1):
                if use_cv:
                    y = s2d.conv3x3_to_shifted_cv(x, k0, b0, None)
                else:
                    y = s2d.conv3x3_to_shifted(x, k0, b0)
                y = jax.nn.relu(y)
                y = s2d.apply_shifted_mask(y)
                if use_cv:
                    y = s2d.conv3x3_from_shifted_cv(y, k1, b1, None)
                else:
                    y = s2d.conv3x3_from_shifted(y, k1, b1)
                return jnp.sum(jnp.sin(y))
            return f

        args = (x, k0, b0, k1, b1)
        v_ref = float(pair(False)(*args))
        v_cv = float(pair(True)(*args))
        assert v_cv == pytest.approx(v_ref, rel=1e-6)
        g_ref = jax.grad(pair(False), argnums=(0, 1, 2, 3, 4))(*args)
        g_cv = jax.grad(pair(True), argnums=(0, 1, 2, 3, 4))(*args)
        for a, b in zip(g_ref, g_cv):
            scale = max(float(jnp.abs(a).max()), 1e-6)
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=2e-6 * scale, rtol=1e-5)

    def test_unet_grad_same_with_and_without_dense_wgrad(self):
        """End-to-end through the s2d UNet: flipping WGRAD_DENSE must not
        change gradients (it is an XLA-program choice)."""
        import jax
        from cvssl_tpu.models.unet import UNet
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)), jnp.float32)
        m = UNet(in_chns=1, num_classes=4, s2d_levels=2, dropout=(0.0,) * 5)
        v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)

        def loss(p):
            y, _ = m.apply({"params": p, "batch_stats": v["batch_stats"]},
                           x, train=True, mutable=["batch_stats"])
            return jnp.mean(y ** 2)

        old = s2d.WGRAD_DENSE
        try:
            s2d.WGRAD_DENSE = False
            g0 = jax.grad(loss)(v["params"])
            s2d.WGRAD_DENSE = True
            g1 = jax.grad(loss)(v["params"])
        finally:
            s2d.WGRAD_DENSE = old
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            # conv biases feeding straight into BatchNorm have analytically
            # ZERO gradient (BN subtracts the mean); their leaves hold pure
            # fp noise at the 1e-8 scale, so floor the atol there
            scale = max(float(jnp.abs(a).max()), 1e-6)
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=max(5e-6 * scale, 1e-7),
                                       rtol=1e-4)
