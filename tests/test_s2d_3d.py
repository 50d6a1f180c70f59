"""Exactness of the 3D (H,W)-space-to-depth fast path (ops/s2d.py 3D
helpers + models/unet3d.py s2d_levels) — same function, same param tree."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvssl_tpu.models.unet3d import UNet3D
from cvssl_tpu.ops import s2d


def test_s2d3d_roundtrip():
    x = np.random.default_rng(0).normal(size=(2, 5, 8, 12, 3)).astype(
        np.float32)
    y = s2d.space_to_depth3d(jnp.asarray(x))
    assert y.shape == (2, 5, 4, 6, 12)
    np.testing.assert_array_equal(np.asarray(s2d.depth_to_space3d(y)), x)


@pytest.mark.parametrize("ci,co", [(1, 16), (16, 32)])
def test_conv3x3x3_exact(ci, co):
    rng = np.random.default_rng(ci + co)
    x = jnp.asarray(rng.normal(size=(2, 6, 8, 12, ci)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, ci, co)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(co,)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
    got = s2d.depth_to_space3d(
        s2d.conv3x3x3(s2d.space_to_depth3d(x), k, b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_group_max3d_is_inplane_maxpool():
    from flax import linen as nn
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 4, 8, 8, 6)),
                    jnp.float32)
    ref = nn.max_pool(x, (1, 2, 2), strides=(1, 2, 2))
    got = s2d.group_max3d(s2d.space_to_depth3d(x))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("levels", [1, 2])
def test_unet3d_s2d_eval_parity(levels):
    base = UNet3D(in_chns=1, num_classes=2)
    fast = UNet3D(in_chns=1, num_classes=2, s2d_levels=levels)
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 16, 16, 16, 1)),
        jnp.float32)
    variables = base.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    v2 = fast.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert jax.tree_util.tree_map(jnp.shape, variables) == \
        jax.tree_util.tree_map(jnp.shape, v2)
    ref = base.apply(variables, x, train=False)
    got = fast.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)


def test_unet3d_s2d_grads_flow():
    fast = UNet3D(in_chns=1, num_classes=2, s2d_levels=2)
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(1, 16, 16, 16, 1)),
        jnp.float32)
    v = fast.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    def loss(p):
        y = fast.apply({"params": p}, x, train=True,
                       rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.mean(y ** 2)

    g = jax.grad(loss)(v["params"])
    flat = {jax.tree_util.keystr(p): float(jnp.abs(l).sum())
            for p, l in jax.tree_util.tree_leaves_with_path(g)}
    assert all(np.isfinite(list(flat.values())))
    for k, n in flat.items():
        # at 16^3 the center block sits at 1^3 spatial, where InstanceNorm
        # of a single voxel is identically 0 -> legitimately zero grads
        # (native model behaves the same); everything else must flow
        if "UnetConv3_4" not in k:
            assert n > 0, k


@pytest.mark.parametrize("levels", [1, 2])
def test_unet3d_deepsup_s2d_eval_parity(levels):
    from cvssl_tpu.models.unet3d import UNet3DDeepSup
    base = UNet3DDeepSup(in_chns=1, num_classes=2)
    fast = UNet3DDeepSup(in_chns=1, num_classes=2, s2d_levels=levels)
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(1, 16, 16, 16, 1)),
        jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0),
            "perturb": jax.random.PRNGKey(1)}
    variables = base.init(rngs, x, train=False)
    v2 = fast.init(rngs, x, train=False)
    assert jax.tree_util.tree_map(jnp.shape, variables) == \
        jax.tree_util.tree_map(jnp.shape, v2)
    ref = base.apply(variables, x, train=False)
    got = fast.apply(variables, x, train=False)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=3e-4, atol=3e-4)
