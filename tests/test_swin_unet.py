"""SwinUnet tests: shapes, param-count parity, window ops, mask golden values."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvssl_tpu.models.swin_unet import (SwinUnet, relative_position_index,
                                        shifted_window_mask, window_partition,
                                        window_reverse)


class TestWindowOps:
    def test_partition_reverse_roundtrip(self, rng):
        x = jnp.array(rng.normal(size=(2, 14, 14, 8)), jnp.float32)
        w = window_partition(x, 7)
        assert w.shape == (2 * 4, 49, 8)
        back = window_reverse(w, 7, 14, 14)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_relative_position_index_range(self):
        idx = relative_position_index(7)
        assert idx.shape == (49, 49)
        assert idx.min() >= 0 and idx.max() < 13 * 13
        # center-to-center (same position) maps to the middle of the table
        assert idx[0, 0] == (7 - 1) * 13 + (7 - 1)

    def test_shifted_mask_structure(self):
        mask = shifted_window_mask(14, 14, 7, 3)
        assert mask.shape == (4, 49, 49)
        # first window (top-left) is uncut: mask all zeros
        np.testing.assert_array_equal(mask[0], 0.0)
        # last window (bottom-right crosses both wraps): has -100 entries
        assert (mask[-1] == -100.0).sum() > 0


class TestSwinUnet:
    @pytest.fixture(scope="class")
    def small(self):
        # img 56 -> resolutions 14, 7, then window collapses (<=7)
        model = SwinUnet(num_classes=4, img_size=56, embed_dim=24,
                         depths=(2, 2), num_heads=(3, 6), window_size=7,
                         drop_path_rate=0.1)
        x = jnp.zeros((2, 56, 56, 1))
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)}, x,
                               train=False)
        return model, variables

    def test_output_shape(self, small):
        model, variables = small
        y = model.apply(variables, jnp.zeros((2, 56, 56, 1)), train=False)
        assert y.shape == (2, 56, 56, 4)

    def test_train_mode(self, small):
        model, variables = small
        y = model.apply(variables, jnp.zeros((2, 56, 56, 1)), train=True,
                        rngs={"dropout": jax.random.PRNGKey(2)})
        assert y.shape == (2, 56, 56, 4)

    def test_param_count_matches_reference(self):
        # reference SwinTransformerSys(224, embed 96, depths [2,2,2,2],
        # heads [3,6,12,24], classes 4): 27,168,420 params (torch, with the
        # in_chans=3 patch embed the SwinUnet wrapper feeds).
        model = SwinUnet(num_classes=4)
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 224, 224, 1)), train=False))
        n = sum(int(np.prod(p.shape)) for p in
                jax.tree_util.tree_leaves(variables["params"]))
        assert n == 27_168_420

    def test_gradients(self, small):
        model, variables = small
        x = jnp.ones((1, 56, 56, 1))

        def loss(params):
            return jnp.mean(model.apply({"params": params}, x,
                                        train=False) ** 2)

        g = jax.grad(loss)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        nonzero = sum(float(jnp.abs(v).sum()) > 0 for v in leaves)
        assert nonzero > len(leaves) * 0.7


def test_attn_layout_grid_matches_windows():
    """The 6D grid attention layout is numerically the windows layout with
    the SAME param tree (measured slower on TPU — probe_swin_layout — but
    pinned equivalent so future layout work has an oracle). Shifted
    windows (depth 2 -> one SW-MSA block) and mask path included."""
    m_win = SwinUnet(num_classes=4, img_size=64, window_size=4,
                     embed_dim=24, depths=(2, 2), num_heads=(3, 6),
                     drop_path_rate=0.0, attn_layout="windows")
    m_grid = SwinUnet(num_classes=4, img_size=64, window_size=4,
                      embed_dim=24, depths=(2, 2), num_heads=(3, 6),
                      drop_path_rate=0.0, attn_layout="grid")
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 64, 64, 1)).astype(np.float32))
    variables = m_win.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x,
                           train=False)
    y0 = m_win.apply(variables, x, train=False)
    y1 = m_grid.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-4, atol=1e-5)


def test_attn_layout_fused_matches_windows():
    """The fused layout (map-level qkv/proj, one 3C transpose in place of
    partition + qkv-5D-transpose, one C transpose in place of
    out-transpose + reverse) is numerically the windows layout with the
    SAME param tree. Shifted windows (depth 2 -> one SW-MSA block with
    mask) included."""
    m_win = SwinUnet(num_classes=4, img_size=64, window_size=4,
                     embed_dim=24, depths=(2, 2), num_heads=(3, 6),
                     drop_path_rate=0.0, attn_layout="windows")
    m_fused = SwinUnet(num_classes=4, img_size=64, window_size=4,
                       embed_dim=24, depths=(2, 2), num_heads=(3, 6),
                       drop_path_rate=0.0, attn_layout="fused")
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(2, 64, 64, 1)).astype(np.float32))
    variables = m_win.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x,
                           train=False)
    y0 = m_win.apply(variables, x, train=False)
    y1 = m_fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-4, atol=1e-5)

    # gradients flow and match at the f32 reassociation floor
    def loss(m, v):
        return jnp.sum(m.apply(v, x, train=False) ** 2)

    g0 = jax.grad(lambda p: loss(m_win, {"params": p}))(variables["params"])
    g1 = jax.grad(lambda p: loss(m_fused, {"params": p}))(
        variables["params"])
    l0 = jax.tree_util.tree_leaves(g0)
    l1 = jax.tree_util.tree_leaves(g1)
    scale = max(float(jnp.abs(a).max()) for a in l0)
    for a, b in zip(l0, l1):
        assert float(jnp.abs(a - b).max()) <= 1e-4 * scale


def test_swin_bf16_close_to_f32():
    """bf16 compute dtype (TPU fast path) stays within bf16 tolerance of
    the f32 forward; params and logits remain f32."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cvssl_tpu.models.swin_unet import SwinUnet

    f32 = SwinUnet(num_classes=4, embed_dim=24, num_heads=(1, 2, 4, 8))
    bf16 = SwinUnet(num_classes=4, embed_dim=24, num_heads=(1, 2, 4, 8),
                    dtype=jnp.bfloat16)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 224, 224, 1)), jnp.float32)
    v = f32.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ref = np.asarray(f32.apply(v, x, train=False))
    got = np.asarray(bf16.apply(v, x, train=False))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < 0.08 * scale
