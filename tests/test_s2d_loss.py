"""s2d grouped-logits train losses (cfg.s2d_loss): the step must be
numerically equivalent to the depth_to_space path — same pixels, different
layout (reference has no analog; this is a pure TPU-layout optimization)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvssl_tpu.ops import s2d
from cvssl_tpu.train.config import TrainConfig
from cvssl_tpu.train.engine import Engine


def test_space_to_depth_labels_matches_s2d_layout():
    """Label re-indexing must use the same (a*2+b) group-major order as
    space_to_depth (C=1 case: layouts coincide exactly)."""
    rng = np.random.default_rng(0)
    lab = rng.integers(0, 4, (2, 8, 6)).astype(np.int32)
    got = np.asarray(s2d.space_to_depth_labels(jnp.asarray(lab)))
    want = np.asarray(s2d.space_to_depth(
        jnp.asarray(lab)[..., None].astype(jnp.float32))).astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_grouped_logits_match_depth_to_space_view():
    """The Decoder's (B, HH, WW, 4, C) reshape is the same tensor
    depth_to_space would emit, re-indexed."""
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.normal(size=(2, 4, 4, 4 * 3)).astype(np.float32))
    full = np.asarray(s2d.depth_to_space(y))          # (2, 8, 8, 3)
    grouped = np.asarray(y.reshape(2, 4, 4, 4, 3))     # (B, HH, WW, g, C)
    for a in range(2):
        for b in range(2):
            np.testing.assert_array_equal(
                full[:, a::2, b::2, :], grouped[:, :, :, a * 2 + b, :])


def _batch(rng, b=8, size=64):
    img = rng.normal(size=(b, size, size, 1)).astype(np.float32)
    lab = rng.integers(0, 4, (b, size, size)).astype(np.int32)
    return {"image": img, "label": lab,
            "image_weak": img,
            "image_strong": img + 0.1 * rng.normal(
                size=img.shape).astype(np.float32),
            "label_aug": lab, "idx": np.arange(b, dtype=np.int32)}


def test_sup_ce_dice_5d_grouped_equals_flat_and_d2s():
    """Method.sup_ce_dice on the raw 5D grouped view must equal both the
    flattened (B, HH, WW*4, C) view and the original depth_to_space layout
    (per-pixel losses are permutation-invariant)."""
    from cvssl_tpu.train.methods.base import Method

    cfg = TrainConfig(num_classes=4, dim=2, fused_loss=False)
    m = Method(cfg)
    rng = np.random.default_rng(3)
    grouped = jnp.asarray(
        rng.normal(size=(2, 8, 8, 4, 4)).astype(np.float32))
    lab_g = jnp.asarray(rng.integers(0, 4, (2, 8, 8, 4)).astype(np.int32))
    ce5, dice5 = m.sup_ce_dice(grouped, lab_g)
    ce4, dice4 = m.sup_ce_dice(grouped.reshape(2, 8, 32, 4),
                               lab_g.reshape(2, 8, 32))
    # original-layout: grouped (B,HH,WW,g,C) == depth_to_space of
    # (B,HH,WW,g*C) (test_grouped_logits_match_depth_to_space_view)
    full = s2d.depth_to_space(grouped.reshape(2, 8, 8, 16))
    lab_full = jnp.zeros((2, 16, 16), jnp.int32)
    for a in range(2):
        for b in range(2):
            lab_full = lab_full.at[:, a::2, b::2].set(
                np.asarray(lab_g[..., a * 2 + b]))
    ce_f, dice_f = m.sup_ce_dice(full, lab_full)
    for x, y in [(ce5, ce4), (dice5, dice4), (ce5, ce_f), (dice5, dice_f)]:
        np.testing.assert_allclose(float(x), float(y), rtol=1e-6, atol=1e-6)


def test_logits_f32_false_bitwise_identical_losses():
    """A bf16 UNet with logits_f32=False returns compute-dtype logits; every
    train-loss consumer casts to f32 at entry, so CE/dice/softmax-MSE are
    BIT-identical to the logits_f32=True output (bf16->f32 is exact)."""
    from cvssl_tpu.models.unet import UNet
    from cvssl_tpu.ops import losses

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32))
    lab = jnp.asarray(rng.integers(0, 4, (2, 16, 16, 4)).astype(np.int32))
    kw = dict(in_chns=1, num_classes=4, s2d_levels=2, s2d_logits=True,
              dtype=jnp.bfloat16)
    m32 = UNet(**kw, logits_f32=True)
    m16 = UNet(**kw, logits_f32=False)
    v = m32.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out32 = m32.apply(v, x, train=False)
    out16 = m16.apply(v, x, train=False)
    assert out32.dtype == jnp.float32 and out16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(out32),
                                  np.asarray(out16.astype(jnp.float32)))
    for f in (lambda o: losses.cross_entropy(o, lab),
              lambda o: losses.dice_loss(o, lab, 4, softmax=True),
              lambda o: jnp.mean(losses.softmax_mse_loss(o, out32))):
        np.testing.assert_array_equal(np.asarray(f(out32)),
                                      np.asarray(f(out16)))


def test_logits_f32_false_swin():
    """SwinUnet with logits_f32=False: compute-dtype logits, bit-identical
    CE after the consumer-side cast (covers the cross-teaching ViT slot)."""
    from cvssl_tpu.models.swin_unet import SwinUnet
    from cvssl_tpu.ops import losses

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(1, 224, 224, 1)).astype(np.float32))
    lab = jnp.asarray(rng.integers(0, 4, (1, 224, 224)).astype(np.int32))
    kw = dict(num_classes=4, embed_dim=24, num_heads=(1, 2, 4, 8),
              dtype=jnp.bfloat16)
    m32 = SwinUnet(**kw, logits_f32=True)
    m16 = SwinUnet(**kw, logits_f32=False)
    v = m32.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out32 = m32.apply(v, x, train=False)
    out16 = m16.apply(v, x, train=False)
    assert out32.dtype == jnp.float32 and out16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(out32),
                                  np.asarray(out16.astype(jnp.float32)))
    np.testing.assert_array_equal(
        np.asarray(losses.cross_entropy(out32, lab)),
        np.asarray(losses.cross_entropy(out16, lab)))


def test_logits_f32_false_unet3d():
    """UNet3D with logits_f32=False: compute-dtype logits, bit-identical
    losses after the consumer-side f32 cast (covers the UAMT-3D MC path)."""
    from cvssl_tpu.models.unet3d import UNet3D
    from cvssl_tpu.ops import losses

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32))
    lab = jnp.asarray(rng.integers(0, 2, (1, 16, 16, 16)).astype(np.int32))
    kw = dict(in_chns=1, num_classes=2, dtype=jnp.bfloat16)
    m32 = UNet3D(**kw, logits_f32=True)
    m16 = UNet3D(**kw, logits_f32=False)
    v = m32.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out32 = m32.apply(v, x, train=False)
    out16 = m16.apply(v, x, train=False)
    assert out32.dtype == jnp.float32 and out16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(out32),
                                  np.asarray(out16.astype(jnp.float32)))
    np.testing.assert_array_equal(
        np.asarray(losses.cross_entropy(out32, lab)),
        np.asarray(losses.cross_entropy(out16, lab)))


# uamt/ict are whitelisted too but exercise the same per-pixel loss ops as
# mean_teacher (their extra logit uses — MC reshape over leading axes,
# mixup on inputs — don't touch the spatial layout); kept out of the
# parametrization to bound CPU compile time (~4 min per method).
def test_swin_s2d_logits_step_equivalence(tmp_path):
    """Cross-teaching with the SwinUnet slot in grouped-logits mode
    (cfg.swin_s2d_loss_on -> SwinUnet.s2d_logits) vs full-res layout: one
    train_step, identical metrics and updated params. Thin swin via
    vit_kwargs to bound CPU compile time."""
    vit = {"img_size": 64, "window_size": 4, "embed_dim": 24,
           "num_heads": (2, 4, 6, 8), "drop_path_rate": 0.0}
    base = TrainConfig(
        root_path="unused", exp="swins2d", model="unet",
        method="cross_teaching", num_classes=4, batch_size=8,
        labeled_bs=4, patch_size=(64, 64), labeled_slices_override=4,
        snapshot_root=str(tmp_path), s2d_levels=0, dtype="float32",
        fused_loss=False, device_data=False, num_devices=1,
        vit_kwargs=vit)
    cfg_off = dataclasses.replace(base, s2d_loss="off")
    cfg_on = dataclasses.replace(base, s2d_loss="auto")
    assert cfg_on.swin_s2d_loss_on() and not cfg_off.swin_s2d_loss_on()

    batch = _batch(np.random.default_rng(5))
    results = []
    for cfg in (cfg_off, cfg_on):
        engine = Engine(cfg)
        state = engine.init_state(jax.random.PRNGKey(0), batch)
        state, metrics = engine.train_step(state, batch)
        results.append((jax.device_get(state.params),
                        jax.device_get(metrics)))
    (p_off, m_off), (p_on, m_on) = results
    for k in m_off:
        np.testing.assert_allclose(m_off[k], m_on[k], rtol=2e-4, atol=1e-5,
                                   err_msg=f"metric {k}")
    flat_off = jax.tree_util.tree_leaves_with_path(p_off)
    flat_on = jax.tree_util.tree_leaves(p_on)
    for (path, a), b in zip(flat_off, flat_on):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("method", ["supervised", "mean_teacher",
                                    "cps", "fixmatch"])
def test_s2d_loss_step_equivalence(method, tmp_path):
    """One train_step with s2d_loss on vs off: identical metrics and
    updated params (f32, s2d_levels=2 forced on CPU)."""
    base = TrainConfig(
        root_path="unused", exp="s2dloss", model="unet", method=method,
        num_classes=4, batch_size=8, labeled_bs=4, patch_size=(64, 64),
        labeled_slices_override=4, snapshot_root=str(tmp_path),
        s2d_levels=2, dtype="float32", fused_loss=False, uncertainty_T=2,
        device_data=False, num_devices=1)
    cfg_off = dataclasses.replace(base, s2d_loss="off")
    cfg_on = dataclasses.replace(base, s2d_loss="auto")
    assert cfg_on.s2d_loss_on() and not cfg_off.s2d_loss_on()

    batch = _batch(np.random.default_rng(2))
    results = []
    for cfg in (cfg_off, cfg_on):
        engine = Engine(cfg)
        state = engine.init_state(jax.random.PRNGKey(0), batch)
        state, metrics = engine.train_step(state, batch)
        results.append((jax.device_get(state.params),
                        jax.device_get(metrics)))
    (p_off, m_off), (p_on, m_on) = results
    for k in m_off:
        np.testing.assert_allclose(m_off[k], m_on[k], rtol=2e-4, atol=1e-5,
                                   err_msg=f"metric {k}")
    flat_off = jax.tree_util.tree_leaves_with_path(p_off)
    flat_on = jax.tree_util.tree_leaves(p_on)
    for (path, a), b in zip(flat_off, flat_on):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(path))
