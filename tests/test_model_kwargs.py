"""TrainConfig.model_kwargs resolution (TPU fast-path knobs)."""
import jax
import jax.numpy as jnp

from cvssl_tpu.train.config import TrainConfig


def test_cpu_auto_is_plain_f32():
    # tests run on CPU: auto must resolve to no fast path
    assert TrainConfig().model_kwargs("unet") == {}
    assert TrainConfig(dim=3, patch_size=(96, 96, 96)).model_kwargs(
        "unet_3D") == {}


def test_explicit_overrides_apply_anywhere():
    kw = TrainConfig(s2d_levels=2, dtype="bfloat16").model_kwargs("unet")
    assert kw == {"s2d_levels": 2, "dtype": jnp.dtype(jnp.bfloat16)}


def test_indivisible_patch_disables_s2d():
    kw = TrainConfig(s2d_levels=2, dtype="float32",
                     patch_size=(250, 250)).model_kwargs("unet")
    assert "s2d_levels" not in kw


def test_3d_checks_trailing_axes_only():
    # depth axis need not divide: only H/W are s2d'd in 3D
    kw = TrainConfig(s2d_levels=2, dtype="float32", dim=3,
                     patch_size=(91, 96, 96)).model_kwargs("unet_3D")
    assert kw == {"s2d_levels": 2}


def test_other_families_untouched():
    cfg = TrainConfig(s2d_levels=2, dtype="bfloat16")
    assert cfg.model_kwargs("enet") == {}
    assert cfg.model_kwargs("vnet") == {}


def test_vit_kwargs_passthrough():
    cfg = TrainConfig(vit_kwargs={"embed_dim": 24})
    assert cfg.model_kwargs("ViT_Seg") == {"embed_dim": 24}
    assert cfg.model_kwargs("swin_unet") == {"embed_dim": 24}
