"""Checkpoint-converter test: build a synthetic torch-style Swin state dict,
convert, and verify the weights landed (encoder + the encoder->decoder
remap of the reference load_from)."""
import jax
import jax.numpy as jnp
import numpy as np

from cvssl_tpu.models.swin_unet import SwinUnet
from cvssl_tpu.models.swin_checkpoint import convert_swin_checkpoint


def synthetic_torch_sd(embed=24, depths=(2, 2), heads=(3, 6), window=7):
    rng = np.random.default_rng(0)
    sd = {}
    sd["patch_embed.proj.weight"] = rng.normal(
        size=(embed, 3, 4, 4)).astype(np.float32)
    sd["patch_embed.proj.bias"] = rng.normal(size=(embed,)).astype(np.float32)
    sd["patch_embed.norm.weight"] = np.ones(embed, np.float32)
    sd["patch_embed.norm.bias"] = np.zeros(embed, np.float32)
    for i, depth in enumerate(depths):
        dim = embed * 2 ** i
        for d in range(depth):
            p = f"layers.{i}.blocks.{d}"
            sd[f"{p}.norm1.weight"] = np.ones(dim, np.float32)
            sd[f"{p}.norm1.bias"] = np.zeros(dim, np.float32)
            sd[f"{p}.attn.relative_position_bias_table"] = rng.normal(
                size=((2 * window - 1) ** 2, heads[i])).astype(np.float32)
            sd[f"{p}.attn.qkv.weight"] = rng.normal(
                size=(3 * dim, dim)).astype(np.float32)
            sd[f"{p}.attn.qkv.bias"] = rng.normal(
                size=(3 * dim,)).astype(np.float32)
            sd[f"{p}.attn.proj.weight"] = rng.normal(
                size=(dim, dim)).astype(np.float32)
            sd[f"{p}.attn.proj.bias"] = rng.normal(
                size=(dim,)).astype(np.float32)
            sd[f"{p}.norm2.weight"] = np.ones(dim, np.float32)
            sd[f"{p}.norm2.bias"] = np.zeros(dim, np.float32)
            sd[f"{p}.mlp.fc1.weight"] = rng.normal(
                size=(4 * dim, dim)).astype(np.float32)
            sd[f"{p}.mlp.fc1.bias"] = rng.normal(
                size=(4 * dim,)).astype(np.float32)
            sd[f"{p}.mlp.fc2.weight"] = rng.normal(
                size=(dim, 4 * dim)).astype(np.float32)
            sd[f"{p}.mlp.fc2.bias"] = rng.normal(
                size=(dim,)).astype(np.float32)
        if i < len(depths) - 1:
            sd[f"layers.{i}.downsample.reduction.weight"] = rng.normal(
                size=(2 * dim, 4 * dim)).astype(np.float32)
            sd[f"layers.{i}.downsample.norm.weight"] = np.ones(
                4 * dim, np.float32)
            sd[f"layers.{i}.downsample.norm.bias"] = np.zeros(
                4 * dim, np.float32)
    dim_last = embed * 2 ** (len(depths) - 1)
    sd["norm.weight"] = np.ones(dim_last, np.float32)
    sd["norm.bias"] = np.zeros(dim_last, np.float32)
    return sd


def test_convert_populates_encoder_and_decoder():
    model = SwinUnet(num_classes=4, img_size=56, embed_dim=24,
                     depths=(2, 2), num_heads=(3, 6), window_size=7)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 56, 56, 1)), train=False)
    sd = synthetic_torch_sd()
    new_params, report = convert_swin_checkpoint(
        sd, variables["params"], num_layers=2, depths=(2, 2))
    assert report["loaded"] > 40
    # encoder qkv kernel = transpose of torch weight
    got = np.asarray(new_params["enc_0_0"]["attn"]["qkv"]["kernel"])
    want = sd["layers.0.blocks.0.attn.qkv.weight"].T
    np.testing.assert_array_equal(got, want)
    # decoder remap: layers.0 -> dec_{num_layers-1}_d (= dec_1_0 here)
    got_dec = np.asarray(new_params["dec_1_0"]["attn"]["qkv"]["kernel"])
    np.testing.assert_array_equal(got_dec, want)
    # patch embed conv transposed to HWIO
    pe = np.asarray(new_params["patch_embed"]["kernel"])
    assert pe.shape == (4, 4, 3, 24)

    # model still runs with converted params
    y = model.apply({"params": jax.tree_util.tree_map(jnp.asarray,
                                                      new_params)},
                    jnp.zeros((1, 56, 56, 1)), train=False)
    assert y.shape == (1, 56, 56, 4)
    assert np.all(np.isfinite(np.asarray(y)))
