"""UNETR (Flax, NDHWC) — MONAI-free reimplementation matching the reference
configuration (``code/networks/unetr.py`` + ``net_factory_3d.py:24-36``):
img 96^3, patch 16^3, hidden 768, 12 layers, 12 heads, MLP 3072, perceptron
(learned) position embeddings, feature_size 16, instance norm, residual conv
blocks, conv_block=True, res_block=True, dropout 0.0.

Architecture pinned to the MONAI modules the reference imports (their
published schema — MONAI itself is unavailable offline; an executable torch
reconstruction of that schema lives in tests/monai_standin.py and the
same-weights parity test in tests/test_monai_parity.py):

* ViT skip taps are ``hidden_states_out[3] / [6] / [9]`` — the outputs
  AFTER the 4th/7th/10th transformer block (reference unetr.py:216-223) —
  and the bottleneck ``dec4`` input is the FINAL token sequence after the
  ViT's closing LayerNorm (monai ViT.forward applies self.norm(x) before
  returning x).
* Attention is MONAI's SABlock: one fused qkv Dense WITHOUT bias whose
  output layout is qkv-major ("b h (qkv l d) -> qkv b l h d"), scaled
  dot-product, and a biased ``out_proj``.
* Patch embedding ('perceptron') flattens 16^3 patches channel-last
  ("(x y z c)") into a biased Dense; learned position embeddings.
* All decoder convs/deconvs carry NO bias (monai get_conv_layer default
  bias=False); only the UnetOutBlock 1x1x1 head has a bias. Instance norms
  are parameter-free (InstanceNorm3d default affine=False).

ViT attention is a single dense 216-token self-attention — ideal MXU shape;
the conv decoder mirrors MONAI's UnetrBasicBlock / UnetrPrUpBlock /
UnetrUpBlock (res_block=True) semantics.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cvssl_tpu.models.unet3d import instance_norm


class _ResConvBlock(nn.Module):
    """monai UnetResBlock: conv3-IN-lrelu, conv3-IN, projected residual
    (conv1-IN), final lrelu after the add. Convs bias-free."""
    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.out_channels, (3, 3, 3), strides=self.stride,
                    padding=1, use_bias=False, name="conv1")(x)
        h = nn.leaky_relu(instance_norm(h), 0.01)
        h = nn.Conv(self.out_channels, (3, 3, 3), padding=1,
                    use_bias=False, name="conv2")(h)
        h = instance_norm(h)
        if x.shape[-1] != self.out_channels or self.stride != 1:
            x = nn.Conv(self.out_channels, (1, 1, 1), strides=self.stride,
                        use_bias=False, name="conv3")(x)
            x = instance_norm(x)
        return nn.leaky_relu(h + x, 0.01)


class _Deconv(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(self.out_channels, (2, 2, 2),
                                strides=(2, 2, 2), use_bias=False)(x)


class _PrUpBlock(nn.Module):
    """monai UnetrPrUpBlock(conv_block=True, res_block=True): one initial
    deconv, then num_layer stages of (deconv, UnetResBlock)."""
    out_channels: int
    num_layer: int

    @nn.compact
    def __call__(self, x):
        x = _Deconv(self.out_channels, name="transp_conv_init")(x)
        for i in range(self.num_layer):
            x = _Deconv(self.out_channels, name=f"blocks_{i}_deconv")(x)
            x = _ResConvBlock(self.out_channels, name=f"blocks_{i}_res")(x)
        return x


class _UpBlock(nn.Module):
    """monai UnetrUpBlock: deconv x2, concat skip, UnetResBlock."""
    out_channels: int

    @nn.compact
    def __call__(self, x, skip):
        x = _Deconv(self.out_channels, name="transp_conv")(x)
        x = jnp.concatenate([x, skip], axis=-1)
        return _ResConvBlock(self.out_channels, name="conv_block")(x)


class SABlock(nn.Module):
    """monai SABlock: fused qkv Dense (NO bias, qkv-major packing
    "b h (qkv l d) -> qkv b l h d"), softmax(q k^T * scale) v, biased
    out_proj."""
    hidden: int
    heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b, n, _ = x.shape
        hd = self.hidden // self.heads
        qkv = nn.Dense(self.hidden * 3, use_bias=False, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (hd ** -0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.hidden)
        out = nn.Dense(self.hidden, name="out_proj")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class _TransformerBlock(nn.Module):
    """monai TransformerBlock: x + attn(norm1(x)); x + mlp(norm2(x)) with
    mlp = linear1-gelu-drop-linear2-drop."""
    hidden: int
    heads: int
    mlp_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x + SABlock(self.hidden, self.heads, self.dropout,
                        name="attn")(h, train=train)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        h = nn.Dense(self.mlp_dim, name="linear1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.hidden, name="linear2")(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return x + h


class UNETR(nn.Module):
    in_chns: int = 1
    num_classes: int = 2
    img_size: Tuple[int, int, int] = (96, 96, 96)
    feature_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    num_layers: int = 12
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b, d, h, w, _ = x.shape
        p = 16
        gd, gh, gw = d // p, h // p, w // p
        n_tokens = gd * gh * gw

        # patch embedding ('perceptron': flatten patches CHANNEL-LAST ->
        # Dense + learned position embeddings — monai PatchEmbeddingBlock
        # Rearrange "... -> b (h w d) (x y z c)")
        patches = x.reshape(b, gd, p, gh, p, gw, p, x.shape[-1])
        patches = patches.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            b, n_tokens, -1)
        tokens = nn.Dense(self.hidden_size, name="patch_embeddings")(patches)
        pos = self.param("position_embeddings",
                         nn.initializers.normal(0.02),
                         (1, n_tokens, self.hidden_size))
        tokens = tokens + pos

        hidden_states = []
        for i in range(self.num_layers):
            tokens = _TransformerBlock(
                self.hidden_size, self.num_heads, self.mlp_dim,
                self.dropout_rate, name=f"blocks_{i}")(tokens, train=train)
            hidden_states.append(tokens)
        # the ViT's closing LayerNorm feeds the bottleneck (monai
        # ViT.forward: x = self.norm(x) before returning)
        final = nn.LayerNorm(epsilon=1e-5, name="norm")(tokens)

        def proj(t):
            return t.reshape(b, gd, gh, gw, self.hidden_size)

        fs = self.feature_size
        # reference unetr.py:216-224: taps AFTER blocks 4/7/10 + final norm
        z3, z6, z9 = (hidden_states[3], hidden_states[6], hidden_states[9])
        enc1 = _ResConvBlock(fs, name="encoder1")(x)
        enc2 = _PrUpBlock(fs * 2, 2, name="encoder2")(proj(z3))
        enc3 = _PrUpBlock(fs * 4, 1, name="encoder3")(proj(z6))
        enc4 = _PrUpBlock(fs * 8, 0, name="encoder4")(proj(z9))

        dec4 = _UpBlock(fs * 8, name="decoder5")(proj(final), enc4)
        dec3 = _UpBlock(fs * 4, name="decoder4")(dec4, enc3)
        dec2 = _UpBlock(fs * 2, name="decoder3")(dec3, enc2)
        dec1 = _UpBlock(fs, name="decoder2")(dec2, enc1)
        # UnetOutBlock: the only biased conv in the decoder
        return nn.Conv(self.num_classes, (1, 1, 1), name="out")(dec1)
