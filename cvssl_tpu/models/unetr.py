"""UNETR (Flax, NDHWC) — MONAI-free reimplementation matching the reference
configuration (``code/networks/unetr.py`` + ``net_factory_3d.py:24-36``):
img 96^3, patch 16^3, hidden 768, 12 layers, 12 heads, MLP 3072, perceptron
(learned) position embeddings, feature_size 16, instance norm, residual conv
blocks, conv_block=True, dropout 0.0.

ViT attention is a single dense 216-token self-attention — ideal MXU shape;
the conv decoder mirrors MONAI's UnetrBasicBlock / UnetrPrUpBlock /
UnetrUpBlock (res_block=True) semantics.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from cvssl_tpu.models.unet3d import instance_norm


class _ResConvBlock(nn.Module):
    """UnetrBasicBlock with res_block=True: conv3-IN-lrelu x2 + projected
    residual."""
    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.out_channels, (3, 3, 3), strides=self.stride,
                    padding=1)(x)
        h = nn.leaky_relu(instance_norm(h), 0.01)
        h = nn.Conv(self.out_channels, (3, 3, 3), padding=1)(h)
        h = instance_norm(h)
        if x.shape[-1] != self.out_channels or self.stride != 1:
            x = nn.Conv(self.out_channels, (1, 1, 1), strides=self.stride)(x)
            x = instance_norm(x)
        return nn.leaky_relu(h + x, 0.01)


class _Deconv(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(self.out_channels, (2, 2, 2),
                                strides=(2, 2, 2))(x)


class _PrUpBlock(nn.Module):
    """UnetrPrUpBlock(conv_block=True, res_block=True): (num_layer+1) stages
    of deconv x2 followed by a res conv block (except the first deconv which
    stands alone in MONAI's res variant it's deconv->resblock per stage)."""
    out_channels: int
    num_layer: int

    @nn.compact
    def __call__(self, x):
        x = _Deconv(self.out_channels)(x)
        for _ in range(self.num_layer):
            x = _Deconv(self.out_channels)(x)
            x = _ResConvBlock(self.out_channels)(x)
        return x


class _UpBlock(nn.Module):
    """UnetrUpBlock: deconv x2, concat skip, res conv block."""
    out_channels: int

    @nn.compact
    def __call__(self, x, skip):
        x = _Deconv(self.out_channels)(x)
        x = jnp.concatenate([x, skip], axis=-1)
        return _ResConvBlock(self.out_channels)(x)


class _TransformerBlock(nn.Module):
    hidden: int
    heads: int
    mlp_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = nn.LayerNorm(epsilon=1e-5)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dropout_rate=self.dropout,
            deterministic=not train)(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5)(x)
        h = nn.Dense(self.mlp_dim)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.hidden)(h)
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

        # patch embedding ('perceptron': flatten patches -> Dense + learned
        # position embeddings)
        patches = x.reshape(b, gd, p, gh, p, gw, p, x.shape[-1])
        patches = patches.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            b, n_tokens, -1)
        tokens = nn.Dense(self.hidden_size)(patches)
        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (1, n_tokens, self.hidden_size))
        tokens = tokens + pos

        hidden_states = []
        for i in range(self.num_layers):
            tokens = _TransformerBlock(self.hidden_size, self.num_heads,
                                       self.mlp_dim,
                                       self.dropout_rate)(tokens, train=train)
            hidden_states.append(tokens)

        def proj(t):
            return t.reshape(b, gd, gh, gw, self.hidden_size)

        fs = self.feature_size
        z3, z6, z9, z12 = (hidden_states[2], hidden_states[5],
                           hidden_states[8], hidden_states[11])
        enc1 = _ResConvBlock(fs)(x)
        enc2 = _PrUpBlock(fs * 2, 2)(proj(z3))
        enc3 = _PrUpBlock(fs * 4, 1)(proj(z6))
        enc4 = _PrUpBlock(fs * 8, 0)(proj(z9))

        dec4 = _UpBlock(fs * 8)(proj(z12), enc4)
        dec3 = _UpBlock(fs * 4)(dec4, enc3)
        dec2 = _UpBlock(fs * 2)(dec3, enc2)
        dec1 = _UpBlock(fs)(dec2, enc1)
        return nn.Conv(self.num_classes, (1, 1, 1))(dec1)
