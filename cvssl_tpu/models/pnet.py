"""PNet2D (Flax, NHWC) — parity with ``code/networks/pnet.py``: five dilated
conv blocks (dilations [1, 2, 4, 8, 16], ``net_factory.py:95``) at constant
width 64, dense concat of all block outputs, 1x1 fusion, dropout head."""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from cvssl_tpu.models.unet3d import channel_dropout


class PNetBlock(nn.Module):
    """Two dilated conv3x3 + BatchNorm + LeakyReLU (``pnet.py:17-41``)."""
    out_channels: int
    dilation: int

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for _ in range(2):
            x = nn.Conv(self.out_channels, (3, 3), padding=self.dilation,
                        kernel_dilation=self.dilation)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5)(x)
            x = nn.leaky_relu(x, 0.01)
        return x


class PNet2D(nn.Module):
    in_chns: int = 1
    num_classes: int = 4
    num_filters: int = 64
    ratios: Sequence[int] = (1, 2, 4, 8, 16)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = []
        for r in self.ratios:
            x = PNetBlock(self.num_filters, r)(x, train=train)
            feats.append(x)
        x = jnp.concatenate(feats, axis=-1)
        # ConcatBlock (:44-60): two 1x1 convs + LeakyReLU
        x = nn.leaky_relu(nn.Conv(x.shape[-1], (1, 1))(x), 0.01)
        x = nn.leaky_relu(nn.Conv(self.num_filters * 2, (1, 1))(x), 0.01)
        # OutPutBlock (:63-84): drop-conv-lrelu-drop-conv (channel dropout)
        if train:
            x = channel_dropout(self.make_rng("dropout"), x, 0.3)
        x = nn.leaky_relu(nn.Conv(self.num_filters, (1, 1))(x), 0.01)
        if train:
            x = channel_dropout(self.make_rng("dropout"), x, 0.3)
        return nn.Conv(self.num_classes, (1, 1))(x)
