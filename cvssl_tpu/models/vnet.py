"""VNet (Flax, NDHWC) — parity with ``code/networks/vnet.py:145-241``.

Stage channel plan 16..256 with 1/2/3/3/3-conv blocks, stride-2 conv down,
stride-2 deconv up with additive skips, optional channel dropout 0.5 at the
bottleneck and before the head (factory default: normalization='batchnorm',
has_dropout=True, ``net_factory_3d.py:20-21``).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from cvssl_tpu.models.unet3d import channel_dropout, instance_norm


class _Norm(nn.Module):
    kind: str = "batchnorm"

    @nn.compact
    def __call__(self, x, *, train: bool):
        if self.kind == "batchnorm":
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5)(x)
        if self.kind == "groupnorm":
            return nn.GroupNorm(num_groups=16)(x)
        if self.kind == "instancenorm":
            return instance_norm(x)
        return x


class ConvStage(nn.Module):
    """n_stages x (conv3^3 + norm + relu) (``vnet.py:5-31``)."""
    n_stages: int
    out_channels: int
    normalization: str = "batchnorm"

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for _ in range(self.n_stages):
            x = nn.Conv(self.out_channels, (3, 3, 3), padding=1)(x)
            x = _Norm(self.normalization)(x, train=train)
            x = nn.relu(x)
        return x


class DownConv(nn.Module):
    """stride-2 conv (kernel == stride) + norm + relu (``vnet.py:67-92``)."""
    out_channels: int
    normalization: str = "batchnorm"

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(self.out_channels, (2, 2, 2), strides=2, padding=0)(x)
        x = _Norm(self.normalization)(x, train=train)
        return nn.relu(x)


class UpDeconv(nn.Module):
    """stride-2 transpose conv + norm + relu (``vnet.py:94-117``)."""
    out_channels: int
    normalization: str = "batchnorm"

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.ConvTranspose(self.out_channels, (2, 2, 2), strides=(2, 2, 2))(x)
        x = _Norm(self.normalization)(x, train=train)
        return nn.relu(x)


class VNet(nn.Module):
    in_chns: int = 1
    num_classes: int = 2
    n_filters: int = 16
    normalization: str = "batchnorm"
    has_dropout: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False, turnoff_drop: bool = False):
        nf, nz = self.n_filters, self.normalization
        drop = self.has_dropout and train and not turnoff_drop

        x1 = ConvStage(1, nf, nz)(x, train=train)
        x2 = ConvStage(2, nf * 2, nz)(DownConv(nf * 2, nz)(x1, train=train),
                                      train=train)
        x3 = ConvStage(3, nf * 4, nz)(DownConv(nf * 4, nz)(x2, train=train),
                                      train=train)
        x4 = ConvStage(3, nf * 8, nz)(DownConv(nf * 8, nz)(x3, train=train),
                                      train=train)
        x5 = ConvStage(3, nf * 16, nz)(DownConv(nf * 16, nz)(x4, train=train),
                                       train=train)
        if drop:
            x5 = channel_dropout(self.make_rng("dropout"), x5, 0.5)

        x5_up = UpDeconv(nf * 8, nz)(x5, train=train) + x4
        x6 = ConvStage(3, nf * 8, nz)(x5_up, train=train)
        x6_up = UpDeconv(nf * 4, nz)(x6, train=train) + x3
        x7 = ConvStage(3, nf * 4, nz)(x6_up, train=train)
        x7_up = UpDeconv(nf * 2, nz)(x7, train=train) + x2
        x8 = ConvStage(2, nf * 2, nz)(x7_up, train=train)
        x8_up = UpDeconv(nf, nz)(x8, train=train) + x1
        x9 = ConvStage(1, nf, nz)(x8_up, train=train)
        if drop:
            x9 = channel_dropout(self.make_rng("dropout"), x9, 0.5)
        return nn.Conv(self.num_classes, (1, 1, 1), padding=0)(x9)
