"""Contrastive heads (Flax, NHWC) — parity with ``code/networks/projector.py``.

``Projector`` (:50): two conv3x3+BN+ReLU blocks each followed by 2x2 maxpool
-> (H/4, W/4, ndf*2). The reference defines (but never applies) a final 1x1
conv — we keep that quirk by omitting it too.
``Classifier`` (:69): three conv+pool blocks then a 1x1 conv
-> (H/8, W/8, ndf*4).
"""
from __future__ import annotations

from flax import linen as nn


class _ConvBNRelu(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = nn.Conv(self.out_channels, (3, 3), padding=1)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        return nn.relu(x)


class Projector(nn.Module):
    """Unlabeled-branch projection head (``projector.py:50-66``)."""
    ndf: int = 8

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = _ConvBNRelu(self.ndf)(x, train=train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _ConvBNRelu(self.ndf * 2)(x, train=train)
        return nn.max_pool(x, (2, 2), strides=(2, 2))


class Classifier(nn.Module):
    """Labeled-branch contrastive head (``projector.py:69-94``)."""
    ndf: int = 8

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = _ConvBNRelu(self.ndf)(x, train=train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _ConvBNRelu(self.ndf * 2)(x, train=train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _ConvBNRelu(self.ndf * 4)(x, train=train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return nn.Conv(self.ndf * 4, (1, 1))(x)
