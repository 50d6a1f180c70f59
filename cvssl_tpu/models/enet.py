"""ENet (Flax, NHWC) — parity with ``code/networks/enet.py``: initial
conv+pool concat block, bottleneck encoder (regular/dilated/asymmetric),
max-unpool decoder, transpose-conv head. PReLU in the encoder, ReLU in the
decoder (reference defaults).

TPU-native max-unpool: ``MaxUnpool2d(indices)`` is an irregular scatter; here
the downsample block records a binary argmax MASK (x == upsampled max) and
the unpool multiplies the nearest-upsampled tensor by it — identical
placement semantics, pure elementwise ops on the VPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from cvssl_tpu.models.unet3d import channel_dropout


class _Act(nn.Module):
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        if self.relu:
            return nn.relu(x)
        alpha = self.param("prelu_alpha", nn.initializers.constant(0.25), ())
        return jnp.where(x >= 0, x, alpha * x)


def _bn(train):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5)


class InitialBlock(nn.Module):
    """conv3x3/s2 (C-in channels fewer) || maxpool3/s2, concat, BN, act
    (``enet.py:5-69``)."""
    out_channels: int
    relu: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        main = nn.Conv(self.out_channels - x.shape[-1], (3, 3), strides=2,
                       padding=1, use_bias=False)(x)
        ext = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        out = jnp.concatenate([main, ext], axis=-1)
        return _Act(self.relu)(_bn(train)(out))


class RegularBottleneck(nn.Module):
    """Projection -> (dilated/asymmetric) conv -> expansion + residual
    (``enet.py:71-207``)."""
    channels: int
    kernel_size: int = 3
    padding: int = 0
    dilation: int = 1
    asymmetric: bool = False
    dropout_prob: float = 0.0
    relu: bool = True
    internal_ratio: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        internal = self.channels // self.internal_ratio
        ext = _Act(self.relu)(_bn(train)(
            nn.Conv(internal, (1, 1), use_bias=False)(x)))
        if self.asymmetric:
            ext = _Act(self.relu)(_bn(train)(nn.Conv(
                internal, (self.kernel_size, 1),
                padding=((self.padding, self.padding), (0, 0)),
                kernel_dilation=self.dilation, use_bias=False)(ext)))
            ext = _Act(self.relu)(_bn(train)(nn.Conv(
                internal, (1, self.kernel_size),
                padding=((0, 0), (self.padding, self.padding)),
                kernel_dilation=self.dilation, use_bias=False)(ext)))
        else:
            ext = _Act(self.relu)(_bn(train)(nn.Conv(
                internal, (self.kernel_size, self.kernel_size),
                padding=self.padding, kernel_dilation=self.dilation,
                use_bias=False)(ext)))
        ext = _Act(self.relu)(_bn(train)(
            nn.Conv(self.channels, (1, 1), use_bias=False)(ext)))
        if self.dropout_prob > 0 and train:
            ext = channel_dropout(self.make_rng("dropout"), ext,
                                  self.dropout_prob)
        return _Act(self.relu)(x + ext)


def _max_pool_with_mask(x):
    """2x2/s2 max pool returning (pooled, argmax mask at input resolution)."""
    pooled = nn.max_pool(x, (2, 2), strides=(2, 2))
    up = jnp.repeat(jnp.repeat(pooled, 2, axis=1), 2, axis=2)
    mask = (x == up[:, :x.shape[1], :x.shape[2]]).astype(x.dtype)
    return pooled, mask


def _unpool_with_mask(x, mask):
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return up[:, :mask.shape[1], :mask.shape[2]] * mask


class DownsamplingBottleneck(nn.Module):
    """(``enet.py:209-338``): main = maxpool (+channel zero-pad); ext =
    conv2/s2 -> conv3 -> 1x1; add."""
    out_channels: int
    dropout_prob: float = 0.0
    relu: bool = True
    internal_ratio: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        internal = x.shape[-1] // self.internal_ratio
        main, mask = _max_pool_with_mask(x)
        pad = self.out_channels - main.shape[-1]
        main = jnp.pad(main, [(0, 0), (0, 0), (0, 0), (0, pad)])

        ext = _Act(self.relu)(_bn(train)(
            nn.Conv(internal, (2, 2), strides=2, use_bias=False)(x)))
        ext = _Act(self.relu)(_bn(train)(
            nn.Conv(internal, (3, 3), padding=1, use_bias=False)(ext)))
        ext = _Act(self.relu)(_bn(train)(
            nn.Conv(self.out_channels, (1, 1), use_bias=False)(ext)))
        if self.dropout_prob > 0 and train:
            ext = channel_dropout(self.make_rng("dropout"), ext,
                                  self.dropout_prob)
        return _Act(self.relu)(main + ext), mask


class UpsamplingBottleneck(nn.Module):
    """(``enet.py:340-450``): main = 1x1 conv + BN + max-unpool; ext = 1x1 ->
    tconv2/s2 -> 1x1; add."""
    out_channels: int
    dropout_prob: float = 0.0
    relu: bool = True
    internal_ratio: int = 4

    @nn.compact
    def __call__(self, x, mask, *, train: bool = False):
        internal = x.shape[-1] // self.internal_ratio
        main = _bn(train)(nn.Conv(self.out_channels, (1, 1),
                                  use_bias=False)(x))
        # mask has the ORIGINAL channel count (pre-downsample); the unpooled
        # main has out_channels == that count by construction
        main = _unpool_with_mask(main, mask)

        ext = _Act(self.relu)(_bn(train)(
            nn.Conv(internal, (1, 1), use_bias=False)(x)))
        ext = _Act(self.relu)(_bn(train)(nn.ConvTranspose(
            internal, (2, 2), strides=(2, 2), use_bias=False)(ext)))
        ext = _Act(self.relu)(_bn(train)(
            nn.Conv(self.out_channels, (1, 1), use_bias=False)(ext)))
        if self.dropout_prob > 0 and train:
            ext = channel_dropout(self.make_rng("dropout"), ext,
                                  self.dropout_prob)
        return _Act(self.relu)(main + ext)


class ENet(nn.Module):
    """(``enet.py:453-614``)"""
    in_chns: int = 1
    num_classes: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        x = InitialBlock(16, relu=False)(x, train=train)

        x, mask1 = DownsamplingBottleneck(64, 0.01, relu=False)(x, train=train)
        for _ in range(4):
            x = RegularBottleneck(64, padding=1, dropout_prob=0.01,
                                  relu=False)(x, train=train)

        x, mask2 = DownsamplingBottleneck(128, 0.1, relu=False)(x, train=train)
        for _ in range(2):  # stages 2 and 3 share the block pattern
            x = RegularBottleneck(128, padding=1, dropout_prob=0.1,
                                  relu=False)(x, train=train)
            x = RegularBottleneck(128, dilation=2, padding=2,
                                  dropout_prob=0.1, relu=False)(x, train=train)
            x = RegularBottleneck(128, kernel_size=5, padding=2,
                                  asymmetric=True, dropout_prob=0.1,
                                  relu=False)(x, train=train)
            x = RegularBottleneck(128, dilation=4, padding=4,
                                  dropout_prob=0.1, relu=False)(x, train=train)
            x = RegularBottleneck(128, padding=1, dropout_prob=0.1,
                                  relu=False)(x, train=train)
            x = RegularBottleneck(128, dilation=8, padding=8,
                                  dropout_prob=0.1, relu=False)(x, train=train)
            x = RegularBottleneck(128, kernel_size=5, padding=2,
                                  asymmetric=True, dropout_prob=0.1,
                                  relu=False)(x, train=train)
            x = RegularBottleneck(128, dilation=16, padding=16,
                                  dropout_prob=0.1, relu=False)(x, train=train)

        x = UpsamplingBottleneck(64, 0.1, relu=True)(x, mask2, train=train)
        x = RegularBottleneck(64, padding=1, dropout_prob=0.1,
                              relu=True)(x, train=train)
        x = RegularBottleneck(64, padding=1, dropout_prob=0.1,
                              relu=True)(x, train=train)

        x = UpsamplingBottleneck(16, 0.1, relu=True)(x, mask1, train=train)
        x = RegularBottleneck(16, padding=1, dropout_prob=0.1,
                              relu=True)(x, train=train)
        x = nn.ConvTranspose(self.num_classes, (3, 3), strides=(2, 2),
                             use_bias=False)(x)
        return x[:, :h, :w, :]
