"""nnUNet Generic_UNet (Flax) — parity with ``code/networks/nnunet.py``.

Reference configuration (``nnunet.py:480-529``): base 16 features doubling to
max 320, 6 pool stages with anisotropic strides ([1,2,2]x2, [2,2,2]x2,
[1,2,2]x2) and kernels ([1,3,3]x2 then [3,3,3]x5), conv-pooling and
conv-upsampling (strided conv down, transpose conv up), 2 convs/stage,
InstanceNorm(affine) + LeakyReLU(1e-2), dropout p=0, optional deep
supervision (off in the reference config).

Reference quirk: BOTH factories return this 3D net (``net_factory.py:96-97``
calls the same ``initialize_network``) — here the 2D registry gets a true 2D
configuration instead (documented deviation).

Param parity: 30,444,656 here vs the reference's 30,446,256 — the 1,600
delta is the reference's deep-supervision seg heads, which it instantiates
but never executes with its ds=False config (we only create heads that run).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class InstanceNormAffine(nn.Module):
    """torch InstanceNormNd(affine=True) equivalent."""
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        y = (x - mean) / jnp.sqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return y * scale + bias


class ConvNormNonlin(nn.Module):
    """conv -> InstanceNorm(affine) -> LeakyReLU(1e-2)
    (``nnunet.py:42-86``; dropout p=0 in the reference config)."""
    out_channels: int
    kernel: Tuple[int, ...]
    stride: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        pad = tuple((k // 2, k // 2) for k in self.kernel)
        x = nn.Conv(self.out_channels, self.kernel, strides=self.stride,
                    padding=pad)(x)
        return nn.leaky_relu(InstanceNormAffine()(x), 0.01)


class StackedConvLayers(nn.Module):
    """num_convs blocks; stride applies to the first only
    (``nnunet.py:97-155``)."""
    out_channels: int
    num_convs: int
    kernel: Tuple[int, ...]
    first_stride: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        ones = tuple(1 for _ in self.kernel)
        x = ConvNormNonlin(self.out_channels, self.kernel,
                           self.first_stride)(x)
        for _ in range(self.num_convs - 1):
            x = ConvNormNonlin(self.out_channels, self.kernel, ones)(x)
        return x


class GenericUNet(nn.Module):
    """Dynamic-depth UNet with conv pooling/upsampling
    (``Generic_UNet``, ``nnunet.py:186-479``)."""
    in_chns: int = 1
    num_classes: int = 2
    base_features: int = 16
    max_features: int = 320
    num_conv_per_stage: int = 2
    pool_kernels: Sequence[Tuple[int, ...]] = (
        (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2), (1, 2, 2), (1, 2, 2))
    conv_kernels: Sequence[Tuple[int, ...]] = (
        (1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3),
        (3, 3, 3))
    deep_supervision: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        num_pool = len(self.pool_kernels)
        ones = tuple(1 for _ in self.conv_kernels[0])

        skips = []
        features = self.base_features
        stage_channels = []
        for d in range(num_pool):
            stride = self.pool_kernels[d - 1] if d > 0 else ones
            x = StackedConvLayers(features, self.num_conv_per_stage,
                                  self.conv_kernels[d], stride)(x)
            skips.append(x)
            stage_channels.append(features)
            features = min(int(round(features * 2)), self.max_features)

        # bottleneck: (num_conv-1) convs at `features` + 1 conv back to the
        # top skip width for the transpose conv (conv_upsampling=True keeps
        # `features`); reference uses final_num_features = features here.
        x = StackedConvLayers(features, self.num_conv_per_stage - 1,
                              self.conv_kernels[num_pool],
                              self.pool_kernels[-1])(x)
        x = StackedConvLayers(features, 1, self.conv_kernels[num_pool],
                              ones)(x)

        seg_outputs = []
        for u in range(num_pool):
            skip = skips[-(u + 1)]
            nskip = skip.shape[-1]
            x = nn.ConvTranspose(nskip, self.pool_kernels[-(u + 1)],
                                 strides=self.pool_kernels[-(u + 1)],
                                 use_bias=False)(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = StackedConvLayers(nskip, self.num_conv_per_stage - 1,
                                  self.conv_kernels[-(u + 1)], ones)(x)
            x = StackedConvLayers(nskip, 1, self.conv_kernels[-(u + 1)],
                                  ones)(x)
            if self.deep_supervision or u == num_pool - 1:
                seg_outputs.append(
                    nn.Conv(self.num_classes, ones, use_bias=False)(x))

        if self.deep_supervision:
            return tuple(seg_outputs[::-1])
        return seg_outputs[-1]


def GenericUNet2D(in_chns: int = 1, num_classes: int = 2, **kw):
    """2D configuration: 5 pools of (2,2), 3x3 kernels, base 30 (2D nnUNet
    defaults, ``Generic_UNet.BASE_NUM_FEATURES_2D`` scaled to base 16 for
    memory parity with the reference dict)."""
    return GenericUNet(
        in_chns=in_chns, num_classes=num_classes, base_features=16,
        max_features=480,
        pool_kernels=tuple((2, 2) for _ in range(5)),
        conv_kernels=tuple((3, 3) for _ in range(6)), **kw)


def GenericUNet3D(in_chns: int = 1, num_classes: int = 2, **kw):
    """The reference's exact 3D configuration (``nnunet.py:480-529``)."""
    return GenericUNet(in_chns=in_chns, num_classes=num_classes, **kw)
