"""3D UNet family (Flax, NDHWC).

Parity with ``code/networks/unet_3D.py`` (filters [64..1024]/feature_scale=4
-> [16, 32, 64, 128, 256], two conv3x3x3 + InstanceNorm + ReLU per block,
maxpool down, trilinear-up + concat + conv up (``UnetUp3_CT``,
``networks/utils.py:260``), dropout 0.3 at center and final, 1x1x1 out conv)
and ``unet_3D_dv_semi.py`` (4 deep-supervision heads with graded channel
dropout).

torch ``InstanceNorm3d`` defaults to affine=False and always uses instance
statistics — GroupNorm with one group per channel and no scale/bias is the
exact equivalent.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-sample per-channel normalization over spatial dims (torch
    InstanceNorm affine=False)."""
    axes = tuple(range(1, x.ndim - 1))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def channel_dropout(rng, x, p: float):
    """torch Dropout3d: zero whole channels, scale survivors by 1/(1-p)."""
    keep = jax.random.bernoulli(rng, 1.0 - p,
                                (x.shape[0],) + (1,) * (x.ndim - 2) +
                                (x.shape[-1],))
    return jnp.where(keep, x / (1.0 - p), 0.0)


def trilinear_x2(x: jnp.ndarray) -> jnp.ndarray:
    """Trilinear upsample x2 (torch align_corners=False == jax half-pixel)."""
    b, d, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * d, 2 * h, 2 * w, c), "trilinear")


class UnetConv3(nn.Module):
    """Two conv3^3 + InstanceNorm + ReLU (``networks/utils.py:99-124``)."""
    out_channels: int

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(self.out_channels, (3, 3, 3), padding=1)(x)
        x = nn.relu(instance_norm(x))
        x = nn.Conv(self.out_channels, (3, 3, 3), padding=1)(x)
        return nn.relu(instance_norm(x))


class UnetUp3CT(nn.Module):
    """Trilinear up x2 -> concat skip -> UnetConv3 (``utils.py:260-277``)."""
    out_channels: int

    @nn.compact
    def __call__(self, skip, below, *, train: bool = False):
        up = trilinear_x2(below)
        return UnetConv3(self.out_channels)(
            jnp.concatenate([skip, up], axis=-1), train=train)


class UNet3D(nn.Module):
    """``unet_3D`` (``unet_3D.py:20-97``)."""
    in_chns: int = 1
    num_classes: int = 2
    feature_scale: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        f = [int(v / self.feature_scale) for v in (64, 128, 256, 512, 1024)]
        conv1 = UnetConv3(f[0])(x, train=train)
        conv2 = UnetConv3(f[1])(nn.max_pool(conv1, (2, 2, 2), (2, 2, 2)),
                                train=train)
        conv3 = UnetConv3(f[2])(nn.max_pool(conv2, (2, 2, 2), (2, 2, 2)),
                                train=train)
        conv4 = UnetConv3(f[3])(nn.max_pool(conv3, (2, 2, 2), (2, 2, 2)),
                                train=train)
        center = UnetConv3(f[4])(nn.max_pool(conv4, (2, 2, 2), (2, 2, 2)),
                                 train=train)
        center = nn.Dropout(0.3, deterministic=not train)(center)
        up4 = UnetUp3CT(f[3])(conv4, center, train=train)
        up3 = UnetUp3CT(f[2])(conv3, up4, train=train)
        up2 = UnetUp3CT(f[1])(conv2, up3, train=train)
        up1 = UnetUp3CT(f[0])(conv1, up2, train=train)
        up1 = nn.Dropout(0.3, deterministic=not train)(up1)
        return nn.Conv(self.num_classes, (1, 1, 1))(up1)


class UnetDsv3(nn.Module):
    """1x1x1 conv + trilinear upsample head (``utils.py:455-462``)."""
    num_classes: int
    scale_factor: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.num_classes, (1, 1, 1))(x)
        b, d, h, w, c = x.shape
        s = self.scale_factor
        return jax.image.resize(x, (b, s * d, s * h, s * w, c), "trilinear")


class UNet3DDeepSup(nn.Module):
    """``unet_3D_dv_semi`` (``unet_3D_dv_semi.py:13-112``): 4 DSV heads with
    channel dropout p = .5/.3/.2/.1 down the decoder."""
    in_chns: int = 1
    num_classes: int = 2
    feature_scale: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        f = [int(v / self.feature_scale) for v in (64, 128, 256, 512, 1024)]
        conv1 = UnetConv3(f[0])(x, train=train)
        conv2 = UnetConv3(f[1])(nn.max_pool(conv1, (2, 2, 2), (2, 2, 2)),
                                train=train)
        conv3 = UnetConv3(f[2])(nn.max_pool(conv2, (2, 2, 2), (2, 2, 2)),
                                train=train)
        conv4 = UnetConv3(f[3])(nn.max_pool(conv3, (2, 2, 2), (2, 2, 2)),
                                train=train)
        center = UnetConv3(f[4])(nn.max_pool(conv4, (2, 2, 2), (2, 2, 2)),
                                 train=train)

        # channel dropout applies in-line: the dropped map feeds BOTH its DSV
        # head and the next up level (reference forward, :75-100)
        rngs = jax.random.split(self.make_rng("perturb"), 4) if train else None
        up4 = UnetUp3CT(f[3])(conv4, center, train=train)
        if train:
            up4 = channel_dropout(rngs[0], up4, 0.5)
        up3 = UnetUp3CT(f[2])(conv3, up4, train=train)
        if train:
            up3 = channel_dropout(rngs[1], up3, 0.3)
        up2 = UnetUp3CT(f[1])(conv2, up3, train=train)
        if train:
            up2 = channel_dropout(rngs[2], up2, 0.2)
        up1 = UnetUp3CT(f[0])(conv1, up2, train=train)
        if train:
            up1 = channel_dropout(rngs[3], up1, 0.1)

        dsv4 = UnetDsv3(self.num_classes, 8)(up4)
        dsv3 = UnetDsv3(self.num_classes, 4)(up3)
        dsv2 = UnetDsv3(self.num_classes, 2)(up2)
        dsv1 = nn.Conv(self.num_classes, (1, 1, 1))(up1)
        return dsv1, dsv2, dsv3, dsv4
