"""preUnet (Flax, NHWC) — UNet decoder on a Res2Net-101-v1b encoder, parity
with ``code/networks/pretrained_unet.py`` + ``Res2Net_v1b.py`` (26w x 4s,
layers [3, 4, 23, 3]; only stem + layer1-3 feed the decoder).

ImageNet weights are URL-loaded in the reference — unavailable offline;
random init here (documented deviation).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from cvssl_tpu.models.unet import bilinear_resize


def _bn(train):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5)


class Bottle2neck(nn.Module):
    """Res2Net bottleneck (``Res2Net_v1b.py:22-100``): 1x1 -> scale-split
    cascaded 3x3 convs -> concat -> 1x1, with v1b avg-pool downsampling."""
    planes: int
    stride: int = 1
    base_width: int = 26
    scale: int = 4
    downsample: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        width = int(self.planes * (self.base_width / 64.0)) * 1
        expansion = 4
        identity = x

        out = nn.relu(_bn(train)(
            nn.Conv(width * self.scale, (1, 1), use_bias=False)(x)))
        splits = jnp.split(out, self.scale, axis=-1)
        stype_stage = self.downsample  # 'stage' block when downsampling
        outs = []
        sp = None
        for i in range(self.scale - 1):
            sp = splits[i] if (i == 0 or stype_stage) else sp + splits[i]
            sp = nn.relu(_bn(train)(nn.Conv(
                width, (3, 3), strides=self.stride, padding=1,
                use_bias=False)(sp)))
            outs.append(sp)
        if not stype_stage:
            outs.append(splits[-1])
        else:
            # 'stage' blocks ALWAYS pool the last split (3x3, pad 1, stride
            # = block stride — a smoothing even at stride 1;
            # ``Res2Net_v1b.py:57,86``)
            outs.append(nn.avg_pool(splits[-1], (3, 3),
                                    strides=(self.stride,) * 2,
                                    padding=((1, 1), (1, 1))))
        out = jnp.concatenate(outs, axis=-1)
        out = _bn(train)(nn.Conv(self.planes * expansion, (1, 1),
                                 use_bias=False)(out))

        if self.downsample:
            if self.stride > 1:
                identity = nn.avg_pool(identity, (self.stride,) * 2,
                                       strides=(self.stride,) * 2)
            identity = _bn(train)(nn.Conv(self.planes * expansion, (1, 1),
                                          use_bias=False)(identity))
        return nn.relu(out + identity)


class Res2NetEncoder(nn.Module):
    """v1b stem (3x conv3) + layers 1-3 (``Res2Net_v1b.py:104-206``)."""
    layers: tuple = (3, 4, 23)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = nn.relu(_bn(train)(nn.Conv(32, (3, 3), strides=2, padding=1,
                                       use_bias=False)(x)))
        h = nn.relu(_bn(train)(nn.Conv(32, (3, 3), padding=1,
                                       use_bias=False)(h)))
        stem = nn.relu(_bn(train)(nn.Conv(64, (3, 3), padding=1,
                                          use_bias=False)(h)))  # /2, 64
        h = nn.max_pool(stem, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        feats = []
        for li, (planes, blocks) in enumerate(
                zip((64, 128, 256), self.layers)):
            stride = 1 if li == 0 else 2
            h = Bottle2neck(planes, stride=stride,
                            downsample=True)(h, train=train)
            for _ in range(blocks - 1):
                h = Bottle2neck(planes)(h, train=train)
            feats.append(h)
        return stem, feats  # stem /2 64ch; layer1 /4 256; layer2 /8 512; layer3 /16 1024


class _ConvBlock(nn.Module):
    """conv-BN-LeakyReLU x2 (``pretrained_unet.py:16-35``)."""
    mid: int
    out: int

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.leaky_relu(_bn(train)(nn.Conv(self.mid, (3, 3),
                                             padding=1)(x)), 0.01)
        return nn.leaky_relu(_bn(train)(nn.Conv(self.out, (3, 3),
                                                padding=1)(x)), 0.01)


class PreUNet(nn.Module):
    """(``pretrained_unet.py:38-83``)

    Grayscale inputs are tiled 1->3 channels before the encoder (the same
    convention as the reference's SwinUnet wrapper,
    ``vision_transformer.py:49-50``). The reference preUnet has no such
    adapter and CRASHES on 1-channel input (its ImageNet Res2Net stem is
    3-channel and ``input_channels`` is accepted-but-dead,
    ``pretrained_unet.py:39-42``) — no reference trainer instantiates it,
    so the fix is the only way the pretrained workflow can run on the
    grayscale datasets at all. Documented deviation (docs/PARITY.md)."""
    in_chns: int = 1
    num_classes: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        def up2(z):
            return bilinear_resize(z, (z.shape[1] * 2, z.shape[2] * 2))

        if x.shape[-1] == 1:
            x = jnp.tile(x, (1,) * (x.ndim - 1) + (3,))
        stem, (x1, x2, x3) = Res2NetEncoder()(x, train=train)
        h = _ConvBlock(1024, 512)(up2(x3), train=train)
        h = _ConvBlock(512, 512)(jnp.concatenate([x2, h], -1), train=train)
        h = _ConvBlock(512, 256)(up2(h), train=train)
        h = _ConvBlock(256, 256)(jnp.concatenate([x1, h], -1), train=train)
        h = _ConvBlock(256, 64)(up2(h), train=train)
        h = _ConvBlock(64, 64)(jnp.concatenate([stem, h], -1), train=train)
        h = up2(h)
        return nn.Conv(self.num_classes, (1, 1))(h)
