"""Effi_UNet (Flax, NHWC) — UNet with an EfficientNet-B3 encoder, parity with
``code/networks/efficientunet.py`` (segmentation_models.pytorch-style decoder:
nearest x2 upsample + skip concat + 2x conv-BN-ReLU, decoder channels
(256, 128, 64, 32, 16), 1x1 classifier).

The reference loads ImageNet weights from a URL (``efficient_encoder.py:111``)
— unavailable offline; weights initialize randomly and a converter hook can
load a local checkpoint (documented deviation).
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _round_filters(filters: int, width: float) -> int:
    """EfficientNet width scaling (round to multiple of 8)."""
    filters *= width
    new = max(8, int(filters + 4) // 8 * 8)
    if new < 0.9 * filters:
        new += 8
    return int(new)


def _round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def _bn(train):
    # torch EfficientNet: BN momentum 0.01, eps 1e-3
    return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                        epsilon=1e-3)


def _same_pad(ih: int, k: int, s: int) -> Tuple[Tuple[int, int], ...]:
    """efficientnet_pytorch ``Conv2dStaticSamePadding`` amounts for a square
    STATIC size ``ih`` (B3: image_size=300, threaded through the stages via
    ceil-division — NOT the runtime input size). TF-SAME splits the total
    pad as (pad//2, pad - pad//2), which is ASYMMETRIC (0, 1) for the three
    even-size stride-2 k3 convs (stem, stage-2 and stage-4 first blocks)."""
    oh = -(-ih // s)
    pad = max((oh - 1) * s + k - ih, 0)
    return ((pad // 2, pad - pad // 2),) * 2


class MBConv(nn.Module):
    """Mobile inverted bottleneck with squeeze-excite + swish."""
    in_channels: int
    out_channels: int
    kernel: int
    stride: int
    expand_ratio: int
    se_ratio: float = 0.25
    drop_rate: float = 0.0
    static_size: int = 0  # STATIC input size for TF-SAME padding (B3: the
    # image_size-300 ladder 150/75/38/19/10, matching Conv2dStaticSamePadding)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        inp = x
        c = self.in_channels * self.expand_ratio
        h = x
        if self.expand_ratio != 1:
            h = nn.swish(_bn(train)(nn.Conv(c, (1, 1), use_bias=False)(h)))
        h = nn.Conv(c, (self.kernel, self.kernel), strides=self.stride,
                    padding=_same_pad(self.static_size, self.kernel,
                                      self.stride),
                    feature_group_count=c, use_bias=False)(h)
        h = nn.swish(_bn(train)(h))
        # squeeze-excite on the ORIGINAL input channel count * ratio
        se_ch = max(1, int(self.in_channels * self.se_ratio))
        s = jnp.mean(h, axis=(1, 2), keepdims=True)
        s = nn.swish(nn.Conv(se_ch, (1, 1))(s))
        s = jax.nn.sigmoid(nn.Conv(c, (1, 1))(s))
        h = h * s
        h = _bn(train)(nn.Conv(self.out_channels, (1, 1), use_bias=False)(h))
        if self.stride == 1 and self.in_channels == self.out_channels:
            if self.drop_rate > 0 and train:
                keep = 1.0 - self.drop_rate
                mask = jax.random.bernoulli(
                    self.make_rng("dropout"), keep,
                    (h.shape[0],) + (1,) * (h.ndim - 1))
                h = jnp.where(mask, h / keep, 0.0)
            h = h + inp
        return h


# base (B0) stage configs: (expand, kernel, stride, channels, repeats)
_B0_STAGES = ((1, 3, 1, 16, 1), (6, 3, 2, 24, 2), (6, 5, 2, 40, 2),
              (6, 3, 2, 80, 3), (6, 5, 1, 112, 3), (6, 5, 2, 192, 4),
              (6, 3, 1, 320, 1))


class EfficientNetEncoder(nn.Module):
    """Returns 5 feature maps at reductions 2/4/8/16/32: the STEM output
    plus the block outputs at the reference's B3 ``stage_idxs`` (5, 8, 18)
    + final (``efficient_encoder.py:76,85-102,152-158`` — for B3 these are
    exactly the last blocks of stages 2, 3 and 5). Note the r2 skip is the
    40-channel stem, NOT the 24-channel stage-1 output (out_channels
    ``(3, 40, 32, 48, 136, 384)``, :156).

    TF-SAME padding follows ``Conv2dStaticSamePadding`` at the B3 static
    image_size=300 ladder regardless of the runtime input size (what
    efficientnet_pytorch >=0.7 does — pads are baked per layer at
    construction)."""
    width: float = 1.2   # B3
    depth: float = 1.4
    drop_connect: float = 0.2

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if (self.width, self.depth) != (1.2, 1.4):
            raise NotImplementedError(
                "EfficientNetEncoder hardcodes the B3 static TF-SAME pad "
                "ladder (image_size=300) and B3 stage-boundary feature "
                f"taps; got width={self.width} depth={self.depth}. Other "
                "coefficients would silently produce wrong pads/taps.")
        size = 300  # static TF-SAME ladder (B3 image_size), NOT x.shape
        stem = _round_filters(32, self.width)
        h = nn.swish(_bn(train)(nn.Conv(stem, (3, 3), strides=2,
                                        padding=_same_pad(size, 3, 2),
                                        use_bias=False)(x)))
        size = -(-size // 2)
        feats = [h]  # reduction 2 = the stem output
        total_blocks = sum(_round_repeats(r, self.depth)
                           for *_, r in _B0_STAGES)
        block_idx = 0
        in_ch = stem
        for si, (t, k, s, c, r) in enumerate(_B0_STAGES):
            out_ch = _round_filters(c, self.width)
            repeats = _round_repeats(r, self.depth)
            for j in range(repeats):
                stride = s if j == 0 else 1
                if stride == 2 and si > 1:
                    # taps at the reference stage_idxs = the outputs feeding
                    # each later downsample (stage-2's input is NOT tapped:
                    # its resolution skip is the stem above)
                    feats.append(h)
                h = MBConv(in_ch, out_ch, k, stride, t,
                           drop_rate=self.drop_connect * block_idx /
                           total_blocks,
                           static_size=size)(h, train=train)
                if stride == 2:
                    size = -(-size // 2)
                in_ch = out_ch
                block_idx += 1
        feats.append(h)  # reduction 32
        return feats  # [r2, r4, r8, r16, r32]


class DecoderBlock(nn.Module):
    """nearest x2 + concat + 2x conv-BN-ReLU (smp DecoderBlock)."""
    out_channels: int

    @nn.compact
    def __call__(self, x, skip=None, *, train: bool = False):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        for _ in range(2):
            x = nn.Conv(self.out_channels, (3, 3), padding=1,
                        use_bias=False)(x)
            x = nn.relu(nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, epsilon=1e-5)(x))
        return x


class EffiUNet(nn.Module):
    in_chns: int = 1
    num_classes: int = 4
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1,) * (x.ndim - 1) + (3,))
        feats = EfficientNetEncoder()(x, train=train)
        # smp: reverse; head = deepest; skips = rest (+ None at the end)
        feats = feats[::-1]
        h = feats[0]
        skips = list(feats[1:]) + [None]
        for i, out_ch in enumerate(self.decoder_channels):
            h = DecoderBlock(out_ch)(h, skips[i], train=train)
        return nn.Conv(self.num_classes, (1, 1))(h)
