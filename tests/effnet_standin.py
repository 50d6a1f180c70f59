"""Executable reconstruction of the ``efficientnet_pytorch`` surface the
reference imports (``efficient_encoder.py:7-8``: ``EfficientNet`` plus
``utils.get_model_params`` / ``utils.url_map``) — enough to RUN the
reference's own ``networks/efficientunet.py`` ``Effi_UNet`` offline and pin
our Flax ``EffiUNet`` to it with same-weights forward parity.

Schema (state-dict key names ``_conv_stem/_bn0/_blocks.N._expand_conv/...``,
filter/repeat rounding, static TF-SAME padding threaded through the stages,
SE on the block INPUT channel count, BN momentum 0.01 / eps 1e-3)
reconstructed from the published lukemelas/EfficientNet-PyTorch >=0.7 API —
written fresh, not copied. Same approach as ``tests/monai_standin.py``.
"""
from __future__ import annotations

import collections
import math
import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F

GlobalParams = collections.namedtuple("GlobalParams", [
    "width_coefficient", "depth_coefficient", "image_size", "dropout_rate",
    "num_classes", "batch_norm_momentum", "batch_norm_epsilon",
    "drop_connect_rate", "depth_divisor", "min_depth", "include_top"])

BlockArgs = collections.namedtuple("BlockArgs", [
    "num_repeat", "kernel_size", "stride", "expand_ratio", "input_filters",
    "output_filters", "se_ratio", "id_skip"])

# the seven B0 stages every EfficientNet scales from
_B0_BLOCKS = (
    BlockArgs(1, 3, [1], 1, 32, 16, 0.25, True),
    BlockArgs(2, 3, [2], 6, 16, 24, 0.25, True),
    BlockArgs(2, 5, [2], 6, 24, 40, 0.25, True),
    BlockArgs(3, 3, [2], 6, 40, 80, 0.25, True),
    BlockArgs(3, 5, [1], 6, 80, 112, 0.25, True),
    BlockArgs(4, 5, [2], 6, 112, 192, 0.25, True),
    BlockArgs(1, 3, [1], 6, 192, 320, 0.25, True),
)

# (width, depth, resolution, dropout)
_COEFFS = {
    "efficientnet-b0": (1.0, 1.0, 224, 0.2),
    "efficientnet-b1": (1.0, 1.1, 240, 0.2),
    "efficientnet-b2": (1.1, 1.2, 260, 0.3),
    "efficientnet-b3": (1.2, 1.4, 300, 0.3),
    "efficientnet-b4": (1.4, 1.8, 380, 0.4),
    "efficientnet-b5": (1.6, 2.2, 456, 0.4),
    "efficientnet-b6": (1.8, 2.6, 528, 0.5),
    "efficientnet-b7": (2.0, 3.1, 600, 0.5),
}

url_map = {k: f"https://local-fixture.invalid/{k}.pth" for k in _COEFFS}


def get_model_params(model_name, override_params):
    w, d, s, p = _COEFFS[model_name]
    gp = GlobalParams(
        width_coefficient=w, depth_coefficient=d, image_size=s,
        dropout_rate=p, num_classes=1000, batch_norm_momentum=0.99,
        batch_norm_epsilon=1e-3, drop_connect_rate=0.2, depth_divisor=8,
        min_depth=None, include_top=True)
    if override_params:
        gp = gp._replace(**override_params)
    return list(_B0_BLOCKS), gp


def round_filters(filters, global_params):
    multiplier = global_params.width_coefficient
    if not multiplier:
        return filters
    divisor = global_params.depth_divisor
    filters *= multiplier
    min_depth = global_params.min_depth or divisor
    new = max(min_depth, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats, global_params):
    multiplier = global_params.depth_coefficient
    if not multiplier:
        return repeats
    return int(math.ceil(multiplier * repeats))


def calculate_output_image_size(image_size, stride):
    if image_size is None:
        return None
    s = stride if isinstance(stride, int) else stride[0]
    return int(math.ceil(image_size / s))


def drop_connect(inputs, p, training):
    if not training:
        return inputs
    keep = 1 - p
    rand = keep + torch.rand((inputs.shape[0], 1, 1, 1),
                             dtype=inputs.dtype, device=inputs.device)
    return inputs / keep * torch.floor(rand)


class Conv2dStaticSamePadding(nn.Conv2d):
    """TF-SAME conv with the pad amounts fixed at construction from a
    STATIC square image size (ceil-division output size)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 image_size=None, **kwargs):
        super().__init__(in_channels, out_channels, kernel_size,
                         stride=stride, **kwargs)
        ih = image_size if isinstance(image_size, int) else image_size[0]
        k, s, d = self.kernel_size[0], self.stride[0], self.dilation[0]
        oh = math.ceil(ih / s)
        pad = max((oh - 1) * s + (k - 1) * d + 1 - ih, 0)
        if pad > 0:
            self.static_padding = nn.ZeroPad2d(
                (pad // 2, pad - pad // 2, pad // 2, pad - pad // 2))
        else:
            self.static_padding = nn.Identity()

    def forward(self, x):
        x = self.static_padding(x)
        return F.conv2d(x, self.weight, self.bias, self.stride,
                        self.padding, self.dilation, self.groups)


class MemoryEfficientSwish(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(x)


class MBConvBlock(nn.Module):
    def __init__(self, block_args, global_params, image_size=None):
        super().__init__()
        self._block_args = block_args
        bn_mom = 1 - global_params.batch_norm_momentum
        bn_eps = global_params.batch_norm_epsilon
        self.has_se = (block_args.se_ratio is not None
                       and 0 < block_args.se_ratio <= 1)
        self.id_skip = block_args.id_skip

        inp = block_args.input_filters
        oup = inp * block_args.expand_ratio
        if block_args.expand_ratio != 1:
            self._expand_conv = Conv2dStaticSamePadding(
                inp, oup, 1, image_size=image_size, bias=False)
            self._bn0 = nn.BatchNorm2d(oup, momentum=bn_mom, eps=bn_eps)

        k = block_args.kernel_size
        s = block_args.stride if isinstance(block_args.stride, int) \
            else block_args.stride[0]
        self._depthwise_conv = Conv2dStaticSamePadding(
            oup, oup, k, stride=s, groups=oup, image_size=image_size,
            bias=False)
        self._bn1 = nn.BatchNorm2d(oup, momentum=bn_mom, eps=bn_eps)
        image_size = calculate_output_image_size(image_size, s)

        if self.has_se:
            squeezed = max(1, int(inp * block_args.se_ratio))
            self._se_reduce = Conv2dStaticSamePadding(
                oup, squeezed, 1, image_size=(1, 1))
            self._se_expand = Conv2dStaticSamePadding(
                squeezed, oup, 1, image_size=(1, 1))

        final = block_args.output_filters
        self._project_conv = Conv2dStaticSamePadding(
            oup, final, 1, image_size=image_size, bias=False)
        self._bn2 = nn.BatchNorm2d(final, momentum=bn_mom, eps=bn_eps)
        self._swish = MemoryEfficientSwish()

    def forward(self, inputs, drop_connect_rate=None):
        x = inputs
        if self._block_args.expand_ratio != 1:
            x = self._swish(self._bn0(self._expand_conv(x)))
        x = self._swish(self._bn1(self._depthwise_conv(x)))
        if self.has_se:
            xs = F.adaptive_avg_pool2d(x, 1)
            xs = self._se_expand(self._swish(self._se_reduce(xs)))
            x = torch.sigmoid(xs) * x
        x = self._bn2(self._project_conv(x))
        s = self._block_args.stride
        s = s if isinstance(s, int) else s[0]
        if (self.id_skip and s == 1 and self._block_args.input_filters
                == self._block_args.output_filters):
            if drop_connect_rate:
                x = drop_connect(x, drop_connect_rate, self.training)
            x = x + inputs
        return x


class EfficientNet(nn.Module):
    def __init__(self, blocks_args=None, global_params=None):
        super().__init__()
        self._global_params = global_params
        self._blocks_args = blocks_args
        bn_mom = 1 - global_params.batch_norm_momentum
        bn_eps = global_params.batch_norm_epsilon
        image_size = global_params.image_size

        out_channels = round_filters(32, global_params)
        self._conv_stem = Conv2dStaticSamePadding(
            3, out_channels, 3, stride=2, image_size=image_size, bias=False)
        self._bn0 = nn.BatchNorm2d(out_channels, momentum=bn_mom, eps=bn_eps)
        image_size = calculate_output_image_size(image_size, 2)

        self._blocks = nn.ModuleList([])
        for ba in blocks_args:
            ba = ba._replace(
                input_filters=round_filters(ba.input_filters, global_params),
                output_filters=round_filters(ba.output_filters,
                                             global_params),
                num_repeat=round_repeats(ba.num_repeat, global_params))
            self._blocks.append(MBConvBlock(ba, global_params, image_size))
            image_size = calculate_output_image_size(image_size, ba.stride)
            if ba.num_repeat > 1:
                ba = ba._replace(input_filters=ba.output_filters, stride=[1])
            for _ in range(ba.num_repeat - 1):
                self._blocks.append(
                    MBConvBlock(ba, global_params, image_size))

        in_channels = ba.output_filters
        out_channels = round_filters(1280, global_params)
        self._conv_head = Conv2dStaticSamePadding(
            in_channels, out_channels, 1, image_size=image_size, bias=False)
        self._bn1 = nn.BatchNorm2d(out_channels, momentum=bn_mom, eps=bn_eps)
        self._avg_pooling = nn.AdaptiveAvgPool2d(1)
        self._dropout = nn.Dropout(global_params.dropout_rate)
        self._fc = nn.Linear(out_channels, global_params.num_classes)
        self._swish = MemoryEfficientSwish()

    def extract_features(self, inputs):
        x = self._swish(self._bn0(self._conv_stem(inputs)))
        for idx, block in enumerate(self._blocks):
            rate = self._global_params.drop_connect_rate
            if rate:
                rate *= float(idx) / len(self._blocks)
            x = block(x, drop_connect_rate=rate)
        return self._swish(self._bn1(self._conv_head(x)))

    def forward(self, inputs):
        x = self._avg_pooling(self.extract_features(inputs))
        x = x.flatten(start_dim=1)
        return self._fc(self._dropout(x))

    @classmethod
    def from_name(cls, model_name, **override_params):
        blocks_args, gp = get_model_params(model_name, override_params)
        return cls(blocks_args, gp)


def install():
    """Register this reconstruction as ``efficientnet_pytorch`` (+ .utils)
    so ``tests.reference_shim`` imports of the reference's
    efficient_encoder/efficientunet get a REAL model instead of the inert
    stub. Idempotent; overrides any stub already installed."""
    pkg = types.ModuleType("efficientnet_pytorch")
    pkg.EfficientNet = EfficientNet
    utils = types.ModuleType("efficientnet_pytorch.utils")
    utils.get_model_params = get_model_params
    utils.url_map = url_map
    utils.round_filters = round_filters
    utils.round_repeats = round_repeats
    utils.Conv2dStaticSamePadding = Conv2dStaticSamePadding
    utils.MemoryEfficientSwish = MemoryEfficientSwish
    pkg.utils = utils
    sys.modules["efficientnet_pytorch"] = pkg
    sys.modules["efficientnet_pytorch.utils"] = utils
    return pkg
