"""2D UNet family (Flax), NHWC.

Architectural parity with the reference ``code/networks/unet.py``:
channels [16, 32, 64, 128, 256], encoder dropout [.05, .1, .2, .3, .5],
two 3x3 conv + BatchNorm + LeakyReLU per block (``unet.py:31-47``), maxpool
down (``:50-62``), 1x1-conv + bilinear(align_corners) up with skip concat
(``:65-86``), 3x3 output conv (``:138``).

NOTE: the reference ``UNet`` sets ``'bilinear': False`` in its params dict
(``unet.py:312``) but ``Decoder.__init__`` never forwards the flag to
``UpBlock`` (``unet.py:129-136``), whose default is ``bilinear=True`` — so the
reference ALWAYS runs the bilinear path (verified by parameter count:
1,813,764 == bilinear decoder). We default to ``bilinear=True`` to match the
actual behavior, but our flag really works.

Deviations (deliberate, TPU-first):
* NHWC layout (torch is NCHW) — channels-last is XLA:TPU's native layout.
* BatchNorm eps/momentum match torch defaults (1e-5 / running-avg momentum
  0.9 in flax convention == torch momentum 0.1).

Variants: ``UNetCCT`` (3 perturbed aux decoders, ``unet.py:324-349``),
``UNetDS`` (deep supervision, ``:373-391``), ``UNetURPC`` (multi-scale with
in-decoder perturbations, ``:352-370``).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

DEFAULT_FEATURES = (16, 32, 64, 128, 256)
DEFAULT_DROPOUT = (0.05, 0.1, 0.2, 0.3, 0.5)


class ConvBlock(nn.Module):
    """conv3x3-BN-LeakyReLU-dropout-conv3x3-BN-LeakyReLU (``unet.py:31``)."""
    out_channels: int
    dropout_p: float

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = nn.Conv(self.out_channels, (3, 3), padding=1)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        if self.dropout_p > 0:
            x = nn.Dropout(self.dropout_p, deterministic=not train)(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        return nn.leaky_relu(x, negative_slope=0.01)


class DownBlock(nn.Module):
    """2x2 maxpool then ConvBlock (``unet.py:50``)."""
    out_channels: int
    dropout_p: float

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return ConvBlock(self.out_channels, self.dropout_p)(x, train=train)


def bilinear_resize(x: jnp.ndarray, new_hw, align_corners: bool = True):
    """Bilinear resize with torch align_corners=True semantics (used by the
    bilinear UpBlock variant and DS/URPC logit upsampling)."""
    b, h, w, c = x.shape
    nh, nw = new_hw
    if align_corners and nh > 1 and nw > 1:
        # Sample positions i * (h-1)/(nh-1) — jax.image.resize uses
        # half-pixel centers, so gather explicitly.
        rows = jnp.linspace(0.0, h - 1.0, nh)
        cols = jnp.linspace(0.0, w - 1.0, nw)
        r0 = jnp.floor(rows).astype(jnp.int32)
        c0 = jnp.floor(cols).astype(jnp.int32)
        r1 = jnp.minimum(r0 + 1, h - 1)
        c1 = jnp.minimum(c0 + 1, w - 1)
        fr = (rows - r0)[None, :, None, None]
        fc = (cols - c0)[None, None, :, None]
        top = x[:, r0][:, :, c0] * (1 - fc) + x[:, r0][:, :, c1] * fc
        bot = x[:, r1][:, :, c0] * (1 - fc) + x[:, r1][:, :, c1] * fc
        return top * (1 - fr) + bot * fr
    return jax.image.resize(x, (b, nh, nw, c), method="bilinear")


class UpBlock(nn.Module):
    """Upsample + skip concat + ConvBlock (``unet.py:65-86``).

    bilinear=True: 1x1 conv to skip width then bilinear x2 (align_corners).
    bilinear=False (reference UNet default): 2x2 stride-2 transpose conv.
    """
    out_channels: int
    skip_channels: int
    dropout_p: float = 0.0
    bilinear: bool = True

    @nn.compact
    def __call__(self, x1, x2, *, train: bool):
        if self.bilinear:
            x1 = nn.Conv(self.skip_channels, (1, 1))(x1)
            x1 = bilinear_resize(x1, (x1.shape[1] * 2, x1.shape[2] * 2))
        else:
            x1 = nn.ConvTranspose(self.skip_channels, (2, 2),
                                  strides=(2, 2))(x1)
        x = jnp.concatenate([x2, x1], axis=-1)
        return ConvBlock(self.out_channels, self.dropout_p)(x, train=train)


class Encoder(nn.Module):
    """5-level encoder returning all feature maps (``unet.py:89-116``)."""
    in_chns: int = 1
    features: Sequence[int] = DEFAULT_FEATURES
    dropout: Sequence[float] = DEFAULT_DROPOUT

    @nn.compact
    def __call__(self, x, *, train: bool):
        f, d = self.features, self.dropout
        x0 = ConvBlock(f[0], d[0])(x, train=train)
        x1 = DownBlock(f[1], d[1])(x0, train=train)
        x2 = DownBlock(f[2], d[2])(x1, train=train)
        x3 = DownBlock(f[3], d[3])(x2, train=train)
        x4 = DownBlock(f[4], d[4])(x3, train=train)
        return [x0, x1, x2, x3, x4]


class Decoder(nn.Module):
    """4-level decoder + 3x3 out conv (``unet.py:119-153``)."""
    num_classes: int
    features: Sequence[int] = DEFAULT_FEATURES
    bilinear: bool = True

    @nn.compact
    def __call__(self, feats, *, train: bool):
        f = self.features
        x0, x1, x2, x3, x4 = feats
        x = UpBlock(f[3], f[3], bilinear=self.bilinear)(x4, x3, train=train)
        x = UpBlock(f[2], f[2], bilinear=self.bilinear)(x, x2, train=train)
        x = UpBlock(f[1], f[1], bilinear=self.bilinear)(x, x1, train=train)
        x = UpBlock(f[0], f[0], bilinear=self.bilinear)(x, x0, train=train)
        return nn.Conv(self.num_classes, (3, 3), padding=1)(x)


# ---------------------------------------------------------------------------
# Feature perturbations (CCT / URPC, ``unet.py:272-301``)
# ---------------------------------------------------------------------------

def feature_noise(rng, x, uniform_range: float = 0.3):
    """x * U(-r, r) + x, noise shared across batch (``unet.py:288-301``:
    sampled over x.shape[1:], broadcast on batch)."""
    noise = jax.random.uniform(rng, x.shape[1:], minval=-uniform_range,
                               maxval=uniform_range)
    return x * noise[None] + x


def feature_dropout(rng, x):
    """Drop high-attention sites: attention = channel-mean; per-sample
    threshold = max * U(0.7, 0.9); keep attention < threshold
    (``unet.py:277-285``). NHWC: channel axis -1."""
    attention = jnp.mean(x, axis=-1, keepdims=True)
    max_val = jnp.max(attention.reshape(x.shape[0], -1), axis=1)
    thresh = max_val * jax.random.uniform(rng, (x.shape[0],),
                                          minval=0.7, maxval=0.9)
    thresh = thresh.reshape(-1, 1, 1, 1)
    return x * (attention < thresh).astype(x.dtype)


def dropout_perturb(rng, x, p: float = 0.3):
    """Plain inverted dropout (``unet.py:272-274``)."""
    keep = jax.random.bernoulli(rng, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0)


# ---------------------------------------------------------------------------
# Full models
# ---------------------------------------------------------------------------

class UNet(nn.Module):
    """The workhorse 2D UNet (``unet.py:304-321``)."""
    in_chns: int = 1
    num_classes: int = 4
    features: Sequence[int] = DEFAULT_FEATURES
    dropout: Sequence[float] = DEFAULT_DROPOUT
    bilinear: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = Encoder(self.in_chns, self.features, self.dropout)(
            x, train=train)
        return Decoder(self.num_classes, self.features, self.bilinear)(
            feats, train=train)


class UNetFeature(nn.Module):
    """UNet that also returns the decoder's penultimate feature map — used by
    contrastive trainers that attach projector heads to features."""
    in_chns: int = 1
    num_classes: int = 4
    features: Sequence[int] = DEFAULT_FEATURES
    dropout: Sequence[float] = DEFAULT_DROPOUT

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        f = self.features
        feats = Encoder(self.in_chns, self.features, self.dropout)(
            x, train=train)
        x0, x1, x2, x3, x4 = feats
        h = UpBlock(f[3], f[3])(x4, x3, train=train)
        h = UpBlock(f[2], f[2])(h, x2, train=train)
        h = UpBlock(f[1], f[1])(h, x1, train=train)
        h = UpBlock(f[0], f[0])(h, x0, train=train)
        logits = nn.Conv(self.num_classes, (3, 3), padding=1)(h)
        return logits, h


class UNetCCT(nn.Module):
    """UNet with a main decoder + 3 aux decoders fed perturbed encoder
    features (``unet.py:324-349``). Returns 4 logit maps. Perturbation RNG
    comes from the 'perturb' stream when training."""
    in_chns: int = 1
    num_classes: int = 4
    features: Sequence[int] = DEFAULT_FEATURES
    dropout: Sequence[float] = DEFAULT_DROPOUT

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = Encoder(self.in_chns, self.features, self.dropout)(
            x, train=train)
        main = Decoder(self.num_classes, self.features)(feats, train=train)
        if train:
            rng = self.make_rng("perturb")
            rngs = jax.random.split(rng, 3 * len(feats)).reshape(3, len(feats), -1)
            aux1_f = [feature_noise(rngs[0, i], f) for i, f in enumerate(feats)]
            aux2_f = [dropout_perturb(rngs[1, i], f) for i, f in enumerate(feats)]
            aux3_f = [feature_dropout(rngs[2, i], f) for i, f in enumerate(feats)]
        else:
            aux1_f = aux2_f = aux3_f = feats
        aux1 = Decoder(self.num_classes, self.features)(aux1_f, train=train)
        aux2 = Decoder(self.num_classes, self.features)(aux2_f, train=train)
        aux3 = Decoder(self.num_classes, self.features)(aux3_f, train=train)
        return main, aux1, aux2, aux3


class _MultiScaleDecoder(nn.Module):
    """Shared body of DS/URPC decoders: per-level 3x3 heads whose outputs are
    upsampled to the input resolution (``unet.py:156-269``)."""
    num_classes: int
    features: Sequence[int] = DEFAULT_FEATURES
    perturb: bool = False  # URPC: dropout/fdrop/fnoise before aux heads

    @nn.compact
    def __call__(self, feats, out_hw, *, train: bool = False):
        f = self.features
        x0, x1, x2, x3, x4 = feats

        x = UpBlock(f[3], f[3])(x4, x3, train=train)
        h3 = x
        if self.perturb and train:
            h3 = dropout_perturb(self.make_rng("perturb"), h3, p=0.5)
        dp3 = nn.Conv(self.num_classes, (3, 3), padding=1)(h3)

        x = UpBlock(f[2], f[2])(x, x2, train=train)
        h2 = x
        if self.perturb and train:
            h2 = feature_dropout(self.make_rng("perturb"), h2)
        dp2 = nn.Conv(self.num_classes, (3, 3), padding=1)(h2)

        x = UpBlock(f[1], f[1])(x, x1, train=train)
        h1 = x
        if self.perturb and train:
            h1 = feature_noise(self.make_rng("perturb"), h1)
        dp1 = nn.Conv(self.num_classes, (3, 3), padding=1)(h1)

        x = UpBlock(f[0], f[0])(x, x0, train=train)
        dp0 = nn.Conv(self.num_classes, (3, 3), padding=1)(x)

        # torch F.interpolate default mode='nearest'
        def up(z):
            b, h, w, c = z.shape
            return jax.image.resize(z, (b, out_hw[0], out_hw[1], c), "nearest")

        return dp0, up(dp1), up(dp2), up(dp3)


class UNetDS(nn.Module):
    """Deep-supervision UNet (``unet.py:373-391``) — 4 logit maps at input
    resolution."""
    in_chns: int = 1
    num_classes: int = 4
    features: Sequence[int] = DEFAULT_FEATURES
    dropout: Sequence[float] = DEFAULT_DROPOUT

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = Encoder(self.in_chns, self.features, self.dropout)(
            x, train=train)
        return _MultiScaleDecoder(self.num_classes, self.features,
                                  perturb=False)(feats, x.shape[1:3],
                                                 train=train)


class UNetURPC(nn.Module):
    """URPC UNet (``unet.py:352-370``) — multi-scale heads with stochastic
    perturbations before the aux heads during training."""
    in_chns: int = 1
    num_classes: int = 4
    features: Sequence[int] = DEFAULT_FEATURES
    dropout: Sequence[float] = DEFAULT_DROPOUT

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = Encoder(self.in_chns, self.features, self.dropout)(
            x, train=train)
        return _MultiScaleDecoder(self.num_classes, self.features,
                                  perturb=True)(feats, x.shape[1:3],
                                                train=train)
