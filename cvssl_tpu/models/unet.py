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

TPU fast path (``s2d_levels`` > 0): the top ``s2d_levels`` encoder/decoder
levels run in space-to-depth coordinates (see ``ops/s2d.py``) so their
lane-padding-bound C=16/C=32 convs execute as full-width C=64/C=128 MXU
convs — an EXACT reformulation (same math, same parameters, same param
tree; weights stay ``(3, 3, C, Co)`` and are re-indexed at trace time).
``dtype=bfloat16`` additionally runs conv math in bf16 with f32 accumulation
(params, BatchNorm statistics and logits stay f32). Both are opt-in and
default-on for TPU via ``TrainConfig``.
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cvssl_tpu.ops.dropout import BitsDropout

from cvssl_tpu.ops import s2d as s2d_ops

DEFAULT_FEATURES = (16, 32, 64, 128, 256)
DEFAULT_DROPOUT = (0.05, 0.1, 0.2, 0.3, 0.5)


class ConvW(nn.Module):
    """Parameter container matching ``nn.Conv``'s param subtree
    ({kernel, bias}, lecun-normal/zeros init) without applying the conv —
    the s2d path applies the kernel itself via ``ops/s2d.py``."""
    features: int
    kernel_size: Sequence[int]
    in_features: int

    @nn.compact
    def __call__(self):
        shape = (*self.kernel_size, self.in_features, self.features)
        kernel = self.param("kernel", nn.initializers.lecun_normal(), shape)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        return kernel, bias


class S2DBatchNorm(nn.Module):
    """BatchNorm over ORIGINAL channels applied to an s2d tensor: statistics
    pool over the 4 sub-position channels of each original channel, so train
    and eval match plain ``nn.BatchNorm`` on the un-s2d tensor exactly.
    Param/batch_stats subtrees are shape-identical to ``nn.BatchNorm``'s."""
    features: int
    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None
    # element count per channel when the tensor carries zero overhang
    # positions that must not enter the statistics (shifted-grid form)
    true_count: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        c = self.features
        scale = self.param("scale", nn.initializers.ones_init(), (c,))
        bias = self.param("bias", nn.initializers.zeros_init(), (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        xg = x.reshape(x.shape[:-1] + (4, c))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = xg.astype(jnp.float32)
            axes = tuple(range(xf.ndim - 1))
            n = self.true_count
            if n is None:
                n = int(np.prod([xf.shape[i] for i in axes]))
            # biased variance, fast form — matches flax _compute_stats;
            # sums are exact under zero overhang, the count must be true
            mean = jnp.sum(xf, axes) / n
            var = jnp.sum(jnp.square(xf), axes) / n - jnp.square(mean)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (xg - mean) * inv + bias
        return y.reshape(x.shape).astype(self.dtype or x.dtype)


class ConvBlock(nn.Module):
    """conv3x3-BN-LeakyReLU-dropout-conv3x3-BN-LeakyReLU (``unet.py:31``).

    ``s2d=True``: input/output are s2d tensors (4x channels, half spatial);
    params are identical to the native block — kernels are re-indexed to the
    s2d domain at trace time (exact; ``ops/s2d.py``). ``s2d_pair`` (default)
    runs the two convs as the shifted-grid 2-tap pair — 2.25x fewer conv
    FLOPs, measured 1.16-1.33x faster on v5e; set False for the plain
    3x3-with-zeros form."""
    out_channels: int
    dropout_p: float
    s2d: bool = False
    s2d_pair: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, extra=None, *, train: bool):
        # ``extra`` is a second input channel-group (UpBlock's upsampled
        # x1, following the skip x2): conv(concat(x, e), K) ==
        # conv(x, K[:c]) + conv(e, K[c:]), so in s2d coords the grouped
        # channel concat (a real HBM interleave, ops/s2d.py::concat, plus
        # its backward split) never materializes. Param tree unchanged —
        # Conv_0 still holds the full (3, 3, c+ce, Co) kernel.
        if self.s2d:
            return self._call_s2d(x, extra, train=train)
        if extra is not None:
            x = jnp.concatenate([x, extra], axis=-1)
        x = nn.Conv(self.out_channels, (3, 3), padding=1,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        if self.dropout_p > 0:
            x = BitsDropout(self.dropout_p)(x, deterministic=not train)
        x = nn.Conv(self.out_channels, (3, 3), padding=1,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.leaky_relu(x, negative_slope=0.01)

    def _call_s2d(self, x, extra=None, *, train: bool):
        co = self.out_channels
        cx = x.shape[-1] // 4
        c_in = cx + (extra.shape[-1] // 4 if extra is not None else 0)
        k0, b0 = ConvW(co, (3, 3), c_in, name="Conv_0")()
        k1, b1 = ConvW(co, (3, 3), co, name="Conv_1")()
        if self.s2d_pair:
            b, hh, ww, _ = x.shape
            true_count = b * 4 * hh * ww  # per-channel, excluding overhang
            if extra is None:
                x = s2d_ops.pair_to_shifted(x, k0, b0, dtype=self.dtype)
            else:
                x = (s2d_ops.pair_to_shifted(x, k0[:, :, :cx], b0,
                                             dtype=self.dtype)
                     + s2d_ops.pair_to_shifted(extra, k0[:, :, cx:], None,
                                               dtype=self.dtype))
            x = S2DBatchNorm(co, use_running_average=not train,
                             dtype=self.dtype, true_count=true_count,
                             name="BatchNorm_0")(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
            if self.dropout_p > 0:
                x = BitsDropout(self.dropout_p)(x, deterministic=not train)
            # BN's bias/relu move the overhang off zero; restore the SAME-
            # padding semantics before the shifted->aligned conv
            x = s2d_ops.apply_shifted_mask(x)
            x = s2d_ops.pair_from_shifted(x, k1, b1, dtype=self.dtype)
            x = S2DBatchNorm(co, use_running_average=not train,
                             dtype=self.dtype, name="BatchNorm_1")(x)
            return nn.leaky_relu(x, negative_slope=0.01)
        if extra is None:
            x = s2d_ops.conv3x3(x, k0, b0, dtype=self.dtype)
        else:
            x = (s2d_ops.conv3x3(x, k0[:, :, :cx], b0, dtype=self.dtype)
                 + s2d_ops.conv3x3(extra, k0[:, :, cx:], None,
                                   dtype=self.dtype))
        x = S2DBatchNorm(co, use_running_average=not train,
                         dtype=self.dtype, name="BatchNorm_0")(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        if self.dropout_p > 0:
            x = BitsDropout(self.dropout_p)(x, deterministic=not train)
        x = s2d_ops.conv3x3(x, k1, b1, dtype=self.dtype)
        x = S2DBatchNorm(co, use_running_average=not train,
                         dtype=self.dtype, name="BatchNorm_1")(x)
        return nn.leaky_relu(x, negative_slope=0.01)


class DownBlock(nn.Module):
    """2x2 maxpool then ConvBlock (``unet.py:50``). In s2d coords the maxpool
    is a max over the 4 sub-position channels (``ops/s2d.py::group_max``)."""
    out_channels: int
    dropout_p: float
    s2d_in: bool = False   # input arrives in s2d form
    s2d_out: bool = False  # run this level's ConvBlock in s2d form
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        if self.s2d_in:
            x = s2d_ops.group_max(x)  # == maxpool 2x2/s2 of original
        else:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        if self.s2d_out:
            x = s2d_ops.space_to_depth(x)
        return ConvBlock(self.out_channels, self.dropout_p, s2d=self.s2d_out,
                         dtype=self.dtype)(x, train=train)


@functools.lru_cache(maxsize=None)
def _lerp_matrix(n_in: int, n_out: int):
    """(n_out, n_in) align_corners=True linear-interpolation matrix — two
    nonzeros per row. Applied as a matmul: TPU gathers run ~20 ns/element
    while the MXU does this 'wasteful' dense contraction in microseconds
    (the old gather formulation cost ~15 ms per UNet forward)."""
    import numpy as np
    pos = np.linspace(0.0, n_in - 1.0, n_out)
    i0 = np.floor(pos).astype(np.int64)
    i1 = np.minimum(i0 + 1, n_in - 1)
    f = (pos - i0).astype(np.float32)
    m = np.zeros((n_out, n_in), np.float32)
    m[np.arange(n_out), i0] += 1.0 - f
    m[np.arange(n_out), i1] += f
    return m


def bilinear_resize(x: jnp.ndarray, new_hw, align_corners: bool = True):
    """Bilinear resize with torch align_corners=True semantics (used by the
    bilinear UpBlock variant and DS/URPC logit upsampling). Implemented as
    two banded-matrix contractions on the MXU (exact same interpolation
    weights as the reference's F.interpolate(align_corners=True))."""
    b, h, w, c = x.shape
    nh, nw = new_hw
    if (nh, nw) == (h, w):
        return x
    if align_corners and nh > 1 and nw > 1:
        rm = jnp.asarray(_lerp_matrix(h, nh), x.dtype)
        cm = jnp.asarray(_lerp_matrix(w, nw), x.dtype)
        y = jnp.einsum("Hh,bhwc->bHwc", rm, x)
        return jnp.einsum("Ww,bhwc->bhWc", cm, y)
    return jax.image.resize(x, (b, nh, nw, c), method="bilinear")


def upsample2x_to_s2d(x: jnp.ndarray, s2d_in: bool = False):
    """Bilinear x2 (align_corners=True) emitting its output directly in s2d
    form: the (a, b) sub-position axes fall out of the two interpolation
    einsums as minor output axes, so the ``space_to_depth`` transpose that
    would otherwise follow (a strided HBM copy, mirrored in the backward)
    never materializes. With ``s2d_in`` the input is itself an s2d tensor
    and the leading ``depth_to_space`` is folded the same way. Same
    interpolation weights and row-then-column order as
    :func:`bilinear_resize` — numerically the same resize."""
    if s2d_in:
        b, hh, ww, gc = x.shape
        c = gc // 4
        h, w = 2 * hh, 2 * ww
        xg = x.reshape(b, hh, ww, 2, 2, c)
        # R[2i+a, 2ih+A] -> [i, a, ih, A]; likewise for columns
        rm = jnp.asarray(_lerp_matrix(h, 2 * h).reshape(h, 2, hh, 2),
                         x.dtype)
        cm = jnp.asarray(_lerp_matrix(w, 2 * w).reshape(w, 2, ww, 2),
                         x.dtype)
        t = jnp.einsum("iahA,bhwABc->biwaBc", rm, xg)
        y = jnp.einsum("jpwB,biwaBc->bijapc", cm, t)
    else:
        b, h, w, c = x.shape
        rm = jnp.asarray(_lerp_matrix(h, 2 * h).reshape(h, 2, h), x.dtype)
        cm = jnp.asarray(_lerp_matrix(w, 2 * w).reshape(w, 2, w), x.dtype)
        t = jnp.einsum("iah,bhwc->biwac", rm, x)
        y = jnp.einsum("jpw,biwac->bijapc", cm, t)
    return y.reshape(b, h, w, 4 * c)


class UpBlock(nn.Module):
    """Upsample + skip concat + ConvBlock (``unet.py:65-86``).

    bilinear=True: 1x1 conv to skip width then bilinear x2 (align_corners).
    bilinear=False (reference UNet default): 2x2 stride-2 transpose conv.

    s2d=True: the skip ``x2`` arrives in s2d form and the ConvBlock runs in
    s2d coords; the 1x1-conv + bilinear-x2 on ``x1`` stay in native coords
    (cheap, bandwidth-bound) and the result is s2d'd before the concat.
    s2d_x1=True additionally means ``x1`` itself arrives in s2d form.
    """
    out_channels: int
    skip_channels: int
    dropout_p: float = 0.0
    bilinear: bool = True
    s2d: bool = False
    s2d_x1: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x1, x2, *, train: bool):
        if self.s2d:
            assert self.bilinear, "s2d UpBlock implements the bilinear path"
            if self.s2d_x1:
                # stay in s2d coords end-to-end: 1x1 conv is a block-
                # diagonal matmul there, and the x2 upsample emits s2d
                # directly (both d2s and s2d transposes fold away)
                k, kb = ConvW(self.skip_channels, (1, 1),
                              x1.shape[-1] // 4, name="Conv_0")()
                x1 = s2d_ops.conv1x1(x1, k, kb, dtype=self.dtype)
                x1 = upsample2x_to_s2d(x1, s2d_in=True)
            else:
                x1 = nn.Conv(self.skip_channels, (1, 1),
                             dtype=self.dtype)(x1)
                x1 = upsample2x_to_s2d(x1)
            # no s2d concat: the ConvBlock reads (x2, x1) as two channel
            # groups and splits its first kernel instead (skip-first
            # order matches the reference's torch.cat([x2, x1], dim=1))
            return ConvBlock(self.out_channels, self.dropout_p, s2d=True,
                             dtype=self.dtype)(x2, x1, train=train)
        if self.bilinear:
            x1 = nn.Conv(self.skip_channels, (1, 1), dtype=self.dtype)(x1)
            x1 = bilinear_resize(x1, (x1.shape[1] * 2, x1.shape[2] * 2))
        else:
            x1 = nn.ConvTranspose(self.skip_channels, (2, 2),
                                  strides=(2, 2), dtype=self.dtype)(x1)
        x = jnp.concatenate([x2, x1], axis=-1)
        return ConvBlock(self.out_channels, self.dropout_p,
                         dtype=self.dtype)(x, train=train)


class Encoder(nn.Module):
    """5-level encoder returning all feature maps (``unet.py:89-116``).

    ``s2d_levels`` = number of top levels computed in s2d coordinates; those
    entries of the returned list are s2d tensors (the decoder mirrors the
    setting)."""
    in_chns: int = 1
    features: Sequence[int] = DEFAULT_FEATURES
    dropout: Sequence[float] = DEFAULT_DROPOUT
    s2d_levels: int = 0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        f, d, s, dt = self.features, self.dropout, self.s2d_levels, self.dtype
        if s >= 1:
            x = s2d_ops.space_to_depth(x)
        x0 = ConvBlock(f[0], d[0], s2d=s >= 1, dtype=dt)(x, train=train)
        x1 = DownBlock(f[1], d[1], s2d_in=s >= 1, s2d_out=s >= 2,
                       dtype=dt)(x0, train=train)
        x2 = DownBlock(f[2], d[2], s2d_in=s >= 2, s2d_out=s >= 3,
                       dtype=dt)(x1, train=train)
        x3 = DownBlock(f[3], d[3], s2d_in=s >= 3, dtype=dt)(x2, train=train)
        x4 = DownBlock(f[4], d[4], dtype=dt)(x3, train=train)
        return [x0, x1, x2, x3, x4]


class Decoder(nn.Module):
    """4-level decoder + 3x3 out conv (``unet.py:119-153``). Logits are
    returned in f32 regardless of compute dtype."""
    num_classes: int
    features: Sequence[int] = DEFAULT_FEATURES
    bilinear: bool = True
    s2d_levels: int = 0
    s2d_logits: bool = False  # emit grouped s2d logits (B, HH, WW, 4, C)
    logits_f32: bool = True   # False: return logits in compute dtype (train
    # step only — every train-loss consumer casts to f32 at entry, so values
    # are bit-identical, but the materialized f32 relayout of the largest
    # activation is skipped; eval paths keep the f32 contract)
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, *, train: bool):
        f, s, dt = self.features, self.s2d_levels, self.dtype
        x0, x1, x2, x3, x4 = feats
        x = UpBlock(f[3], f[3], bilinear=self.bilinear,
                    dtype=dt)(x4, x3, train=train)
        x = UpBlock(f[2], f[2], bilinear=self.bilinear, s2d=s >= 3,
                    dtype=dt)(x, x2, train=train)
        x = UpBlock(f[1], f[1], bilinear=self.bilinear, s2d=s >= 2,
                    s2d_x1=s >= 3, dtype=dt)(x, x1, train=train)
        x = UpBlock(f[0], f[0], bilinear=self.bilinear, s2d=s >= 1,
                    s2d_x1=s >= 2, dtype=dt)(x, x0, train=train)
        if s >= 1:
            k, b = ConvW(self.num_classes, (3, 3), f[0], name="Conv_0")()
            out = s2d_ops.conv3x3(x, k, b, dtype=dt)
            if self.s2d_logits:
                # grouped view (B, HH, WW, 4, C): the SAME logits, class
                # axis still last — every per-pixel loss is invariant, and
                # skipping depth_to_space avoids a 1.5 ms transposing copy
                # (plus its backward mirror) through 3%-occupied lanes at
                # (B, 256, 256, 4) f32 (scripts/probe_grad_profile.py)
                bb, hh, ww, gc = out.shape
                out = out.reshape(bb, hh, ww, 4, gc // 4)
            else:
                out = s2d_ops.depth_to_space(out)
        else:
            out = nn.Conv(self.num_classes, (3, 3), padding=1, dtype=dt)(x)
        return out.astype(jnp.float32) if self.logits_f32 else out


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
    """The workhorse 2D UNet (``unet.py:304-321``).

    ``s2d_levels``/``dtype``: TPU fast path (see module docstring) — exact
    same function and param tree, different XLA program."""
    in_chns: int = 1
    num_classes: int = 4
    features: Sequence[int] = DEFAULT_FEATURES
    dropout: Sequence[float] = DEFAULT_DROPOUT
    bilinear: bool = True
    s2d_levels: int = 0
    s2d_logits: bool = False  # grouped (B, H/2, W/2, 4, C) logits — pair
    # with ops.s2d.space_to_depth_labels; train-step only (eval code
    # expects original layout)
    logits_f32: bool = True   # see Decoder.logits_f32
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.s2d_levels:
            div = 2 ** self.s2d_levels
            assert x.shape[1] % div == 0 and x.shape[2] % div == 0, x.shape
        feats = Encoder(self.in_chns, self.features, self.dropout,
                        s2d_levels=self.s2d_levels, dtype=self.dtype)(
            x, train=train)
        return Decoder(self.num_classes, self.features, self.bilinear,
                       s2d_levels=self.s2d_levels,
                       s2d_logits=self.s2d_logits and self.s2d_levels >= 1,
                       logits_f32=self.logits_f32,
                       dtype=self.dtype)(feats, train=train)


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
