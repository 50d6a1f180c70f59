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

TPU fast path (``s2d_levels`` > 0 on ``UNet3D``): the top levels run with
the H, W axes in space-to-depth coordinates (``ops/s2d.py`` 3D helpers) so
their lane-padding-bound C=16/C=32 convs execute as C=64/C=128 MXU convs —
exact reformulation, same param tree (kernels stay (3,3,3,C,Co) and are
re-indexed at trace time). Auto-on for TPU via TrainConfig.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from cvssl_tpu.ops.dropout import BitsDropout

from cvssl_tpu.ops import s2d as s2d_ops


def instance_norm(x: jnp.ndarray, eps: float = 1e-5,
                  dtype=None) -> jnp.ndarray:
    """Per-sample per-channel normalization over spatial dims (torch
    InstanceNorm affine=False). Statistics in f32."""
    xf = x.astype(jnp.float32)
    axes = tuple(range(1, x.ndim - 1))
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.var(xf, axis=axes, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y.astype(dtype or x.dtype)


def instance_norm_s2d(x: jnp.ndarray, eps: float = 1e-5,
                      dtype=None, true_count=None) -> jnp.ndarray:
    """instance_norm of the ORIGINAL tensor computed on its (H, W)-s2d
    form: statistics pool over the 4 sub-position channels of each original
    channel — exact (same value set). ``true_count`` excludes zero overhang
    positions of the shifted-grid form from the statistics denominators."""
    b, d, hh, ww, gc = x.shape
    c = gc // 4
    xg = x.reshape(b, d, hh, ww, 4, c).astype(jnp.float32)
    n = true_count or (d * hh * ww * 4)
    axes = (1, 2, 3, 4)
    mean = jnp.sum(xg, axis=axes, keepdims=True) / n
    var = jnp.sum(jnp.square(xg), axis=axes, keepdims=True) / n \
        - jnp.square(mean)
    y = (xg - mean) * jax.lax.rsqrt(var + eps)
    return y.reshape(x.shape).astype(dtype or x.dtype)


def channel_dropout(rng, x, p: float):
    """torch Dropout3d: zero whole channels, scale survivors by 1/(1-p)."""
    keep = jax.random.bernoulli(rng, 1.0 - p,
                                (x.shape[0],) + (1,) * (x.ndim - 2) +
                                (x.shape[-1],))
    return jnp.where(keep, x / (1.0 - p), 0.0)


def channel_dropout_s2d(rng, x, p: float):
    """channel_dropout of the ORIGINAL tensor on its (H,W)-s2d form: the 4
    sub-position channels of each original channel drop together (same
    per-ORIGINAL-channel Bernoulli as the native op)."""
    b, d, hh, ww, gc = x.shape
    c = gc // 4
    keep = jax.random.bernoulli(rng, 1.0 - p, (b, 1, 1, 1, 1, c))
    xg = x.reshape(b, d, hh, ww, 4, c)
    return jnp.where(keep, xg / (1.0 - p), 0.0).reshape(x.shape)


def _up2_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """2x half-pixel linear upsample along one axis as its closed 2-tap
    form: out[2i] = .25*x[i-1] + .75*x[i], out[2i+1] = .75*x[i] +
    .25*x[i+1] (edges clamped) — shifts + adds + an adjacent-axis
    stack/merge, no gathers/transposes.

    MEASURED SLOWER than jax.image.resize as the full-model upsample
    (round 5, probe_3d_profile on chip: UAMT-3D step 259 -> 319 ms,
    sliding window 296 -> 338 ms with trilinear_x2 built from this) —
    resize's per-axis banded contractions beat elementwise interleave on
    TPU. Kept (a) as the H-axis halo-exchange form (parallel/halo.py,
    where the cross-shard axis can't go through resize) and (b) as a
    pinned-equivalent oracle (test_models_3d.py)."""
    n = x.shape[axis]
    xm = jnp.concatenate([jax.lax.slice_in_dim(x, 0, 1, axis=axis),
                          jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)],
                         axis)
    xp = jnp.concatenate([jax.lax.slice_in_dim(x, 1, None, axis=axis),
                          jax.lax.slice_in_dim(x, n - 1, None, axis=axis)],
                         axis)
    lo = 0.25 * xm + 0.75 * x
    hi = 0.75 * x + 0.25 * xp
    y = jnp.stack([lo, hi], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] *= 2
    return y.reshape(shape)


def trilinear_x2(x: jnp.ndarray) -> jnp.ndarray:
    """Trilinear upsample x2 (torch align_corners=False == jax half-pixel).
    jax.image.resize, deliberately: see _up2_axis for the measured-slower
    closed-form alternative."""
    b, d, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * d, 2 * h, 2 * w, c), "trilinear")


class UnetConv3(nn.Module):
    """Two conv3^3 + InstanceNorm + ReLU (``networks/utils.py:99-124``).
    ``s2d=True``: in/out are (H, W)-s2d tensors; params identical to the
    native block (see module docstring)."""
    out_channels: int
    s2d: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.s2d:
            from cvssl_tpu.models.unet import ConvW
            co = self.out_channels
            k0, b0 = ConvW(co, (3, 3, 3), x.shape[-1] // 4, name="Conv_0")()
            k1, b1 = ConvW(co, (3, 3, 3), co, name="Conv_1")()
            # shifted-grid 2-tap pair (2.25x fewer conv FLOPs; exactness
            # and overhang semantics as in the 2D ConvBlock)
            _, d, hh, ww, _ = x.shape
            x = s2d_ops.conv3x3x3_to_shifted(x, k0, b0, dtype=self.dtype)
            x = nn.relu(instance_norm_s2d(x, dtype=self.dtype,
                                          true_count=d * hh * ww * 4))
            x = s2d_ops.apply_shifted_mask3d(x)
            x = s2d_ops.conv3x3x3_from_shifted(x, k1, b1, dtype=self.dtype)
            return nn.relu(instance_norm_s2d(x, dtype=self.dtype))
        x = nn.Conv(self.out_channels, (3, 3, 3), padding=1,
                    dtype=self.dtype)(x)
        x = nn.relu(instance_norm(x, dtype=self.dtype))
        x = nn.Conv(self.out_channels, (3, 3, 3), padding=1,
                    dtype=self.dtype)(x)
        return nn.relu(instance_norm(x, dtype=self.dtype))


class UnetUp3CT(nn.Module):
    """Trilinear up x2 -> concat skip -> UnetConv3 (``utils.py:260-277``).

    s2d mode: the skip arrives in s2d form and the ConvBlock runs in s2d
    coords; the trilinear x2 on ``below`` runs in native coords (cheap)
    and is s2d'd before the concat. ``s2d_below``: ``below`` is s2d too."""
    out_channels: int
    s2d: bool = False
    s2d_below: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, skip, below, *, train: bool = False):
        if self.s2d:
            if self.s2d_below:
                below = s2d_ops.depth_to_space3d(below)
            up = s2d_ops.space_to_depth3d(trilinear_x2(below))
            x = s2d_ops.concat3d([skip, up],
                                 [skip.shape[-1] // 4, up.shape[-1] // 4])
            return UnetConv3(self.out_channels, s2d=True,
                             dtype=self.dtype)(x, train=train)
        up = trilinear_x2(below)
        return UnetConv3(self.out_channels, dtype=self.dtype)(
            jnp.concatenate([skip, up], axis=-1), train=train)


class UNet3D(nn.Module):
    """``unet_3D`` (``unet_3D.py:20-97``). ``s2d_levels``/``dtype``: TPU
    fast path — same function, same param tree (module docstring)."""
    in_chns: int = 1
    num_classes: int = 2
    feature_scale: int = 4
    dropout: float = 0.3  # reference fixes p=0.3; exposed for parity tests
    s2d_levels: int = 0
    logits_f32: bool = True  # False: logits in compute dtype (train step
    # only — all train-loss consumers cast to f32 at entry, values
    # bit-identical; halves the HBM bytes of UAMT's (T*u, D, H, W, C)
    # MC-teacher logit tensor). Eval keeps the f32 contract.
    dtype: Any = None

    def _cast_out(self, out):
        return out.astype(jnp.float32) if self.logits_f32 else out

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        f = [int(v / self.feature_scale) for v in (64, 128, 256, 512, 1024)]
        s, dt = self.s2d_levels, self.dtype
        if s == 0:
            return self._call_native(x, f, train)
        div = 2 ** s
        assert x.shape[2] % div == 0 and x.shape[3] % div == 0, x.shape
        assert 1 <= s <= 2

        def pool_d(z):  # depth-axis half of the 2^3 maxpool
            return nn.max_pool(z, (2, 1, 1), (2, 1, 1))

        h = s2d_ops.space_to_depth3d(x)
        conv1 = UnetConv3(f[0], s2d=True, dtype=dt)(h, train=train)
        h = pool_d(s2d_ops.group_max3d(conv1))       # full 2^3 pool, native
        if s >= 2:
            h = s2d_ops.space_to_depth3d(h)
        conv2 = UnetConv3(f[1], s2d=s >= 2, dtype=dt)(h, train=train)
        if s >= 2:
            h = pool_d(s2d_ops.group_max3d(conv2))
        else:
            h = nn.max_pool(conv2, (2, 2, 2), (2, 2, 2))
        conv3 = UnetConv3(f[2], dtype=dt)(h, train=train)
        conv4 = UnetConv3(f[3], dtype=dt)(
            nn.max_pool(conv3, (2, 2, 2), (2, 2, 2)), train=train)
        center = UnetConv3(f[4], dtype=dt)(
            nn.max_pool(conv4, (2, 2, 2), (2, 2, 2)), train=train)
        center = BitsDropout(self.dropout)(center, deterministic=not train)
        up4 = UnetUp3CT(f[3], dtype=dt)(conv4, center, train=train)
        up3 = UnetUp3CT(f[2], dtype=dt)(conv3, up4, train=train)
        up2 = UnetUp3CT(f[1], s2d=s >= 2, dtype=dt)(conv2, up3, train=train)
        up1 = UnetUp3CT(f[0], s2d=True, s2d_below=s >= 2,
                        dtype=dt)(conv1, up2, train=train)
        up1 = BitsDropout(self.dropout)(up1, deterministic=not train)
        from cvssl_tpu.models.unet import ConvW
        k, b = ConvW(self.num_classes, (1, 1, 1), f[0], name="Conv_0")()
        out = s2d_ops.conv1x1(up1, k.reshape(f[0], self.num_classes), b,
                              dtype=dt)
        return self._cast_out(s2d_ops.depth_to_space3d(out))

    def _call_native(self, x, f, train):
        dt = self.dtype
        conv1 = UnetConv3(f[0], dtype=dt)(x, train=train)
        conv2 = UnetConv3(f[1], dtype=dt)(
            nn.max_pool(conv1, (2, 2, 2), (2, 2, 2)), train=train)
        conv3 = UnetConv3(f[2], dtype=dt)(
            nn.max_pool(conv2, (2, 2, 2), (2, 2, 2)), train=train)
        conv4 = UnetConv3(f[3], dtype=dt)(
            nn.max_pool(conv3, (2, 2, 2), (2, 2, 2)), train=train)
        center = UnetConv3(f[4], dtype=dt)(
            nn.max_pool(conv4, (2, 2, 2), (2, 2, 2)), train=train)
        center = BitsDropout(self.dropout)(center, deterministic=not train)
        up4 = UnetUp3CT(f[3], dtype=dt)(conv4, center, train=train)
        up3 = UnetUp3CT(f[2], dtype=dt)(conv3, up4, train=train)
        up2 = UnetUp3CT(f[1], dtype=dt)(conv2, up3, train=train)
        up1 = UnetUp3CT(f[0], dtype=dt)(conv1, up2, train=train)
        up1 = BitsDropout(self.dropout)(up1, deterministic=not train)
        out = nn.Conv(self.num_classes, (1, 1, 1), dtype=dt)(up1)
        return self._cast_out(out)


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
    channel dropout p = .5/.3/.2/.1 down the decoder. ``s2d_levels``/
    ``dtype``: TPU fast path like ``UNet3D`` (exact, same param tree;
    channel dropout drops the 4 sub-position channels together)."""
    in_chns: int = 1
    num_classes: int = 2
    feature_scale: int = 4
    s2d_levels: int = 0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        f = [int(v / self.feature_scale) for v in (64, 128, 256, 512, 1024)]
        s, dt = self.s2d_levels, self.dtype
        assert 0 <= s <= 2

        def pool_d(z):
            return nn.max_pool(z, (2, 1, 1), (2, 1, 1))

        if s >= 1:
            h = s2d_ops.space_to_depth3d(x)
        else:
            h = x
        conv1 = UnetConv3(f[0], s2d=s >= 1, dtype=dt)(h, train=train)
        if s >= 1:
            h = pool_d(s2d_ops.group_max3d(conv1))
            if s >= 2:
                h = s2d_ops.space_to_depth3d(h)
        else:
            h = nn.max_pool(conv1, (2, 2, 2), (2, 2, 2))
        conv2 = UnetConv3(f[1], s2d=s >= 2, dtype=dt)(h, train=train)
        if s >= 2:
            h = pool_d(s2d_ops.group_max3d(conv2))
        else:
            h = nn.max_pool(conv2, (2, 2, 2), (2, 2, 2))
        conv3 = UnetConv3(f[2], dtype=dt)(h, train=train)
        conv4 = UnetConv3(f[3], dtype=dt)(
            nn.max_pool(conv3, (2, 2, 2), (2, 2, 2)), train=train)
        center = UnetConv3(f[4], dtype=dt)(
            nn.max_pool(conv4, (2, 2, 2), (2, 2, 2)), train=train)

        # channel dropout applies in-line: the dropped map feeds BOTH its DSV
        # head and the next up level (reference forward, :75-100)
        rngs = jax.random.split(self.make_rng("perturb"), 4) if train else None
        up4 = UnetUp3CT(f[3], dtype=dt)(conv4, center, train=train)
        if train:
            up4 = channel_dropout(rngs[0], up4, 0.5)
        up3 = UnetUp3CT(f[2], dtype=dt)(conv3, up4, train=train)
        if train:
            up3 = channel_dropout(rngs[1], up3, 0.3)
        up2 = UnetUp3CT(f[1], s2d=s >= 2, dtype=dt)(conv2, up3, train=train)
        if train:
            up2 = (channel_dropout_s2d if s >= 2 else channel_dropout)(
                rngs[2], up2, 0.2)
        up1 = UnetUp3CT(f[0], s2d=s >= 1, s2d_below=s >= 2,
                        dtype=dt)(conv1, up2, train=train)
        if train:
            up1 = (channel_dropout_s2d if s >= 1 else channel_dropout)(
                rngs[3], up1, 0.1)

        if s >= 2:
            up2_n = s2d_ops.depth_to_space3d(up2)
        else:
            up2_n = up2
        up1_n = s2d_ops.depth_to_space3d(up1) if s >= 1 else up1
        dsv4 = UnetDsv3(self.num_classes, 8)(up4)
        dsv3 = UnetDsv3(self.num_classes, 4)(up3)
        dsv2 = UnetDsv3(self.num_classes, 2)(up2_n)
        dsv1 = nn.Conv(self.num_classes, (1, 1, 1))(up1_n)
        return (dsv1.astype(jnp.float32), dsv2.astype(jnp.float32),
                dsv3.astype(jnp.float32), dsv4.astype(jnp.float32))
