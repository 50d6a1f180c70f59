"""Attention-gated 3D UNet (Flax, NDHWC) — parity with
``code/networks/attention_unet.py`` + ``grid_attention_layer.py``
('concatenation' mode): grid attention gates on skips 2-4, gating signal from
the bottleneck, DSV heads concatenated into the final 1x1x1 conv.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from cvssl_tpu.models.unet3d import (UnetConv3, UnetDsv3, UnetUp3CT,
                                     instance_norm)


def _resize_trilinear(x, dhw):
    b, _, _, _, c = x.shape
    return jax.image.resize(x, (b, *dhw, c), "trilinear")


def _resize_nd(x, spatial):
    """bilinear (2D) / trilinear (3D) resize of an N{2,3}C tensor."""
    b, c = x.shape[0], x.shape[-1]
    method = "trilinear" if len(spatial) == 3 else "bilinear"
    return jax.image.resize(x, (b, *spatial, c), method)


_MODES = ("concatenation", "concatenation_debug", "concatenation_residual")


class _GridAttentionND(nn.Module):
    """``_GridAttentionBlockND`` (``grid_attention_layer.py:7-159``), 2D/3D
    by input rank. Modes: 'concatenation' (relu -> psi -> sigmoid),
    'concatenation_debug' (softplus instead of relu, :111-133), and
    'concatenation_residual' (softmax over space instead of sigmoid,
    :136-159)."""
    in_channels: int
    inter_channels: int
    sub_sample: int = 2
    mode: str = "concatenation"

    @nn.compact
    def __call__(self, x, g, *, train: bool = False):
        assert self.mode in _MODES, self.mode
        nd = x.ndim - 2
        s = (self.sub_sample,) * nd
        ones = (1,) * nd
        theta_x = nn.Conv(self.inter_channels, s, strides=s,
                          padding=0, use_bias=False, name="theta")(x)
        phi_g = nn.Conv(self.inter_channels, ones, name="phi")(g)
        phi_g = _resize_nd(phi_g, theta_x.shape[1:-1])
        add = theta_x + phi_g
        f = jax.nn.softplus(add) if self.mode == "concatenation_debug" \
            else nn.relu(add)
        psi_f = nn.Conv(1, ones, name="psi")(f)
        if self.mode == "concatenation_residual":
            b = psi_f.shape[0]
            att = jax.nn.softmax(
                psi_f.reshape(b, -1), axis=-1).reshape(psi_f.shape)
        else:
            att = jax.nn.sigmoid(psi_f)
        att = _resize_nd(att, x.shape[1:-1])
        y = att * x
        w = nn.Conv(self.in_channels, ones, name="W")(y)
        w = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="W_bn")(w)
        return w, att


class GridAttentionBlock3D(_GridAttentionND):
    """3D instantiation (``grid_attention_layer.py:173-183``)."""


class GridAttentionBlock2D(_GridAttentionND):
    """2D instantiation (``grid_attention_layer.py:162-171`` — unused by any
    reference trainer but part of the public surface). x (B, H, W, C)."""


_TORR_MODES = ("concatenation", "concatenation_softmax",
               "concatenation_sigmoid", "concatenation_mean",
               "concatenation_range_normalise", "concatenation_mean_flow")


class _GridAttentionNDTORR(nn.Module):
    """``_GridAttentionBlockND_TORR`` (``grid_attention_layer.py:176-390``):
    the ablation-friendly gate — theta/phi/psi/W individually toggleable
    (identity when off), six score-normalisation modes, psi-bias warm starts
    (3.0 sigmoid / 10.0 softmax, :265-270), default sub_sample 1.

    Documented fix: upstream accepts mode='concatenation' in __init__ but
    its normalisation chain raises NotImplementedError at forward (:355);
    here it behaves as 'concatenation_sigmoid' (the base variant's
    normalisation) instead of crashing."""
    in_channels: int
    inter_channels: int
    sub_sample: int = 1
    mode: str = "concatenation_sigmoid"
    bn_layer: bool = True
    use_w: bool = True
    use_phi: bool = True
    use_theta: bool = True
    use_psi: bool = True
    nonlinearity1: str = "relu"

    @nn.compact
    def __call__(self, x, g, *, train: bool = False):
        assert self.mode in _TORR_MODES, self.mode
        nd = x.ndim - 2
        s = (self.sub_sample,) * nd
        ones = (1,) * nd

        theta_x = nn.Conv(self.inter_channels, s, strides=s, padding=0,
                          use_bias=False, name="theta")(x) \
            if self.use_theta else x
        phi_g = nn.Conv(self.inter_channels, s, strides=s, padding=0,
                        use_bias=False, name="phi")(g) if self.use_phi else g
        phi_g = _resize_nd(phi_g, theta_x.shape[1:-1])

        f = theta_x + phi_g
        if self.nonlinearity1 == "relu":
            f = nn.relu(f)

        if self.use_psi:
            bias_init = {"concatenation_sigmoid": 3.0,
                         "concatenation_softmax": 10.0}.get(self.mode, 0.0)
            psi_f = nn.Conv(
                1, ones, name="psi",
                bias_init=nn.initializers.constant(bias_init))(f)
        else:
            psi_f = f

        b = psi_f.shape[0]
        flat = psi_f.reshape(b, -1)
        if self.mode == "concatenation_softmax":
            att = jax.nn.softmax(flat, axis=-1)
        elif self.mode == "concatenation_mean":
            att = flat / jnp.sum(flat, axis=-1, keepdims=True)
        elif self.mode == "concatenation_mean_flow":
            shifted = flat - jnp.min(flat, axis=-1, keepdims=True)
            att = shifted / jnp.sum(shifted, axis=-1, keepdims=True)
        elif self.mode == "concatenation_range_normalise":
            lo = jnp.min(flat, axis=-1, keepdims=True)
            hi = jnp.max(flat, axis=-1, keepdims=True)
            att = (flat - lo) / (hi - lo)
        else:  # 'concatenation' / 'concatenation_sigmoid' -> sigmoid
            att = jax.nn.sigmoid(flat)
        att = att.reshape(psi_f.shape)

        att = _resize_nd(att, x.shape[1:-1])
        y = att * x
        if self.use_w:
            w = nn.Conv(self.in_channels, ones, name="W")(y)
            if self.bn_layer:
                w = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name="W_bn")(w)
        else:
            w = y
        return w, att


class GridAttentionBlock2DTORR(_GridAttentionNDTORR):
    """(``grid_attention_layer.py:362-378``)"""


class GridAttentionBlock3DTORR(_GridAttentionNDTORR):
    """(``grid_attention_layer.py:381-390``)"""


class MultiAttentionBlock(nn.Module):
    """Two parallel gates combined by conv+BN+ReLU
    (``attention_unet.py:113-135``)."""
    in_channels: int
    inter_channels: int

    @nn.compact
    def __call__(self, x, g, *, train: bool = False):
        g1, a1 = GridAttentionBlock3D(self.in_channels,
                                      self.inter_channels)(x, g, train=train)
        g2, a2 = GridAttentionBlock3D(self.in_channels,
                                      self.inter_channels)(x, g, train=train)
        h = nn.Conv(self.in_channels, (1, 1, 1))(
            jnp.concatenate([g1, g2], axis=-1))
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(h)
        return nn.relu(h), jnp.concatenate([a1, a2], axis=-1)


class AttentionUNet3D(nn.Module):
    """(``attention_unet.py:9-111``)"""
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
        # gating signal: 1x1x1 conv + IN + relu (utils.py:192-204)
        gating = nn.relu(instance_norm(nn.Conv(f[4], (1, 1, 1),
                                               padding=0)(center)))

        g4, _ = MultiAttentionBlock(f[3], f[3])(conv4, gating, train=train)
        up4 = UnetUp3CT(f[3])(g4, center, train=train)
        g3, _ = MultiAttentionBlock(f[2], f[2])(conv3, up4, train=train)
        up3 = UnetUp3CT(f[2])(g3, up4, train=train)
        g2, _ = MultiAttentionBlock(f[1], f[1])(conv2, up3, train=train)
        up2 = UnetUp3CT(f[1])(g2, up3, train=train)
        up1 = UnetUp3CT(f[0])(conv1, up2, train=train)

        dsv4 = UnetDsv3(self.num_classes, 8)(up4)
        dsv3 = UnetDsv3(self.num_classes, 4)(up3)
        dsv2 = UnetDsv3(self.num_classes, 2)(up2)
        dsv1 = nn.Conv(self.num_classes, (1, 1, 1))(up1)
        return nn.Conv(self.num_classes, (1, 1, 1))(
            jnp.concatenate([dsv1, dsv2, dsv3, dsv4], axis=-1))
