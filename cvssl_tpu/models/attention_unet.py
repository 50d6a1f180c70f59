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


class GridAttentionBlock3D(nn.Module):
    """'concatenation' grid attention (``grid_attention_layer.py:84-107``):
    theta(x) strided + phi(g) upsampled -> relu -> psi -> sigmoid -> upsample
    -> gate x; output transform W = conv1 + BatchNorm."""
    in_channels: int
    inter_channels: int
    sub_sample: int = 2

    @nn.compact
    def __call__(self, x, g, *, train: bool = False):
        s = self.sub_sample
        theta_x = nn.Conv(self.inter_channels, (s, s, s), strides=s,
                          padding=0, use_bias=False)(x)
        phi_g = nn.Conv(self.inter_channels, (1, 1, 1))(g)
        phi_g = _resize_trilinear(phi_g, theta_x.shape[1:4])
        f = nn.relu(theta_x + phi_g)
        att = jax.nn.sigmoid(nn.Conv(1, (1, 1, 1))(f))
        att = _resize_trilinear(att, x.shape[1:4])
        y = att * x
        w = nn.Conv(self.in_channels, (1, 1, 1))(y)
        w = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(w)
        return w, att


class GridAttentionBlock2D(nn.Module):
    """2D 'concatenation' grid attention (``grid_attention_layer.py:
    162-171`` — the dimension=2 instantiation of ``_GridAttentionBlockND``;
    unused by any reference trainer but part of the public surface).
    x (B, H, W, C); g (B, Hg, Wg, Cg)."""
    in_channels: int
    inter_channels: int
    sub_sample: int = 2

    @nn.compact
    def __call__(self, x, g, *, train: bool = False):
        s = self.sub_sample
        theta_x = nn.Conv(self.inter_channels, (s, s), strides=s,
                          padding=0, use_bias=False)(x)
        phi_g = nn.Conv(self.inter_channels, (1, 1))(g)
        b, h, w, c = theta_x.shape
        phi_g = jax.image.resize(phi_g, (b, h, w, c), "bilinear")
        f = nn.relu(theta_x + phi_g)
        att = jax.nn.sigmoid(nn.Conv(1, (1, 1))(f))
        att = jax.image.resize(att, (x.shape[0], x.shape[1], x.shape[2], 1),
                               "bilinear")
        y = att * x
        out = nn.Conv(self.in_channels, (1, 1))(y)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5)(out)
        return out, att


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
