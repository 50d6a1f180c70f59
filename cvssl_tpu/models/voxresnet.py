"""VoxResNet with SE blocks (Flax, NDHWC) — parity with
``code/networks/VoxResNet.py``: pre-activation residual blocks at constant
width, 3 pooling levels, trilinear(align_corners) up with skip concat.
(The reference defines ``SEBlock`` but never wires it into the network —
kept here as an exported module for parity.)
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from cvssl_tpu.models.unet import bilinear_resize
from cvssl_tpu.models.unet3d import instance_norm


def trilinear_align_x2(x: jnp.ndarray) -> jnp.ndarray:
    """Trilinear x2 with align_corners=True — composed from the 2D
    align-corners resize applied depth-then-plane (separable)."""
    b, d, h, w, c = x.shape
    # plane (h, w) first: treat (b*d) as batch
    y = bilinear_resize(x.reshape(b * d, h, w, c), (2 * h, 2 * w))
    y = y.reshape(b, d, 2 * h, 2 * w, c)
    # depth axis: align-corners linear along d, vectorized via the same
    # helper on a (b, d, 2h*2w, c) view
    y = bilinear_resize(y.reshape(b, d, 4 * h * w, c), (2 * d, 4 * h * w))
    return y.reshape(b, 2 * d, 2 * h, 2 * w, c)


class SEBlock(nn.Module):
    """Squeeze-excite (``VoxResNet.py:9-23``; defined-but-unused upstream)."""
    reduction: int = 6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        f = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)), keepdims=True)
        f = nn.relu(nn.Conv(int(c / self.reduction), (1, 1, 1))(f))
        f = nn.relu(nn.Conv(c, (1, 1, 1))(f))
        return f * x + x


class VoxRex(nn.Module):
    """Pre-activation residual block (``VoxResNet.py:26-41``)."""
    channels: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(instance_norm(x))
        h = nn.Conv(self.channels, (3, 3, 3), padding=1, use_bias=False)(h)
        h = nn.relu(instance_norm(h))
        h = nn.Conv(self.channels, (3, 3, 3), padding=1, use_bias=False)(h)
        return h + x


class _PreActConvBlock(nn.Module):
    """IN-relu-conv x2 (``VoxResNet.py:44-61``)."""
    out_channels: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(instance_norm(x))
        h = nn.Conv(self.out_channels, (3, 3, 3), padding=1, use_bias=False)(h)
        h = nn.relu(instance_norm(h))
        return nn.Conv(self.out_channels, (3, 3, 3), padding=1,
                       use_bias=False)(h)


class _UpBlock(nn.Module):
    """align-corners trilinear x2 + concat + pre-act conv block
    (``VoxResNet.py:64-77``)."""
    out_channels: int

    @nn.compact
    def __call__(self, x1, x2):
        x1 = trilinear_align_x2(x1)
        return _PreActConvBlock(self.out_channels)(
            jnp.concatenate([x2, x1], axis=-1))


class VoxResNet(nn.Module):
    """(``VoxResNet.py:79-116``)"""
    in_chns: int = 1
    num_classes: int = 2
    feature_chns: int = 64

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        f = self.feature_chns
        x = nn.max_pool(nn.Conv(f, (3, 3, 3), padding=1)(x),
                        (2, 2, 2), (2, 2, 2))
        x1 = VoxRex(f)(x)
        x2 = VoxRex(f)(x1)
        x2_pool = nn.max_pool(x2, (2, 2, 2), (2, 2, 2))
        x3 = VoxRex(f)(x2_pool)
        x4 = nn.max_pool(VoxRex(f)(x3), (2, 2, 2), (2, 2, 2))
        x5 = VoxRex(f)(x4)
        x6 = VoxRex(f)(x5)
        up1 = _UpBlock(f)(x6, x2_pool)
        up2 = _UpBlock(f)(up1, x)
        up = trilinear_align_x2(up2)
        return nn.Conv(self.num_classes, (1, 1, 1))(up)
