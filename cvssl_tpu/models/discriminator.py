"""GAN discriminators for adversarial SSL (Flax, NHWC/NDHWC).

Parity with ``code/networks/discriminator.py``: a conv ladder over
(softmax map, image) pairs ending in a binary labeled/unlabeled logit.

The reference's 2D ``FCDiscriminator`` hard-codes ``Linear(ndf*32, 2)`` after
an ``AvgPool2d(7)``, which only type-checks for ~512px inputs (it crashes at
the 256/224px sizes its own trainers feed it — reference bug, SURVEY §8).
Here the final Dense infers its input width, so any input size works while
512px inputs reproduce the reference arithmetic exactly.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class FCDiscriminator(nn.Module):
    """2D discriminator (``discriminator.py:58-100``). Inputs NHWC."""
    num_classes: int
    ndf: int = 64
    drop: float = 0.5

    @nn.compact
    def __call__(self, seg_map, image, *, train: bool = False):
        x = nn.Conv(self.ndf, (4, 4), strides=2, padding=1)(seg_map) + \
            nn.Conv(self.ndf, (4, 4), strides=2, padding=1)(image)
        # Reference quirk kept: no activation between the add and conv2.
        x = nn.Conv(self.ndf * 2, (4, 4), strides=2, padding=1)(x)
        x = nn.leaky_relu(x, 0.2)
        # torch nn.Dropout2d semantics: one mask per (sample, channel),
        # broadcast over the spatial dims.
        x = nn.Dropout(self.drop, broadcast_dims=(1, 2),
                       deterministic=not train)(x)
        x = nn.Conv(self.ndf * 4, (4, 4), strides=2, padding=1)(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Dropout(self.drop, broadcast_dims=(1, 2),
                       deterministic=not train)(x)
        x = nn.Conv(self.ndf * 8, (4, 4), strides=2, padding=1)(x)
        x = nn.leaky_relu(x, 0.2)
        k = (min(7, x.shape[1]), min(7, x.shape[2]))  # floor-mode window,
        x = nn.avg_pool(x, k, strides=k)              # clamped for small inputs
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(2)(x)


class FC3DDiscriminator(nn.Module):
    """3D discriminator (``discriminator.py:6-55``). Inputs NDHWC;
    96^3 inputs -> 6^3 after 4 stride-2 convs -> global avg pool 6^3."""
    num_classes: int
    ndf: int = 64
    drop: float = 0.5

    @nn.compact
    def __call__(self, seg_map, image, *, train: bool = False):
        x = nn.Conv(self.ndf, (4, 4, 4), strides=2, padding=1)(seg_map) + \
            nn.Conv(self.ndf, (4, 4, 4), strides=2, padding=1)(image)
        x = nn.leaky_relu(x, 0.2)
        # torch nn.Dropout3d semantics: per-(sample, channel) masks.
        x = nn.Dropout(self.drop, broadcast_dims=(1, 2, 3),
                       deterministic=not train)(x)
        x = nn.Conv(self.ndf * 2, (4, 4, 4), strides=2, padding=1)(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Dropout(self.drop, broadcast_dims=(1, 2, 3),
                       deterministic=not train)(x)
        x = nn.Conv(self.ndf * 4, (4, 4, 4), strides=2, padding=1)(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Dropout(self.drop, broadcast_dims=(1, 2, 3),
                       deterministic=not train)(x)
        x = nn.Conv(self.ndf * 8, (4, 4, 4), strides=2, padding=1)(x)
        x = nn.leaky_relu(x, 0.2)
        x = jnp.mean(x, axis=(1, 2, 3))  # AvgPool3d(6) == global mean at 6^3
        return nn.Dense(2)(x)
