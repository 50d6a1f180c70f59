"""Attention modules — parity with ``code/networks/attention.py``
(``SCSEModule`` :51, used by the smp-style decoder's attention option)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class SCSEModule(nn.Module):
    """Concurrent spatial + channel squeeze-excite: cSE (global-pool ->
    bottleneck MLP -> sigmoid channel gate) + sSE (1x1 conv -> sigmoid
    spatial gate), summed."""
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        # channel SE
        s = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)), keepdims=True)
        s = nn.relu(nn.Conv(max(c // self.reduction, 1), (1, 1))(s))
        s = jax.nn.sigmoid(nn.Conv(c, (1, 1))(s))
        cse = x * s
        # spatial SE
        q = jax.nn.sigmoid(nn.Conv(1, (1, 1))(x))
        return cse + x * q
