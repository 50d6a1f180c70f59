"""Element dropout with 8-bit random draws.

``flax.linen.Dropout`` materializes a uint32 random word per element
(bernoulli via f32 uniform); at the 2D north-star config the encoder-level
mask alone is u32[24,129,129,64] = 102 MB of RNG output + an XLA layout
copy — ~1-1.5 ms of a 29 ms step (device trace, scripts/probe_grad_profile
store=1). One random BYTE per element carries the same mask at a quarter of
the traffic.

Semantics: keep probability is quantized to 1/256 — the effective drop rate
is round(p * 256) / 256 (e.g. 0.05 -> 0.0508, 0.5 -> 0.5 exact), and the
survivor scale uses the EFFECTIVE rate so E[output] == input exactly.
Documented deviation from the reference's torch ``nn.Dropout`` (whose own
mask comes from f32 draws); the reference's rates are training noise
hyperparameters, not loss math — parity tests run with dropout zeroed
either way (tests/test_grad_parity.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class BitsDropout(nn.Module):
    """Drop-in for ``nn.Dropout(rate, deterministic=...)`` (no params, same
    param tree, same ``dropout`` RNG collection)."""
    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        t = int(round(self.rate * 256.0))
        if t <= 0:
            return x
        if t >= 256:
            return jnp.zeros_like(x)
        rng = self.make_rng("dropout")
        draw = jax.random.bits(rng, x.shape, dtype=jnp.uint8)
        scale = jnp.asarray(256.0 / (256.0 - t), x.dtype)
        return jnp.where(draw >= t, x * scale, jnp.zeros((), x.dtype))
