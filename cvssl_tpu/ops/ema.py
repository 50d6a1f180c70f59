"""EMA (mean-teacher) parameter updates as tree-mapped lerps.

Replaces the reference's per-parameter in-place loop
(``train_mean_teacher_2D.py:124-128``):

    alpha = min(1 - 1/(global_step + 1), alpha)
    ema_param = alpha * ema_param + (1 - alpha) * param

Runs inside the jitted train step — one fused elementwise pass over the
parameter pytree, no host round-trips.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_decay_schedule(step, alpha: float = 0.99):
    """Warm-up decay min(1 - 1/(t+1), alpha). ``step`` is the global iteration
    (0-based, as in the reference where update runs after optimizer.step)."""
    step = jnp.asarray(step, jnp.float32)
    return jnp.minimum(1.0 - 1.0 / (step + 1.0), alpha)


def ema_update(ema_tree, new_tree, decay):
    """ema <- decay * ema + (1 - decay) * new, over an arbitrary pytree."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_tree, new_tree)


def mean_teacher_update(ema_tree, new_tree, step, alpha: float = 0.99):
    """The full reference semantics in one call."""
    return ema_update(ema_tree, new_tree, ema_decay_schedule(step, alpha))
