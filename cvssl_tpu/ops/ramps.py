"""Hyperparameter ramp schedules (jittable).

Mirrors the reference ``code/utils/ramps.py`` exactly, but every function
accepts either Python numbers or traced jnp scalars so schedules can live
inside a jitted train step (the reference computes them in Python per
iteration).
"""
from __future__ import annotations

import jax.numpy as jnp


def sigmoid_rampup(current, rampup_length):
    """exp(-5 * (1 - t)^2) ramp. Mirrors ``ramps.py:20-27``."""
    if isinstance(rampup_length, (int, float)) and rampup_length == 0:
        return jnp.float32(1.0)
    current = jnp.clip(jnp.float32(current), 0.0, rampup_length)
    phase = 1.0 - current / rampup_length
    return jnp.exp(-5.0 * phase * phase)


def ramp_up_function(epoch, epoch_with_max_rampup: int = 80):
    """Temporal-ensembling ramp. Mirrors ``ramps.py:30-46`` (equal to
    sigmoid_rampup but switches exactly at the max epoch)."""
    epoch = jnp.float32(epoch)
    p = 1.0 - jnp.maximum(0.0, epoch) / epoch_with_max_rampup
    return jnp.where(epoch < epoch_with_max_rampup,
                     jnp.exp(-5.0 * p * p), jnp.float32(1.0))


def linear_rampup(current, rampup_length):
    """Linear 0->1 ramp. Mirrors ``ramps.py:49-55``."""
    if isinstance(rampup_length, (int, float)) and rampup_length == 0:
        return jnp.float32(1.0)
    return jnp.clip(jnp.float32(current) / rampup_length, 0.0, 1.0)


def cosine_rampdown(current, rampdown_length):
    """Cosine 1->0 rampdown. Mirrors ``ramps.py:58-61``."""
    return 0.5 * (jnp.cos(jnp.pi * jnp.float32(current) / rampdown_length) + 1.0)


def consistency_weight(step, consistency: float = 0.1,
                       consistency_rampup: float = 200.0,
                       ramp: str = "sigmoid"):
    """The reference's per-iteration consistency weight
    ``consistency * rampup(iter // 150, rampup)`` — note the integer-divide
    staircase (``train_mean_teacher_2D.py:119-121``)."""
    t = jnp.floor_divide(jnp.asarray(step, jnp.int32), 150)
    if ramp == "sigmoid":
        r = sigmoid_rampup(t, consistency_rampup)
    elif ramp == "linear":
        r = linear_rampup(t, consistency_rampup)
    elif ramp == "temporal":
        r = ramp_up_function(t, int(consistency_rampup))
    else:
        raise ValueError(f"unknown ramp {ramp!r}")
    return consistency * r
