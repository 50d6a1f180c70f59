"""Profiling + micro-benchmark helpers.

The reference ships dormant CUDA timing helpers
(``networks_other.py:203-259`` measure_fp_bp_time) and an unused
``--throughput`` flag; here profiling is wired in: ``trace`` captures a
TensorBoard-viewable XLA profile, ``measure_fp_bp_time`` times jitted
forward/backward passes.
"""
from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure_fp_bp_time(model, variables, x, steps: int = 20,
                       warmup: int = 3):
    """Return (forward_seconds, forward_backward_seconds) per call —
    the reference's measure_fp_bp_time with device-sync timing."""
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))

    def loss(params, x):
        out = model.apply({**variables, "params": params}, x, train=False)
        logits = out[0] if isinstance(out, (tuple, list)) else out
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    bwd = jax.jit(jax.grad(loss))

    for _ in range(warmup):
        y = fwd(variables, x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(steps):
        y = fwd(variables, x)
    jax.block_until_ready(y)
    fp = (time.perf_counter() - t0) / steps

    for _ in range(warmup):
        g = bwd(variables["params"], x)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(steps):
        g = bwd(variables["params"], x)
    jax.block_until_ready(g)
    bp = (time.perf_counter() - t0) / steps
    return fp, bp
