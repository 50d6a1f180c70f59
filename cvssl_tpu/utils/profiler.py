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


class StepWindowProfiler:
    """Trace a window of training steps (after compile warm-up) into a
    TensorBoard-profile directory. Driven by the engine loop:
    ``tick(it, metrics)`` starts the trace at ``start`` and stops it —
    with a metrics fetch so in-flight device work lands in the trace —
    once ``stop`` is reached. Wired to ``cfg.profile_dir``."""

    def __init__(self, log_dir: str, start: int = 10, stop: int = 20):
        self.log_dir = log_dir
        self.start = start
        self.stop = stop
        self._active = False
        self._done = False

    def tick(self, it: int, metrics=None):
        if self._done or not self.log_dir:
            return
        if not self._active and it >= self.start:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif self._active and it >= self.stop:
            if metrics is not None:
                jax.device_get(metrics)
            jax.profiler.stop_trace()
            self._active = False
            self._done = True

    def close(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True


def _fetch_sync(tree):
    """Force completion by FETCHING a value. ``jax.block_until_ready`` is a
    dispatch-only sync through the axon TPU relay (CLAUDE.md measurement
    lesson) — the only honest barrier is a device->host value read."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:1]))


def measure_fp_bp_time(model, variables, x, steps: int = 20,
                       warmup: int = 3):
    """Return (forward_seconds, forward_backward_seconds) per call —
    the reference's measure_fp_bp_time (networks_other.py:203-259) with
    fetch-forced device sync (see ``_fetch_sync``)."""
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))

    def loss(params, x):
        out = model.apply({**variables, "params": params}, x, train=False)
        logits = out[0] if isinstance(out, (tuple, list)) else out
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    bwd = jax.jit(jax.grad(loss))

    for _ in range(warmup):
        y = fwd(variables, x)
    _fetch_sync(y)
    t0 = time.perf_counter()
    for _ in range(steps):
        y = fwd(variables, x)
    _fetch_sync(y)
    fp = (time.perf_counter() - t0) / steps

    for _ in range(warmup):
        g = bwd(variables["params"], x)
    _fetch_sync(g)
    t0 = time.perf_counter()
    for _ in range(steps):
        g = bwd(variables["params"], x)
    _fetch_sync(g)
    bp = (time.perf_counter() - t0) / steps
    return fp, bp
