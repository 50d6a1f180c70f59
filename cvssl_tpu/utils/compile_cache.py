"""Persistent XLA compilation cache setup.

Through the axon relay a cold remote compile of the full jitted train
step costs ~650 s (measured, round 4); the serialized executable replays
from the on-disk cache in under a second — across processes. Enabling
this by default is what makes the reference's kill/resume workflow
(``train_mean_teacher_2D.py`` resume contract) production-viable here,
and makes repeat CLI invocations start ~instantly.
"""
from __future__ import annotations

import os
from typing import Optional

DEFAULT_DIR = "~/.cache/cvssl_tpu/jax"


def enable_compilation_cache(path: Optional[str] = "auto") -> Optional[str]:
    """Point JAX's persistent compilation cache at ``path`` (``"auto"`` =
    ``~/.cache/cvssl_tpu/jax``). Respects an already-configured dir (the
    test conftest sets its own) and returns the active dir, or None when
    disabled (``path`` in (None, "off"))."""
    if path in (None, "off"):
        return None
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    resolved = os.path.expanduser(DEFAULT_DIR if path == "auto" else path)
    os.makedirs(resolved, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", resolved)
    # the default 1 MB / 1 s thresholds skip small-but-slow-over-the-relay
    # programs (e.g. the jitted model init); cache everything non-trivial
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return resolved
