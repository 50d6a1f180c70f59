"""Model-FLOPs-utilization accounting from XLA's own cost model.

``jax.jit(f).lower(...).compile().cost_analysis()`` exposes the compiler's
HLO cost analysis for the exact executable we run — ``flops`` counts every
arithmetic op in the program (dots/convs as 2 * MACs), so
``flops / step_time / peak`` is the standard MFU definition applied to the
program we actually dispatch, not a hand-derived model estimate.

Peak numbers are per-chip dense bf16 MXU peaks from Google's published
specs. jnp.dot/conv at DEFAULT precision is a single bf16 MXU pass on v5e
even for f32 operands (ops/pallas_conv.py docstring has the measurement),
so the bf16 peak is the right denominator for every config in this repo.

Reference has no analog: the torch baseline publishes no FLOPs/MFU at all.
"""
from __future__ import annotations

from typing import Optional

# per-chip dense peak FLOP/s (bf16 in, f32 accumulate) — public spec sheets
PEAK_BF16_FLOPS = {
    "TPU v2": 46e12,
    "TPU v3": 123e12,
    "TPU v4": 275e12,
    "TPU v4 lite": 137e12,   # v4i
    "TPU v5": 459e12,        # v5p
    "TPU v5p": 459e12,
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
    "TPU v6e": 918e12,
    "TPU v7": 4614e12,       # Ironwood (fp8; bf16 ~2307e12) — placeholder
}


def peak_flops(device=None) -> Optional[float]:
    """Per-chip dense bf16 peak for ``device`` (default: jax.devices()[0]).
    Returns None off-TPU or for unknown kinds (callers then report flops
    without an MFU claim rather than inventing a denominator)."""
    import jax
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "") or ""
    if kind in PEAK_BF16_FLOPS:
        return PEAK_BF16_FLOPS[kind]
    # device_kind strings vary across runtime versions ("TPU v5 lite",
    # "TPU v5e", "tpu v5 litepod"...) — match on the version token
    low = kind.lower()
    for key, val in PEAK_BF16_FLOPS.items():
        k = key.lower()
        if k in low:
            return val
    return None


def compiled_flops(compiled) -> Optional[float]:
    """Total program FLOPs from an ``XlaExecutable.cost_analysis()``.
    Returns None when the backend exposes no cost model."""
    try:
        ca = compiled.cost_analysis()
    except Exception:
        return None
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else None
    if not ca:
        return None
    f = ca.get("flops")
    return float(f) if f is not None and f > 0 else None


def program_flops(jitted, *args, **kwargs) -> Optional[float]:
    """FLOPs of the executable ``jitted(*args, **kwargs)`` would run.
    Lowering + compiling hits the same persistent compile cache as the
    real call, so on a warmed process this is cheap."""
    try:
        return compiled_flops(jitted.lower(*args, **kwargs).compile())
    except Exception:
        return None


def per_step_flops(jitted, args_k, args_2k, k: int) -> Optional[float]:
    """Per-train-step FLOPs of a ``lax.scan``-over-steps program, from two
    lowerings at scan lengths k and 2k.

    XLA's HloCostAnalysis counts a while-loop body ONCE — trip counts are
    not modeled — so on current backends f(k) == f(2k) and that shared
    value IS the body (per-step) cost; if a backend ever models trip
    counts, the difference quotient recovers the per-step cost instead.
    Measured: the 32^2 mean-teacher step lowers to identical flops at
    scan lengths 2 and 4 (tests/test_mfu.py).
    """
    fk = program_flops(jitted, *args_k)
    f2k = program_flops(jitted, *args_2k)
    if fk is None or f2k is None:
        return None
    if f2k > fk * 1.05:  # trip counts modeled: isolate k more steps
        return (f2k - fk) / k
    return fk


def mfu(flops_per_step: Optional[float], step_time_s: float,
        device=None) -> Optional[float]:
    """Model FLOPs utilization in [0, 1]; None when either side is
    unmeasurable (no cost model / unknown chip)."""
    if not flops_per_step or step_time_s <= 0:
        return None
    peak = peak_flops(device)
    if not peak:
        return None
    return flops_per_step / step_time_s / peak
