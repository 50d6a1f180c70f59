"""Numerical core: losses, ramps, EMA, schedules, metrics, SDF, kernels."""

from cvssl_tpu.ops import losses, ramps, ema, schedules, metrics, sdf  # noqa: F401
# pallas_kernels imported lazily by users (pulls in pallas/mosaic)
