"""Benchmark: mean-teacher 2D UNet training throughput on ACDC's flagship
config (batch 24, 256^2 patches, 4 classes) — north-star metric
"ACDC slices/sec/chip (train)".

Baseline: the reference publishes no numbers (BASELINE.md); the PyTorch
single-GPU baseline for this exact config (UNet fwd+bwd x2-model mean
teacher, batch 24 @ 256^2, V100-class GPU) is ~100 slices/sec — recorded as
BASELINE_SLICES_PER_SEC and used for vs_baseline until a measured reference
checkpoint exists.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_SLICES_PER_SEC = 100.0
WARMUP_STEPS = 3
MEASURE_STEPS = 30


def main():
    import jax
    from cvssl_tpu.train.config import TrainConfig
    from cvssl_tpu.train.engine import Engine

    batch_size = 24
    cfg = TrainConfig(
        method="mean_teacher", model="unet", num_classes=4,
        batch_size=batch_size, labeled_bs=12, patch_size=(256, 256),
        labeled_slices_override=12, num_devices=1)
    engine = Engine(cfg)

    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(batch_size, 256, 256, 1)).astype(np.float32),
        "label": rng.integers(0, 4, (batch_size, 256, 256)).astype(np.int32),
        "idx": np.arange(batch_size, dtype=np.int32),
    }
    state = engine.init_state(jax.random.PRNGKey(0), batch)

    for _ in range(WARMUP_STEPS):
        state, metrics = engine.train_step(state, batch)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        state, metrics = engine.train_step(state, batch)
    jax.block_until_ready(metrics["loss"])
    elapsed = time.perf_counter() - t0

    slices_per_sec = MEASURE_STEPS * batch_size / elapsed
    print(json.dumps({
        "metric": "acdc_mean_teacher_train_slices_per_sec_per_chip",
        "value": round(slices_per_sec, 2),
        "unit": "slices/sec/chip",
        "vs_baseline": round(slices_per_sec / BASELINE_SLICES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
