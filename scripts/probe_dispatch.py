"""Probe: how much of the bench wall-clock is per-dispatch tunnel overhead?

Times the production scan path at several window sizes K with the SAME
total step count, fetch-forced (CLAUDE.md: block_until_ready lies through
the relay). Also times the dispatch call itself (no fetch) to show whether
the host blocks inside `train_steps_scan`.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    import bench
    from cvssl_tpu.data.device_store import DeviceSliceStore
    from cvssl_tpu.data.sampler import TwoStreamBatchSampler
    from cvssl_tpu.train.config import TrainConfig
    from cvssl_tpu.train.engine import Engine

    batch_size = 24
    cfg = TrainConfig(
        method="mean_teacher", model="unet", num_classes=4,
        batch_size=batch_size, labeled_bs=12, patch_size=(256, 256),
        labeled_slices_override=bench.ACDC_LABELED_SLICES, num_devices=None)
    engine = Engine(cfg)
    store = DeviceSliceStore(bench._SyntheticACDC(), cfg.patch_size)
    engine.attach_store(store)
    sampler = TwoStreamBatchSampler(
        list(range(bench.ACDC_LABELED_SLICES)),
        list(range(bench.ACDC_LABELED_SLICES, bench.ACDC_TRAIN_SLICES)),
        batch_size, batch_size - cfg.labeled_bs,
        rng=np.random.default_rng(0))
    stream = sampler.epochs()

    init_batch = {
        "image": np.zeros((batch_size, 256, 256, 1), np.float32),
        "label": np.zeros((batch_size, 256, 256), np.int32),
        "idx": np.arange(batch_size, dtype=np.int32)}
    state = engine.init_state(jax.random.PRNGKey(cfg.seed), init_batch)

    TOTAL = 120
    for K in (10, 30, 60, 120):
        # warm (compile this K)
        state, metrics = engine.train_steps_scan(
            state, [next(stream) for _ in range(K)])
        float(metrics["loss"])
        best = float("inf")
        disp_times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(TOTAL // K):
                td = time.perf_counter()
                state, metrics = engine.train_steps_scan(
                    state, [next(stream) for _ in range(K)])
                disp_times.append(time.perf_counter() - td)
            float(metrics["loss"])
            best = min(best, time.perf_counter() - t0)
        sps = TOTAL * batch_size / best
        print(f"K={K:4d}: {sps:7.1f} slices/s  best={best:.3f}s "
              f"dispatch-only per call: min={min(disp_times)*1e3:.1f}ms "
              f"med={sorted(disp_times)[len(disp_times)//2]*1e3:.1f}ms",
              flush=True)


if __name__ == "__main__":
    main()
