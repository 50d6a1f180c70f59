"""TPU A/B: cfg.fused_loss (Pallas single-sweep ce+dice) vs unfused XLA
ce+dice under the s2d_loss grouped-logits layout. The device trace shows
the Pallas path paying ~2.5 ms/step of layout copies + reshapes at its
(N, 4) boundary (probe_hlo_copies.py: reshape.3196/3197, copy.1889/90/91);
this measures whether the fusion still nets out ahead. Scan-amortized,
fetch-forced, interleaved reps."""
import time

import jax
import numpy as np


def build(fused):
    from cvssl_tpu.train.config import TrainConfig
    from cvssl_tpu.train.engine import Engine

    batch = 24
    cfg = TrainConfig(method="mean_teacher", model="unet", num_classes=4,
                      batch_size=batch, labeled_bs=12,
                      patch_size=(256, 256), num_devices=None,
                      labeled_slices_override=12, fused_loss=fused)
    engine = Engine(cfg)
    rng = np.random.default_rng(0)
    b = {"image": rng.normal(size=(batch, 256, 256, 1)).astype(np.float32),
         "label": rng.integers(0, 4, (batch, 256, 256)).astype(np.int32),
         "idx": np.arange(batch, dtype=np.int32)}
    state = engine.init_state(jax.random.PRNGKey(0), b)
    state, m = engine.train_steps_fixed(state, b, 10)
    print(f"fused={fused} loss after 10 warm steps:", float(m["loss"]))
    return engine, state, b


def timeit(engine, state, b, reps=3, k=10, iters=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = engine.train_steps_fixed(state, b, k)
        float(m["loss"])
        best = min(best, time.perf_counter() - t0)
    return best / (k * iters), state


def main():
    on = build(True)
    off = build(False)
    for rep in range(3):
        t_on, s_on = timeit(*on)
        t_off, s_off = timeit(*off)
        on = (on[0], s_on, on[2])
        off = (off[0], s_off, off[2])
        print(f"rep {rep}: fused {t_on*1e3:.2f} ms/step "
              f"({24/t_on:.1f} sl/s) | unfused {t_off*1e3:.2f} ms/step "
              f"({24/t_off:.1f} sl/s)")


if __name__ == "__main__":
    main()
