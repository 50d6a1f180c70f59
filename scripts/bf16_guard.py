"""bf16+s2d trajectory guard (round-4, VERDICT r3 weak 6).

s2d equivalence is proven exactly at f32 (tests/test_s2d.py); the shipped
TPU default is bf16+s2d, which cannot be bitwise-checked. This guard runs
the SAME init + SAME data through N production steps twice on the real
chip — (a) dtype=float32, s2d off, (b) dtype=auto (bf16+s2d+s2d_loss) —
and compares the loss trajectories. A bf16-sensitive regression (bad cast,
overflowing stat, broken grouped-logits loss) shows up as a diverging
curve long before it costs val dice.

Usage: python scripts/bf16_guard.py [steps=100] — prints one JSON line;
apply the band: |mean(last half) delta| <= 0.05 and both finite.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def run(dtype, steps, s2d_levels=None):
    import jax

    from cvssl_tpu.train.config import TrainConfig
    from cvssl_tpu.train.engine import Engine

    kw = dict(method="mean_teacher", model="unet", num_classes=4,
              batch_size=24, labeled_bs=12, patch_size=(256, 256),
              labeled_slices_override=120, num_devices=None, dtype=dtype)
    if s2d_levels is not None:
        kw["s2d_levels"] = s2d_levels
    cfg = TrainConfig(**kw)
    engine = Engine(cfg)
    rng = np.random.RandomState(0)
    batch = {"image": rng.rand(24, 256, 256, 1).astype(np.float32),
             "label": rng.randint(0, 4, (24, 256, 256)).astype(np.int32),
             "idx": np.arange(24, dtype=np.int32)}
    state = engine.init_state(jax.random.PRNGKey(0), batch)
    losses = []
    for i in range(steps):
        state, m = engine.train_step(state, batch)
        losses.append(float(m["loss"]))
    return losses


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    t0 = time.time()
    f32 = run("float32", steps, s2d_levels=0)
    auto = run("auto", steps)
    h = steps // 2
    d_late = abs(np.mean(f32[h:]) - np.mean(auto[h:]))
    out = {
        "metric": "bf16_s2d_loss_trajectory_delta",
        "steps": steps,
        "f32_late_mean": round(float(np.mean(f32[h:])), 5),
        "auto_late_mean": round(float(np.mean(auto[h:])), 5),
        "late_delta": round(float(d_late), 5),
        "f32_final": round(f32[-1], 5),
        "auto_final": round(auto[-1], 5),
        "finite": bool(np.isfinite(f32 + auto).all()),
        "pass": bool(d_late <= 0.05 and np.isfinite(f32 + auto).all()),
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
