"""Dump the optimized HLO of the mean-teacher scanned train step and report
the shapes/operands of the largest copy instructions (named by the device
trace, scripts/probe_grad_profile.py)."""
import re
import sys

import jax
import numpy as np


def main():
    from cvssl_tpu.train.config import TrainConfig
    from cvssl_tpu.train.engine import Engine

    batch = 24
    cfg = TrainConfig(method="mean_teacher", model="unet", num_classes=4,
                      batch_size=batch, labeled_bs=12,
                      patch_size=(256, 256), num_devices=None,
                      labeled_slices_override=12)
    engine = Engine(cfg)
    rng = np.random.default_rng(0)
    b = {"image": rng.normal(size=(batch, 256, 256, 1)).astype(np.float32),
         "label": rng.integers(0, 4, (batch, 256, 256)).astype(np.int32),
         "idx": np.arange(batch, dtype=np.int32)}
    state = engine.init_state(jax.random.PRNGKey(0), b)

    if engine._train_step_fixed is None:
        engine.train_steps_fixed(state, b, 10)  # build + compile
    import functools
    # engine caches the jitted fn; recompile via lower to get HLO text
    body = engine._train_step_fixed
    lowered = body.lower(state, jax.device_put(b), 10)
    txt = lowered.compile().as_text()
    with open("/tmp/step_hlo.txt", "w") as f:
        f.write(txt)
    print("HLO chars:", len(txt))
    names = sys.argv[1:] or ["copy.1627", "copy.1628", "copy.1606",
                             "copy.1691", "copy.1623", "slice.591"]
    for name in names:
        for line in txt.splitlines():
            if f"%{name} " in line or f"{name} = " in line:
                print("----", name)
                print(line.strip()[:400])
                break


if __name__ == "__main__":
    main()
