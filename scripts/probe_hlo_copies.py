"""Dump the optimized HLO of a train step and report the shapes/operands
of named instructions (named by the device trace,
scripts/probe_grad_profile.py / probe_3d_profile.py).

Usage: probe_hlo_copies.py [key=value config overrides...] [op names...]
  e.g. probe_hlo_copies.py method=uamt model=unet_3D dim=3 batch_size=4 \
       labeled_bs=2 num_classes=2 patch=96 copy.3476 copy.3449
"""
import sys

import jax
import numpy as np


def main():
    from cvssl_tpu.train.config import TrainConfig
    from cvssl_tpu.train.engine import Engine

    over, names = {}, []
    for a in sys.argv[1:]:
        if "=" in a:
            k, _, v = a.partition("=")
            over[k] = int(v) if v.lstrip("-").isdigit() else v
        else:
            names.append(a)
    patch = over.pop("patch", 256)
    steps = over.pop("steps", 10)
    base = dict(method="mean_teacher", model="unet", num_classes=4,
                batch_size=24, labeled_bs=12, num_devices=None)
    base.update(over)
    batch = base["batch_size"]
    base.setdefault("labeled_slices_override", base["labeled_bs"])
    dim = base.get("dim", 2)
    shape = (patch,) * dim
    cfg = TrainConfig(patch_size=shape, **base)
    engine = Engine(cfg)
    rng = np.random.default_rng(0)
    b = {"image": rng.normal(
             size=(batch, *shape, 1)).astype(np.float32),
         "label": rng.integers(
             0, cfg.num_classes, (batch, *shape)).astype(np.int32),
         "idx": np.arange(batch, dtype=np.int32)}
    state = engine.init_state(jax.random.PRNGKey(0), b)

    if engine._train_step_fixed is None:
        engine.train_steps_fixed(state, b, steps)  # build + compile
    # engine caches the jitted fn; recompile via lower to get HLO text
    body = engine._train_step_fixed
    lowered = body.lower(state, jax.device_put(b), steps)
    txt = lowered.compile().as_text()
    with open("/tmp/step_hlo.txt", "w") as f:
        f.write(txt)
    print("HLO chars:", len(txt), "(full text: /tmp/step_hlo.txt)")
    names = names or ["copy.1627", "copy.1628", "copy.1606",
                      "copy.1691", "copy.1623", "slice.591"]
    for name in names:
        for line in txt.splitlines():
            if f"%{name} " in line or f"{name} = " in line:
                print("----", name)
                print(line.strip()[:400])
                break


if __name__ == "__main__":
    main()
