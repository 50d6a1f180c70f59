"""Dump the optimized HLO of the cross-teaching train_steps_fixed program
(the one probe_grad_profile method=cross_teaching traces) and print the
definitions of the op names given on the command line."""
import re
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from cvssl_tpu.train.config import TrainConfig
    from cvssl_tpu.train.engine import Engine

    batch, patch = 16, 224
    cfg = TrainConfig(
        method="cross_teaching", model="unet", num_classes=4,
        batch_size=batch, labeled_bs=8, patch_size=(patch, patch),
        labeled_slices_override=64, num_devices=None)
    engine = Engine(cfg)
    b = {"image": np.random.RandomState(0).rand(
             batch, patch, patch, 1).astype(np.float32),
         "label": np.random.RandomState(1).randint(
             0, 4, (batch, patch, patch)).astype(np.int32),
         "idx": np.arange(batch, dtype=np.int32)}
    state = engine.init_state(jax.random.PRNGKey(0), b)

    # build + fetch the jitted fixed-steps program (train_steps_fixed
    # caches it on first call; lower without executing)
    engine.train_steps_fixed(state, b, 1)
    state = engine.init_state(jax.random.PRNGKey(0), b)  # 1st was donated
    fn = engine._train_step_fixed
    lowered = fn.lower(state, jax.tree_util.tree_map(jnp.asarray, b), 10)
    compiled = lowered.compile()
    txt = compiled.as_text()
    out = "/tmp/ct_step_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out}")

    for name in sys.argv[1:]:
        pat = re.compile(r"^\s*%?" + re.escape(name) + r"\s*=", re.M)
        m = pat.search(txt)
        if not m:
            print(f"--- {name}: NOT FOUND")
            continue
        line = txt[m.start():txt.index("\n", m.start())]
        print(f"--- {name}:")
        print(line[:1400])


if __name__ == "__main__":
    main()
