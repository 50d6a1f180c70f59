"""Dump the optimized HLO of the production scan-step program and map the
hot op names from the device trace (probe_grad_profile store=1) back to
their source operations/metadata."""
import re
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    import bench
    from cvssl_tpu.data.device_store import DeviceSliceStore
    from cvssl_tpu.data.sampler import TwoStreamBatchSampler
    from cvssl_tpu.train.config import TrainConfig
    from cvssl_tpu.train.engine import Engine

    batch = 24
    cfg = TrainConfig(
        method="mean_teacher", model="unet", num_classes=4,
        batch_size=batch, labeled_bs=12, patch_size=(256, 256),
        labeled_slices_override=bench.ACDC_LABELED_SLICES, num_devices=None)
    engine = Engine(cfg)
    store = DeviceSliceStore(bench._SyntheticACDC(), cfg.patch_size)
    engine.attach_store(store)

    init_batch = {
        "image": np.zeros((batch, 256, 256, 1), np.float32),
        "label": np.zeros((batch, 256, 256), np.int32),
        "idx": np.arange(batch, dtype=np.int32)}
    state = engine.init_state(jax.random.PRNGKey(cfg.seed), init_batch)

    fn = engine._build_scan_step()
    import jax.numpy as jnp
    idx = jnp.zeros((10, batch), jnp.int32)
    lowered = fn.lower(state, store.arrays(), idx)
    compiled = lowered.compile()
    txt = compiled.as_text()
    out = "/tmp/scan_step_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out}")

    # pull the ops named on the command line (e.g. fusion.3539) with their
    # full definition lines + metadata
    for name in sys.argv[1:]:
        pat = re.compile(r"^\s*%?" + re.escape(name) + r"\s*=", re.M)
        m = pat.search(txt)
        if not m:
            print(f"--- {name}: NOT FOUND")
            continue
        line = txt[m.start():txt.index("\n", m.start())]
        print(f"--- {name}:")
        print(line[:1500])


if __name__ == "__main__":
    main()
