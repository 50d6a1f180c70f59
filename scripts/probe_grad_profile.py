"""TPU probe: per-op time attribution for the mean-teacher train step at
the bench config, via jax.profiler device trace (works through the axon
relay — the trace carries /device:TPU:0 X events). Prints the top HLO ops
by total device time over the traced window plus a category rollup."""
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

OUT = "/tmp/grad_prof"


def main():
    from cvssl_tpu.train.config import TrainConfig
    from cvssl_tpu.train.engine import Engine

    # extra args: key=value TrainConfig overrides (int/str), e.g.
    # fused_loss=0 s2d_loss=off method=cross_teaching model2=ViT_Seg
    # batch_size=16 patch=224
    over = {}
    for kv in sys.argv[1:]:
        k, _, v = kv.partition("=")
        over[k] = int(v) if v.lstrip("-").isdigit() else v
    patch = over.pop("patch", 256)
    use_store = bool(over.pop("store", 0))
    base = dict(method="mean_teacher", model="unet", num_classes=4,
                batch_size=24, labeled_bs=12, num_devices=None)
    base.update(over)
    batch = base["batch_size"]
    base.setdefault("labeled_slices_override", base["labeled_bs"])
    cfg = TrainConfig(patch_size=(patch, patch), **base)
    print("config:", {**over, "patch": patch})
    engine = Engine(cfg)
    rng = np.random.default_rng(0)
    b = {"image": rng.normal(
             size=(batch, patch, patch, 1)).astype(np.float32),
         "label": rng.integers(
             0, 4, (batch, patch, patch)).astype(np.int32),
         "idx": np.arange(batch, dtype=np.int32)}
    state = engine.init_state(jax.random.PRNGKey(0), b)
    if use_store:
        # the PRODUCTION path: device store + in-jit augmentation + scan
        # (what bench.py measures) — train_steps_fixed skips augmentation
        import bench
        from cvssl_tpu.data.device_store import DeviceSliceStore
        from cvssl_tpu.data.sampler import TwoStreamBatchSampler
        store = DeviceSliceStore(bench._SyntheticACDC(), cfg.patch_size)
        engine.attach_store(store)
        sampler = TwoStreamBatchSampler(
            list(range(bench.ACDC_LABELED_SLICES)),
            list(range(bench.ACDC_LABELED_SLICES, bench.ACDC_TRAIN_SLICES)),
            batch, batch - cfg.labeled_bs, rng=np.random.default_rng(0))
        stream = sampler.epochs()

        def run():
            s, m = engine.train_steps_scan(
                state, [next(stream) for _ in range(10)])
            return s, m
    else:
        def run():
            return engine.train_steps_fixed(state, b, 10)

    state, m = run()
    float(m["loss"])  # compile + sync

    with jax.profiler.trace(OUT):
        state, m = run()
        float(m["loss"])

    time.sleep(2)
    paths = sorted(glob.glob(OUT + "/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("no trace written", file=sys.stderr)
        return
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    ev = tr.get("traceEvents", [])
    tpu_pids = {e["pid"] for e in ev if e.get("ph") == "M"
                and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    agg = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            agg[e["name"]] += e.get("dur", 0)
    # drop ENCLOSING events (the jitted program, its while loop, and bare
    # region ids) — they each span the whole step and would double-count
    containers = {n for n in agg
                  if n.startswith(("jit_", "while", "body", "condition"))
                  or n.isdigit()}
    for n in containers:
        print(f"(container: {n} {agg[n]/1e4:.3f} ms/step)")
        del agg[n]
    total = sum(agg.values())
    print(f"total device time {total/1e3:.2f} ms over traced window "
          f"(10 steps => {total/1e4:.2f} ms/step)")
    cats = collections.Counter()
    for name, dur in agg.items():
        m_ = re.match(r"([a-zA-Z_\-]+)", name)
        cats[m_.group(1) if m_ else name] += dur
    print("\n-- categories --")
    for name, dur in cats.most_common(15):
        print(f"{dur/1e4:8.3f} ms/step  {100*dur/total:5.1f}%  {name}")
    print("\n-- top ops --")
    for name, dur in agg.most_common(40):
        print(f"{dur/1e4:8.3f} ms/step  {100*dur/total:5.1f}%  {name[:90]}")


if __name__ == "__main__":
    main()
