"""Profile ONE validation pass end-to-end on the real chip (VERDICT r4 #1).

Breaks engine.validate into stages and times each with fetch-forced syncs
(jax.block_until_ready is a no-op through the axon relay — CLAUDE.md):
  host_read   — dataset[i] h5 reads
  batch_build — np.zeros + fill
  h2d+fwd     — predict dispatch; synced by a 1-element fetch of preds
  edt         — jitted val-metrics call + full (small) fetch
  validate    — engine.validate wall (the whole thing, as fit sees it)
Also times the checkpoint-side per-val costs: device_snapshot(params) and
a full-state device_snapshot + host fetch (what the AsyncWriter pays).

Run: cd /tmp && python /root/repo/scripts/probe_val.py [--size 256]
"""
import argparse
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    a = ap.parse_args()

    import jax

    from cvssl_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache("auto")
    from cvssl_tpu.data.synthetic import make_synthetic_acdc
    from cvssl_tpu.data.datasets import SliceDataset
    from cvssl_tpu.train.config import TrainConfig
    from cvssl_tpu.train import engine as E
    from cvssl_tpu.utils import checkpoint as ckpt
    from cvssl_tpu.eval import val2d
    from cvssl_tpu.ops import edt

    root = make_synthetic_acdc(tempfile.mkdtemp(), num_cases=60,
                               slices_per_case=8, num_val=16, size=a.size)
    cfg = TrainConfig(root_path=root, exp="probe_val", model="unet",
                      method="mean_teacher", batch_size=24, labeled_bs=12,
                      labeled_num=14, patch_size=(a.size, a.size),
                      max_iterations=10, seed=1337)
    eng = E.Engine(cfg)
    val_ds = SliceDataset(cfg.root_path, "val")
    rng = jax.random.PRNGKey(0)
    b, ps = cfg.batch_size, tuple(cfg.patch_size)
    first = {"image": np.zeros((b, *ps, 1), np.float32),
             "label": np.zeros((b, *ps), np.int32),
             "idx": np.arange(b, dtype=np.int32)}
    state = eng.init_state(rng, first)
    print("state ready", flush=True)

    def t(label, fn, reps=a.reps):
        outs = []
        for i in range(reps):
            t0 = time.time()
            r = fn()
            outs.append(time.time() - t0)
        print(f"{label:24s} " + " ".join(f"{x*1e3:8.1f}" for x in outs)
              + "  ms", flush=True)
        return r

    # full validate as fit() sees it (first call pays compiles)
    t("validate(total)", lambda: eng.validate(state, val_ds), reps=a.reps + 1)

    # round-5 resident path: upload-once + fused fwd->argmax->EDT, only the
    # (classes-1, 2) table fetched (first call pays upload + compile)
    eng._resident_val = True
    t("validate(resident)", lambda: eng.validate(state, val_ds),
      reps=a.reps + 1)
    eng._resident_val = False

    # stage-by-stage replication of the val2d all-device path
    samples = t("host_read", lambda: [val_ds[i] for i in range(len(val_ds))])
    n = len(samples)
    sv, xv, yv = samples[0]["image"].shape
    flat = val2d._bucket(n * sv)

    def build():
        batch = np.zeros((flat, xv, yv, 1), np.float32)
        batch[:n * sv, ..., 0] = np.stack(
            [s["image"] for s in samples]).reshape(n * sv, xv, yv)
        return batch
    batch = t("batch_build", build)
    labels = np.stack([np.asarray(s["label"])
                       for s in samples]).astype(np.uint8)

    predict = eng.predict_fn("model", state)

    def fwd():
        preds = predict(batch)
        np.asarray(preds[0, 0, 0])  # force
        return preds
    preds = t("h2d+fwd(sync)", fwd)
    pr = preds[:n * sv].reshape(n, sv, xv, yv).astype(np.uint8)

    mfn = edt._jitted_val_metrics((sv, xv, yv), cfg.num_classes)

    def metrics():
        return np.asarray(mfn(pr, labels))
    t("edt+fetch", metrics)

    # label re-upload cost alone
    import jax.numpy as jnp
    def lab_up():
        z = jnp.asarray(labels)
        np.asarray(z[0, 0, 0])
        return z
    t("labels_h2d", lab_up)

    # checkpoint-side costs the val block triggers
    t("snap(params)", lambda: np.asarray(jax.tree_util.tree_leaves(
        ckpt.device_snapshot(state.params["model"]))[0])[(0,) * 1].sum())
    t("snap(full)+to_host", lambda: ckpt.to_host(
        ckpt.device_snapshot(state)) and None)
    nbytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(state)
                 if hasattr(x, "nbytes"))
    print(f"full-state bytes: {nbytes/1e6:.1f} MB")


if __name__ == "__main__":
    main()
