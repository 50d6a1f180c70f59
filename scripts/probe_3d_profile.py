"""TPU probe: per-op device-time census for the 3D paths (VERDICT r4 #5 —
the UAMT-3D train step and the BraTS sliding-window eval get the same
trace-based regression gate the 2D step has in probe_grad_profile.py).

Usage:
  python scripts/probe_3d_profile.py uamt3d   # 3D train step, op budget
  python scripts/probe_3d_profile.py sw       # sliding-window volume
Both print the category rollup + top ops and a single RESULT JSON line
(device ms/step or ms/volume) for PERFORMANCE.md bookkeeping.
"""
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def _print_census(census, steps, label):
    for n, ms in census["containers_ms"].items():
        print(f"(container: {n} {ms/steps:.3f} ms/{label})")
    total = census["total_ms"]
    print(f"total device time {total:.2f} ms "
          f"({steps} {label}s => {total/steps:.3f} ms/{label})")
    print("\n-- categories --")
    for name, ms in sorted(census["cats"].items(), key=lambda kv: -kv[1])[:15]:
        print(f"{ms/steps:8.3f} ms/{label}  {100*ms/total:5.1f}%  {name}")
    print("\n-- top ops --")
    for name, ms in list(census["ops"].items())[:40]:
        print(f"{ms/steps:8.3f} ms/{label}  {100*ms/total:5.1f}%  {name[:90]}")


def probe_uamt3d():
    import jax

    from cvssl_tpu.train.config import TrainConfig
    from cvssl_tpu.train.engine import Engine
    from cvssl_tpu.utils.compile_cache import enable_compilation_cache
    from cvssl_tpu.utils.trace_census import traced_device_ms

    enable_compilation_cache()
    batch = 4
    cfg = TrainConfig(method="uamt", model="unet_3D", num_classes=2,
                      batch_size=batch, labeled_bs=2, dim=3,
                      patch_size=(96, 96, 96), num_devices=None,
                      labeled_slices_override=2)
    engine = Engine(cfg)
    rng = np.random.default_rng(0)
    b = {"image": rng.normal(size=(batch, 96, 96, 96, 1)).astype(np.float32),
         "label": rng.integers(0, 2, (batch, 96, 96, 96)).astype(np.int32),
         "idx": np.arange(batch, dtype=np.int32)}
    state = engine.init_state(jax.random.PRNGKey(0), b)
    state, m = engine.train_steps_fixed(state, b, 5)
    float(m["loss"])  # compile + honest sync (fetch-forced)

    census = traced_device_ms(
        lambda: float(engine.train_steps_fixed(state, b, 5)[1]["loss"]))
    if census is None:
        print("RESULT:" + json.dumps({"error": "trace unavailable"}))
        return
    _print_census(census, 5, "step")
    print("RESULT:" + json.dumps(
        {"metric": "uamt3d_device_ms_per_step",
         "value": round(census["total_ms"] / 5, 3)}))


def probe_sw():
    import jax
    import jax.numpy as jnp

    from cvssl_tpu.eval.val3d import SlidingWindowEvaluator
    from cvssl_tpu.models import net_factory_3d
    from cvssl_tpu.train.config import TrainConfig
    from cvssl_tpu.utils.compile_cache import enable_compilation_cache
    from cvssl_tpu.utils.trace_census import traced_device_ms

    enable_compilation_cache()
    kw = TrainConfig(dim=3, patch_size=(96, 96, 96)).model_kwargs("unet_3D")
    net = net_factory_3d("unet_3D", in_chns=1, class_num=2, **kw)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 96, 96, 96, 1)), train=False)

    @jax.jit
    def predict(x):
        return jax.nn.softmax(
            net.apply(variables, x, train=False).astype(jnp.float32), -1)

    ev = SlidingWindowEvaluator(predict, (96, 96, 96), 2, 64, 64)
    vol = np.random.default_rng(0).normal(
        size=(140, 180, 180)).astype(np.float32)
    ev.predict_volume(vol)  # compile (np.asarray inside = honest sync)

    census = traced_device_ms(lambda: ev.predict_volume(vol))
    if census is None:
        print("RESULT:" + json.dumps({"error": "trace unavailable"}))
        return
    _print_census(census, 1, "volume")
    print("RESULT:" + json.dumps(
        {"metric": "sliding_window_device_ms_per_volume",
         "value": round(census["total_ms"], 3)}))


if __name__ == "__main__":
    {"uamt3d": probe_uamt3d, "sw": probe_sw}[sys.argv[1]]()
