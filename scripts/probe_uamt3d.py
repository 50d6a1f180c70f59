"""TPU probe: UAMT-3D step cost A/B over (teacher-fusion, fused_loss) at
the bench config (batch 4, 96^3, 2 classes). Scan-amortized inside one
jit via Engine.train_steps_fixed; fetch-forced. Also prints the backend
name (the pallas fused-loss gate tests for 'tpu')."""
import time

import jax
import numpy as np


def run_config(tag, fuse_teacher, fused_loss, k=5):
    from cvssl_tpu.train import methods
    from cvssl_tpu.train.config import TrainConfig
    from cvssl_tpu.train.engine import Engine
    from cvssl_tpu.train.methods import uamt

    uamt.FUSE_TEACHER_3D = fuse_teacher
    batch = 4
    cfg = TrainConfig(method="uamt", model="unet_3D", num_classes=2,
                      batch_size=batch, labeled_bs=2, dim=3,
                      patch_size=(96, 96, 96), num_devices=None,
                      labeled_slices_override=2, fused_loss=fused_loss)
    engine = Engine(cfg)
    rng = np.random.default_rng(0)
    b = {"image": rng.normal(size=(batch, 96, 96, 96, 1)).astype(np.float32),
         "label": rng.integers(0, 2, (batch, 96, 96, 96)).astype(np.int32),
         "idx": np.arange(batch, dtype=np.int32)}
    state = engine.init_state(jax.random.PRNGKey(0), b)
    state, metrics = engine.train_steps_fixed(state, b, k)
    float(metrics["loss"])  # compile + sync
    t0 = time.perf_counter()
    for _ in range(2):
        state, metrics = engine.train_steps_fixed(state, b, k)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / (2 * k)
    print(f"{tag:44s} {dt*1e3:8.1f} ms/step = {batch/dt:6.2f} vol/s",
          flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    for fuse, fl in ((True, True), (False, True), (True, False),
                     (False, False), (True, True)):
        run_config(f"fuse_teacher={fuse} fused_loss={fl}", fuse, fl)
