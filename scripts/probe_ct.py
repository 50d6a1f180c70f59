"""TPU probe: cross-teaching step A/B over (swin dtype, rng impl) —
SCAN-AMORTIZED: K step-body iterations inside ONE jit, a single value
fetch at the end. Per-step engine dispatch through the axon tunnel has
+-15% drift (earlier per-step A/Bs reversed between repeats); this form
measures pure device time.

Engines with different rng impls cannot coexist in one process (the
global default-prng-impl config interprets raw uint32 keys, and the key
widths differ: threefry 2 words, rbg 4), so each config is built, timed,
and torn down sequentially."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def run_config(tag, vit_dtype, rng_impl, iters=10):
    from cvssl_tpu.train.config import TrainConfig
    from cvssl_tpu.train.engine import Engine

    batch = 16
    vk = {"dtype": jnp.bfloat16} if vit_dtype == "bf16" else \
        {"dtype": None}
    cfg = TrainConfig(method="cross_teaching", model="unet",
                      model2="ViT_Seg", num_classes=4, batch_size=batch,
                      labeled_bs=8, patch_size=(224, 224), num_devices=None,
                      labeled_slices_override=8, vit_kwargs=vk,
                      rng_impl=rng_impl)
    engine = Engine(cfg)
    rng = np.random.default_rng(0)
    b = {"image": rng.normal(size=(batch, 224, 224, 1)).astype(np.float32),
         "label": rng.integers(0, 4, (batch, 224, 224)).astype(np.int32),
         "idx": np.arange(batch, dtype=np.int32)}
    state = engine.init_state(jax.random.PRNGKey(0), b)
    body = engine._build_train_step_body()

    @jax.jit
    def run_k(state, batch):
        def step(s, _):
            s, m = body(s, batch)
            return s, m["loss"]
        state, losses = jax.lax.scan(step, state, None, length=iters)
        return state, losses[-1]

    state, loss = run_k(state, b)
    float(loss)  # warm (compile) + sync
    t0 = time.perf_counter()
    state, loss = run_k(state, b)
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:26s} {dt*1e3:8.2f} ms/step = {batch/dt:7.1f} slices/s",
          flush=True)


if __name__ == "__main__":
    for vit_dtype, impl in (("f32", "threefry"), ("bf16", "threefry"),
                            ("f32", "threefry"), ("bf16", "threefry")):
        run_config(f"{vit_dtype} swin | {impl}", vit_dtype, impl)
