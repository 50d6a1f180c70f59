"""MFU accounting (utils/mfu.py) — XLA cost-model FLOPs for the programs
bench.py measures (VERDICT r4 #3). On CPU there is no published peak, so
``mfu`` is None here; the tests pin the FLOPs side (counts, caching,
last_flops plumbing) that the TPU bench run reuses verbatim."""
import jax
import jax.numpy as jnp
import numpy as np

from cvssl_tpu.utils.mfu import (compiled_flops, mfu, peak_flops,
                                 per_step_flops, program_flops)


def test_program_flops_counts_dot_macs():
    f = jax.jit(lambda a, b: a @ b)
    x = jnp.ones((64, 128), jnp.float32)
    y = jnp.ones((128, 32), jnp.float32)
    got = program_flops(f, x, y)
    assert got == 2 * 64 * 128 * 32  # XLA counts dots as 2*MACs


def test_program_flops_accepts_shape_structs():
    f = jax.jit(lambda a, b: a @ b)
    got = program_flops(f, jax.ShapeDtypeStruct((8, 8), jnp.float32),
                        jax.ShapeDtypeStruct((8, 8), jnp.float32))
    assert got == 2 * 8 * 8 * 8


def test_mfu_none_without_peak():
    # CPU device_kind has no published MXU peak -> honest None, not a guess
    assert peak_flops(jax.devices("cpu")[0]) is None
    assert mfu(1e9, 0.001, jax.devices("cpu")[0]) is None
    assert mfu(None, 0.001) is None


def test_peak_table_lookup():
    class FakeDev:
        device_kind = "TPU v5 lite"
    assert peak_flops(FakeDev()) == 197e12

    class FakeDev2:
        device_kind = "TPU v4"
    assert mfu(275e12 * 0.5, 1.0, FakeDev2()) == 0.5


def test_train_step_program_flops():
    from cvssl_tpu.parallel import mesh as pmesh
    from cvssl_tpu.train.config import TrainConfig
    from cvssl_tpu.train.engine import Engine

    cfg = TrainConfig(method="mean_teacher", model="unet", num_classes=4,
                      batch_size=4, labeled_bs=2, patch_size=(32, 32),
                      labeled_slices_override=2, num_devices=1)
    eng = Engine(cfg)
    rng = np.random.default_rng(0)
    b = {"image": rng.normal(size=(4, 32, 32, 1)).astype(np.float32),
         "label": rng.integers(0, 4, (4, 32, 32)).astype(np.int32),
         "idx": np.arange(4, dtype=np.int32)}
    state = eng.init_state(jax.random.PRNGKey(0), b)
    state, _ = eng.train_steps_fixed(state, b, 2)
    bdev = jax.device_put(b, pmesh.batch_sharding(eng.mesh))
    f2 = program_flops(eng._train_step_fixed, state, bdev, 2)
    f4 = program_flops(eng._train_step_fixed, state, bdev, 4)
    assert f2 and f2 > 1e6  # a real conv net step is megaflops even at 32^2
    # XLA counts the scan body ONCE (no trip-count modeling) — the
    # invariant per_step_flops relies on; if this ever fails the
    # difference-quotient branch takes over, so pin both paths:
    per_step = per_step_flops(eng._train_step_fixed,
                              (state, bdev, 2), (state, bdev, 4), 2)
    if f4 == f2:
        assert per_step == f2
    else:
        assert per_step == (f4 - f2) / 2


def test_sliding_window_last_flops():
    from cvssl_tpu.eval.val3d import SlidingWindowEvaluator

    @jax.jit
    def predict(x):  # (B, 16,16,16, 1) -> (B, ..., 2)
        w = jnp.ones((1, 1, 1, 1, 2))
        return jax.nn.softmax(x * w, -1)

    ev = SlidingWindowEvaluator(predict, (16, 16, 16), 2, 8, 8,
                                patch_batch=2)
    assert ev.last_flops() is None  # nothing dispatched yet
    vol = np.random.default_rng(0).normal(size=(24, 24, 24)).astype(
        np.float32)
    ev.predict_volume(vol)
    f = ev.last_flops()
    assert f and f > 0
