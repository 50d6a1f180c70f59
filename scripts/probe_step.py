"""TPU probe: where does the mean-teacher step time go after the s2d fix?

Times (fetch-forced, scan-amortized): UNet fwd train / fwd+bwd / full engine
step, for (s2d_levels, dtype) variants at the bench config 24x256^2.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from cvssl_tpu.models.unet import UNet


def timeit(fn, x, iters=20):
    """fn: x -> pytree. The scan carry perturbs x each iteration so XLA
    cannot hoist fn out of the loop; timing is fetch-forced."""
    @jax.jit
    def run(x):
        def body(c, _):
            out = fn(x + c * jnp.float32(1e-30))
            leaf = jax.tree_util.tree_leaves(out)[0]
            return leaf.ravel()[0].astype(jnp.float32), ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(run(x))
    t0 = time.perf_counter()
    float(run(x))
    return (time.perf_counter() - t0) / iters


def probe_model(s2d, dtype_name):
    dt = jnp.dtype(dtype_name) if dtype_name != "float32" else None
    m = UNet(in_chns=1, num_classes=4, s2d_levels=s2d, dtype=dt)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(24, 256, 256, 1)),
                    jnp.float32)
    lbl = jnp.asarray(np.random.default_rng(1).integers(0, 4, (24, 256, 256)))
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x, train=False)
    params, stats = v["params"], v["batch_stats"]
    drng = jax.random.PRNGKey(2)

    def fwd(params, stats, x):
        y, mut = m.apply({"params": params, "batch_stats": stats}, x,
                         train=True, mutable=["batch_stats"],
                         rngs={"dropout": drng})
        return y

    def loss(params, stats, x):
        y, mut = m.apply({"params": params, "batch_stats": stats}, x,
                         train=True, mutable=["batch_stats"],
                         rngs={"dropout": drng})
        onehot = jax.nn.one_hot(lbl, 4)
        return jnp.mean((jax.nn.softmax(y) - onehot) ** 2), mut

    grad = jax.grad(loss, has_aux=True)

    t_fwd = timeit(lambda xx: fwd(params, stats, xx), x)
    t_bwd = timeit(lambda xx: grad(params, stats, xx)[0], x)
    t_eval = timeit(lambda xx: m.apply({"params": params,
                                        "batch_stats": stats},
                                       xx, train=False), x)
    print(f"s2d={s2d} {dtype_name:9s} fwd(train) {t_fwd*1e3:7.2f} ms  "
          f"grad {t_bwd*1e3:7.2f} ms  fwd(eval) {t_eval*1e3:7.2f} ms")


def probe_engine():
    from cvssl_tpu.data.device_store import DeviceSliceStore
    from cvssl_tpu.data.sampler import TwoStreamBatchSampler
    from cvssl_tpu.train.config import TrainConfig
    from cvssl_tpu.train.engine import Engine

    class DS:
        def __len__(self):
            return 256

        def __getitem__(self, i):
            r = np.random.default_rng(i)
            return {"image": r.normal(0.5, .2, (232, 256)).astype(np.float32),
                    "label": r.integers(0, 4, (232, 256)).astype(np.uint8)}

    for kw in ({"s2d_levels": 2, "dtype": "bfloat16"},
               {"s2d_levels": 0, "dtype": "float32"}):
        cfg = TrainConfig(method="mean_teacher", model="unet", num_classes=4,
                          batch_size=24, labeled_bs=12,
                          patch_size=(256, 256), num_devices=None,
                          labeled_slices_override=128, **kw)
        e = Engine(cfg)
        store = DeviceSliceStore(DS(), cfg.patch_size)
        e.attach_store(store)
        b = {"image": np.zeros((24, 256, 256, 1), np.float32),
             "label": np.zeros((24, 256, 256), np.int32),
             "idx": np.arange(24, dtype=np.int32)}
        s = e.init_state(jax.random.PRNGKey(0), b)
        samp = TwoStreamBatchSampler(list(range(128)), list(range(128, 256)),
                                     24, 12, rng=np.random.default_rng(0))
        st = samp.epochs()
        for _ in range(5):
            s, m = e.train_step_indices(s, next(st))
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(40):
            s, m = e.train_step_indices(s, next(st))
        float(m["loss"])
        dt = (time.perf_counter() - t0) / 40
        print(f"engine step {kw}: {dt*1e3:7.2f} ms "
              f"({24/dt:.0f} slices/s)")


if __name__ == "__main__":
    for s2d, dtn in ((0, "float32"), (0, "bfloat16"), (2, "float32"),
                     (2, "bfloat16")):
        probe_model(s2d, dtn)
    probe_engine()
