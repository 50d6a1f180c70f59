"""TPU probe: 2D UNet full-grad time, k2-pair wgrad (XLA, odd shifted
shapes) vs dense-aligned custom-VJP wgrad (ops/s2d.py::WGRAD_DENSE).

Bench config (24x256^2, s2d2, bf16). Fetch-forced, scan-amortized; both
variants timed within ONE process run (tunnel variance is +-30% across
runs, ~stable within)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from cvssl_tpu.ops import s2d
from cvssl_tpu.models.unet import UNet

B, H, W, C = 24, 256, 256, 4


def timeit(fn, x, iters=30, label=""):
    @jax.jit
    def run(x):
        def body(c, _):
            out = fn(jax.tree_util.tree_map(
                lambda t: t + (c * 1e-30).astype(t.dtype), x))
            tot = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree_util.tree_leaves(out))
            return tot, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(run(x))
    t0 = time.perf_counter()
    float(run(x))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:44s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, 1)), jnp.float32)
    lbl = jnp.asarray(rng.integers(0, C, (B, H, W)), jnp.int32)

    m = UNet(in_chns=1, num_classes=C, s2d_levels=2, dtype=jnp.bfloat16)
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x, train=False)
    params, stats = v["params"], v["batch_stats"]
    drng = jax.random.PRNGKey(2)

    def loss_fn(p, xx):
        y, _ = m.apply({"params": p, "batch_stats": stats}, xx,
                       train=True, mutable=["batch_stats"],
                       rngs={"dropout": drng})
        onehot = jax.nn.one_hot(lbl, C)
        return jnp.mean((jax.nn.softmax(y) - onehot) ** 2)

    for dense in (False, True, False, True):  # interleave: tunnel drift
        s2d.WGRAD_DENSE = dense
        tag = "dense-aligned wgrad (custom vjp)" if dense \
            else "k2 shifted wgrad (XLA)"
        timeit(lambda xx: jax.grad(loss_fn)(params, xx), x,
               label=f"grad s2d2 bf16 | {tag}")
        timeit(lambda xx: m.apply({"params": params, "batch_stats": stats},
                                  xx, train=False), x,
               label=f"fwd(eval)      | {tag}")

    # RNG impl cost: threefry (default) vs rbg keys for dropout + augment
    s2d.WGRAD_DENSE = False
    drng_rbg = jax.random.key(2, impl="rbg")

    def loss_rng(key, xx):
        y, _ = m.apply({"params": params, "batch_stats": stats}, xx,
                       train=True, mutable=["batch_stats"],
                       rngs={"dropout": key})
        onehot = jax.nn.one_hot(lbl, C)
        return jnp.mean((jax.nn.softmax(y) - onehot) ** 2)

    timeit(lambda xx: jax.grad(loss_rng, argnums=1)(drng, xx), x,
           label="grad | threefry dropout keys")
    timeit(lambda xx: jax.grad(loss_rng, argnums=1)(drng_rbg, xx), x,
           label="grad | rbg dropout keys")

    from cvssl_tpu.data import device_store as dsm
    from cvssl_tpu.data.device_store import DeviceSliceStore

    class DS:
        def __len__(self):
            return 256

        def __getitem__(self, i):
            r = np.random.default_rng(i)
            return {"image": r.normal(0.5, .2, (232, 256)).astype(np.float32),
                    "label": r.integers(0, 4, (232, 256)).astype(np.uint8)}

    store = DeviceSliceStore(DS(), (H, W))
    idx = jnp.arange(B, dtype=jnp.int32)
    imgs, labs = store.arrays()
    timeit(lambda k: store.batch_fn((imgs, labs), idx, k),
           jax.random.PRNGKey(0), label="batch_fn | threefry")
    timeit(lambda k: store.batch_fn((imgs, labs), idx, k),
           jax.random.key(0, impl="rbg"), label="batch_fn | rbg")


if __name__ == "__main__":
    main()
