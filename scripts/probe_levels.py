"""TPU probe: 2D UNet grad time vs s2d_levels (0-3), bf16, bench config
(24x256^2). Scan-amortized + fetch-forced (the only reliable timing
through the axon relay). Also times fwd(train) per level for the bwd/fwd
ratio."""
import time

import jax
import jax.numpy as jnp
import numpy as np

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

    for lv in (2, 3, 2, 3):
        m = UNet(in_chns=1, num_classes=C, s2d_levels=lv,
                 dtype=jnp.bfloat16)
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

        timeit(lambda xx: jax.grad(loss_fn)(params, xx), x,
               label=f"grad s2d{lv} bf16")
        timeit(lambda xx: m.apply({"params": params, "batch_stats": stats},
                                  xx, train=False), x,
               label=f"fwd(eval) s2d{lv} bf16")


if __name__ == "__main__":
    main()
