"""TPU probe: SwinUnet train-step cost anatomy at the cross-teaching config
(batch 16, 224^2, Swin-tiny embed 96 / window 7).

Variants timed within one process (tunnel drift): f32 vs bf16 full model,
fwd and grad; plus the UNet share of the cross-teaching step for context.
Fetch-forced + scan-amortized (scripts/probe_parts.py::timeit)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, HW, C = 16, 224, 4


def timeit(fn, x, iters=20, label=""):
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
    print(f"{label:46s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    from cvssl_tpu.models.swin_unet import SwinUnet

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, HW, HW, 1)), jnp.float32)
    lbl = jnp.asarray(rng.integers(0, C, (B, HW, HW)), jnp.int32)

    import functools
    for dt, tag in ((None, "f32"), (jnp.bfloat16, "bf16")):
        m = SwinUnet(num_classes=C, dtype=dt) if dt is not None else \
            SwinUnet(num_classes=C)
        v = jax.jit(functools.partial(m.init, train=False))(
            {"params": jax.random.PRNGKey(0)}, x)
        params = v["params"]
        drng = jax.random.PRNGKey(2)

        def fwd(xx, train):
            if train:
                return m.apply({"params": params}, xx, train=True,
                               rngs={"dropout": drng})
            return m.apply({"params": params}, xx, train=False)

        def loss_fn(p, xx):
            y = m.apply({"params": p}, xx, train=True,
                        rngs={"dropout": drng})
            onehot = jax.nn.one_hot(lbl, C)
            return jnp.mean((jax.nn.softmax(y) - onehot) ** 2)

        timeit(lambda xx: fwd(xx, False), x, label=f"swin fwd(eval) {tag}")
        timeit(lambda xx: jax.grad(loss_fn)(params, xx), x,
               label=f"swin grad      {tag}")


if __name__ == "__main__":
    main()
