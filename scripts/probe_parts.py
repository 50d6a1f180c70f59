"""TPU probe: per-part cost of the mean-teacher step at the bench config.

Times, fetch-forced and scan-amortized with a data-dependent carry:
  - device-store batch_fn (gather + augmentation) alone
  - student fwd(train), full grad, teacher fwd(eval)
  - optimizer update + EMA alone
  - fused Dice+CE loss alone
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, C = 24, 256, 256, 4


def timeit(fn, x, iters=30, label=""):
    @jax.jit
    def run(x):
        def body(c, _):
            out = fn(jax.tree_util.tree_map(
                lambda t: t + (c * 1e-30).astype(t.dtype), x))
            # consume EVERY output leaf fully, or XLA dead-code-eliminates
            # whole branches (e.g. all but one parameter's gradient)
            tot = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree_util.tree_leaves(out))
            return tot, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(run(x))
    t0 = time.perf_counter()
    float(run(x))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:34s} {dt*1e3:8.3f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)

    # --- batch_fn ---------------------------------------------------------
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
    key = jax.random.PRNGKey(0)
    imgs, labs = store.arrays()

    timeit(lambda k: store.batch_fn((imgs, labs), idx, k), key,
           label="batch_fn (gather+augment)")
    from cvssl_tpu.data import device_store as dsm
    timeit(lambda k: dsm.gather_augment(imgs, labs, idx, k, augment=False),
           key, label="batch_fn (gather only)")

    # --- model ------------------------------------------------------------
    from cvssl_tpu.models.unet import UNet
    m = UNet(in_chns=1, num_classes=C, s2d_levels=2, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(B, H, W, 1)), jnp.float32)
    lbl = jnp.asarray(rng.integers(0, C, (B, H, W)), jnp.int32)
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x, train=False)
    params, stats = v["params"], v["batch_stats"]
    drng = jax.random.PRNGKey(2)

    def fwd(xx, train):
        if train:
            y, _ = m.apply({"params": params, "batch_stats": stats}, xx,
                           train=True, mutable=["batch_stats"],
                           rngs={"dropout": drng})
            return y
        return m.apply({"params": params, "batch_stats": stats}, xx,
                       train=False)

    timeit(lambda xx: fwd(xx, True), x, label="student fwd(train) s2d2 bf16")
    timeit(lambda xx: fwd(xx, False), x, label="teacher fwd(eval) s2d2 bf16")

    def loss_fn(p, xx):
        y, mut = m.apply({"params": p, "batch_stats": stats}, xx,
                         train=True, mutable=["batch_stats"],
                         rngs={"dropout": drng})
        onehot = jax.nn.one_hot(lbl, C)
        return jnp.mean((jax.nn.softmax(y) - onehot) ** 2)

    timeit(lambda xx: jax.grad(loss_fn)(params, xx), x,
           label="grad (fwd+bwd) s2d2 bf16")

    # fwd with nearest upsampling (isolate bilinear gather cost)
    import cvssl_tpu.models.unet as um
    real_bilinear = um.bilinear_resize
    um.bilinear_resize = lambda t, hw, align_corners=True: jax.image.resize(
        t, (t.shape[0], *hw, t.shape[-1]), "nearest")
    timeit(lambda xx: fwd(xx, False), x,
           label="teacher fwd(eval) NEAREST-up")
    um.bilinear_resize = real_bilinear

    # fwd with zero dropout (isolate RNG/mask cost)
    m0 = UNet(in_chns=1, num_classes=C, s2d_levels=2, dtype=jnp.bfloat16,
              dropout=(0.0,) * 5)
    v0 = m0.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    def fwd0(xx):
        y, _ = m0.apply(v0, xx, train=True, mutable=["batch_stats"])
        return y
    timeit(fwd0, x, label="student fwd(train) no-dropout")

    # --- losses -----------------------------------------------------------
    from cvssl_tpu.ops import losses
    logits = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)

    def sup_loss(lg):
        ce = losses.cross_entropy(lg[:12], lbl[:12])
        dice = losses.dice_loss(lg[:12], lbl[:12], C, softmax=True)
        cons = jnp.mean(losses.softmax_mse_loss(lg[12:], logits[12:]))
        return ce + dice + cons
    timeit(sup_loss, logits, label="losses (ce+dice+mse)")

    # --- optimizer + EMA ---------------------------------------------------
    import optax
    from cvssl_tpu.ops.ema import ema_update
    tx = optax.sgd(0.01, momentum=0.9)
    opt_state = tx.init(params)

    def opt_step(g):
        up, _ = tx.update(g, opt_state, params)
        newp = optax.apply_updates(params, up)
        teach = ema_update(params, newp, 0.99)
        return jax.tree_util.tree_leaves(teach)[0]
    timeit(opt_step, params, label="sgd update + EMA")


if __name__ == "__main__":
    main()
