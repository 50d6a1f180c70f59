"""TPU probe: 3D conv variants for the UNet3D/UAMT path (round-3 of the
lane-padding story, now in 3D). Also times the full UNet3D forward."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, x, iters=10, label=""):
    @jax.jit
    def run(x):
        def body(c, _):
            out = fn(x + c * jnp.float32(1e-30))
            tot = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree_util.tree_leaves(out))
            return tot, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(run(x))
    t0 = time.perf_counter()
    float(run(x))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:44s} {dt*1e3:8.2f} ms")
    return dt


def conv3d(k, out_dtype):
    def f(x):
        y = jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return y.astype(out_dtype)
    return f


def main():
    rng = np.random.default_rng(0)
    cases = [
        ("native 96^3 C16", (4, 96, 96, 96, 16), 16),
        ("native 48x96x96 C32", (4, 48, 96, 96, 32), 32),
        ("s2d2ax 96x48x48 C64  (repr 96^3 C16)", (4, 96, 48, 48, 64), 64),
        ("s2d2ax 48x48x48 C128 (repr 48x96x96 C32)", (4, 48, 48, 48, 128),
         128),
        ("native 24x48x48 C64", (4, 24, 48, 48, 64), 64),
    ]
    for dtype in (jnp.float32, jnp.bfloat16):
        for label, shape, co in cases:
            x = jnp.asarray(rng.normal(size=shape), dtype)
            k = jnp.asarray(rng.normal(size=(3, 3, 3, shape[-1], co)) * 0.1,
                            dtype)
            dt = timeit(conv3d(k, dtype), x, label=f"{dtype.__name__} {label}")

    from cvssl_tpu.models.unet3d import UNet3D
    m = UNet3D(in_chns=1, num_classes=2)
    x = jnp.asarray(rng.normal(size=(4, 96, 96, 96, 1)), jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    timeit(lambda xx: m.apply(v, xx, train=False), x, iters=5,
           label="UNet3D fwd(eval) 4x96^3 f32")


if __name__ == "__main__":
    main()
