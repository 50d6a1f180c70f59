"""TPU probe: can space-to-depth + bf16 lift the lane-padding-bound
high-res UNet convs? (VERDICT round-2 item #1)

Measures, fetch-forced, per-application time of a 3x3 SAME conv:
  A. native NHWC at 256^2/C16 and 128^2/C32 (the round-1 hot spots), f32+bf16
  B. the exact s2d(2) reformulation: 3x3 conv at 128^2/C64 and 64^2/C128
     (4x FLOPs, but channels fill the 128-lane axis), f32+bf16

Run on the real chip: python scripts/probe_s2d.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(conv, x, iters=50):
    @jax.jit
    def run(x):
        def body(c, _):
            return conv(c), ()
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(c[:1, :1, :1, :1].astype(jnp.float32))

    float(run(x))  # compile + warm
    t0 = time.perf_counter()
    float(run(x))  # fetch-forced sync
    return (time.perf_counter() - t0) / iters


def conv3x3(k, out_dtype):
    def f(x):
        y = jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return y.astype(out_dtype)
    return f


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    cases = [
        # label, (B,H,W,C), Co
        ("native 256^2 C16", (24, 256, 256, 16), 16),
        ("native 128^2 C32", (24, 128, 128, 32), 32),
        ("s2d    128^2 C64 (repr 256^2 C16)", (24, 128, 128, 64), 64),
        ("s2d    64^2  C128 (repr 128^2 C32)", (24, 64, 64, 128), 128),
        ("native 64^2  C64", (24, 64, 64, 64), 64),
    ]
    for dtype in (jnp.float32, jnp.bfloat16):
        for label, shape, co in cases:
            x = jnp.asarray(rng.normal(size=shape), dtype)
            k = jnp.asarray(rng.normal(size=(3, 3, shape[-1], co)) * 0.1,
                            dtype)
            dt = bench(conv3x3(k, dtype), x)
            flops = 2 * np.prod(shape) * 9 * co
            print(f"{dtype.__name__:9s} {label:36s} {dt*1e3:7.2f} ms "
                  f"{flops/dt/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
