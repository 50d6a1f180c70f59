"""TPU probe: fast variants of the on-device rotate augmentation.

Baseline (_augment_one): vmapped switch/cond with a 2D advanced-index
gather — measured ~58 ms for batch 24 at 256^2. Variants:
  1. baseline on f32/i32 (current)
  2. gather in storage dtypes (bf16 image / uint8 label), cast after
  3. rotation via flattened 1D take
  4. rotation via precomputed per-angle index table (40 integer angles)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 24, 256, 256


def timeit(fn, x, iters=30, label=""):
    @jax.jit
    def run(x):
        def body(c, _):
            out = fn(jax.tree_util.tree_map(
                lambda t: t + (c * 0).astype(t.dtype), x))
            tot = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree_util.tree_leaves(out))
            return tot, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(run(x))
    t0 = time.perf_counter()
    float(run(x))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:44s} {dt*1e3:8.3f} ms")
    return dt


def rotate_index_table():
    """(40, H*W) int32: flattened source index for each integer angle
    -20..19; -1 marks out-of-bounds (fill 0)."""
    tab = np.zeros((40, H * W), np.int64)
    valid = np.zeros((40, H * W), bool)
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    for a_i, ang in enumerate(range(-20, 20)):
        th = -ang * np.pi / 180.0
        ys = np.cos(th) * (yy - cy) - np.sin(th) * (xx - cx) + cy
        xs = np.sin(th) * (yy - cy) + np.cos(th) * (xx - cx) + cx
        yi, xi = np.round(ys).astype(int), np.round(xs).astype(int)
        v = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yi, xi = np.clip(yi, 0, H - 1), np.clip(xi, 0, W - 1)
        tab[a_i] = (yi * W + xi).ravel()
        valid[a_i] = v.ravel()
    return jnp.asarray(tab, jnp.int32), jnp.asarray(valid)


def main():
    rng = np.random.default_rng(0)
    img_f32 = jnp.asarray(rng.normal(size=(B, H, W)), jnp.float32)
    lab_i32 = jnp.asarray(rng.integers(0, 4, (B, H, W)), jnp.int32)
    img_bf16 = img_f32.astype(jnp.bfloat16)
    lab_u8 = lab_i32.astype(jnp.uint8)
    key = jax.random.PRNGKey(0)

    from cvssl_tpu.data.device_store import _augment_one, _rotate_nearest

    def base(args):
        i, l = args
        rngs = jax.random.split(key, B)
        return jax.vmap(_augment_one)(i, l, rngs)

    timeit(base, (img_f32, lab_i32), label="baseline vmapped f32/i32")
    timeit(base, (img_bf16, lab_u8), label="baseline vmapped bf16/u8")

    def rot_only(args):
        i, l = args
        angs = jax.random.randint(key, (B,), -20, 20).astype(jnp.float32)
        return (jax.vmap(lambda im, a: _rotate_nearest(im, a, False))(i, angs),
                jax.vmap(lambda im, a: _rotate_nearest(im, a, True))(l, angs))

    timeit(rot_only, (img_f32, lab_i32), label="rotate only (2D gather) f32")
    timeit(rot_only, (img_bf16, lab_u8), label="rotate only (2D gather) bf16/u8")

    def rot_flat(args):
        i, l = args
        angs = jax.random.randint(key, (B,), -20, 20).astype(jnp.float32)

        def one(im, a):
            cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
            th = -a * jnp.pi / 180.0
            yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                                  jnp.arange(W, dtype=jnp.float32),
                                  indexing="ij")
            ys = jnp.cos(th) * (yy - cy) - jnp.sin(th) * (xx - cx) + cy
            xs = jnp.sin(th) * (yy - cy) + jnp.cos(th) * (xx - cx) + cx
            yi = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, H - 1)
            xi = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, W - 1)
            valid = (ys >= -0.5) & (ys <= H - 0.5) & (xs >= -0.5) & \
                (xs <= W - 0.5)
            out = jnp.take(im.ravel(), (yi * W + xi).ravel()).reshape(H, W)
            return jnp.where(valid, out, jnp.zeros((), im.dtype))

        return (jax.vmap(one)(i, angs), jax.vmap(one)(l, angs))

    timeit(rot_flat, (img_bf16, lab_u8), label="rotate 1D-take bf16/u8")

    tab, valid = rotate_index_table()

    def rot_table(args):
        i, l = args
        a_idx = jax.random.randint(key, (B,), 0, 40)
        idx = tab[a_idx]          # (B, H*W)
        v = valid[a_idx]

        def one(im, ix, vv):
            out = jnp.take(im.ravel(), ix)
            return jnp.where(vv, out, jnp.zeros((), im.dtype)).reshape(H, W)

        return (jax.vmap(one)(i, idx, v), jax.vmap(one)(l, idx, v))

    timeit(rot_table, (img_bf16, lab_u8), label="rotate angle-table 1D-take bf16/u8")
    timeit(rot_table, (img_f32, lab_i32), label="rotate angle-table 1D-take f32/i32")


if __name__ == "__main__":
    main()
