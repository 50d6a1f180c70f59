"""TPU probe: window-attention layout variants (round-4 VERDICT item 5).

The cross-teaching device census (scripts/trace_census.py on the
2026_08_19_02_12 trace) shows 21 of 56 ms/step in copy/reshape — the
window partition/reverse transposes and the qkv 5D transpose, not the
attention math. A/B variants at the swin-tiny stage shapes, fwd+bwd,
scan-amortized within one process:

V0 current: partition -> (b_, n, 3, h, d).transpose(2,0,3,1,4) -> einsums
V1 no-qkv-transpose: same partition, but q/k/v stay (b_, n, h, d) and the
   attention einsums carry the head axis in place ('bnhd,bmhd->bhnm').
V2 transpose-free windows: x stays (B, hb, ws, wb, ws, C); qkv Dense on
   the 6D view; attention via einsum with (B, hb, wb) batch axes — no
   window_partition / window_reverse copies at all.
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timeit(fn, args, iters=30, label=""):
    @jax.jit
    def run(args):
        def body(c, _):
            out = fn(*jax.tree_util.tree_map(
                lambda t: t + (c * 1e-30).astype(t.dtype), args))
            tot = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree_util.tree_leaves(out))
            return c + tot * 1e-30, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(run(args))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(args))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{label:58s} {best*1e3:8.3f} ms", flush=True)
    return best


def partition(x, ws):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def reverse(wins, ws, h, w):
    c = wins.shape[-1]
    b = wins.shape[0] // (h * w // ws // ws)
    x = wins.reshape(b, h // ws, w // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def v0(x, wqkv, wproj, bias, ws, heads):
    b, h, w, c = x.shape
    hd = c // heads
    wins = partition(x, ws)                      # (b_, n, c)
    b_, n, _ = wins.shape
    qkv = wins @ wqkv                            # (b_, n, 3c)
    qkv = qkv.reshape(b_, n, 3, heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) + bias
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b_, n, c) @ wproj
    return reverse(out, ws, h, w)


def v1(x, wqkv, wproj, bias, ws, heads):
    b, h, w, c = x.shape
    hd = c // heads
    wins = partition(x, ws)
    b_, n, _ = wins.shape
    qkv = (wins @ wqkv).reshape(b_, n, 3, heads, hd)
    q, k, v = qkv[:, :, 0] * hd ** -0.5, qkv[:, :, 1], qkv[:, :, 2]
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32) + bias
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b_, n, c)
    return reverse(out @ wproj, ws, h, w)


def v2(x, wqkv, wproj, bias, ws, heads):
    b, h, w, c = x.shape
    hd = c // heads
    hb, wb = h // ws, w // ws
    xg = x.reshape(b, hb, ws, wb, ws, c)         # free reshape, no copy
    qkv = jnp.einsum("bpiqjc,cz->bpiqjz", xg, wqkv)
    qkv = qkv.reshape(b, hb, ws, wb, ws, 3, heads, hd)
    q = qkv[..., 0, :, :] * hd ** -0.5
    k = qkv[..., 1, :, :]
    v = qkv[..., 2, :, :]
    # batch (b, p, q_), free (i, j) x (k_, l), contract d per head
    attn = jnp.einsum("bpiqjhd,bpkqlhd->bpqhijkl", q, k)
    attn = attn.reshape(b, hb, wb, heads, ws * ws, ws * ws)
    attn = attn.astype(jnp.float32) + bias
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    attn = attn.reshape(b, hb, wb, heads, ws, ws, ws, ws)
    out = jnp.einsum("bpqhijkl,bpkqlhd->bpiqjhd", attn, v)
    out = out.reshape(b, hb, ws, wb, ws, c)
    out = jnp.einsum("bpiqjc,cz->bpiqjz", out, wproj)
    return out.reshape(b, h, w, c)


def main():
    rng = np.random.default_rng(0)
    ws = 7
    for (B, H, C, heads) in ((16, 56, 96, 3), (16, 28, 192, 6),
                             (16, 14, 384, 12)):
        print(f"--- stage B={B} {H}x{H} C={C} heads={heads} ---",
              flush=True)
        for dt in (jnp.float32, jnp.bfloat16):
            x = jnp.asarray(rng.normal(size=(B, H, H, C)), dt)
            wqkv = jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.02, dt)
            wproj = jnp.asarray(rng.normal(size=(C, C)) * 0.02, dt)
            n = ws * ws
            bias0 = jnp.asarray(rng.normal(size=(heads, n, n)) * 0.02,
                                jnp.float32)
            tag = "bf16" if dt == jnp.bfloat16 else "f32 "
            for name, fn, bias in (
                    ("v0 current", v0, bias0[None]),
                    ("v1 no-qkv-transpose", v1, bias0[None]),
                    ("v2 transpose-free", v2, bias0[None, None, None]),
            ):
                f = functools.partial(fn, ws=ws, heads=heads)

                def fwd(x, wqkv, wproj, bias):
                    return f(x, wqkv, wproj, bias)

                def fwdbwd(x, wqkv, wproj, bias):
                    def loss(args):
                        return jnp.sum(f(*args, bias).astype(jnp.float32)
                                       ** 2)
                    l, g = jax.value_and_grad(loss)((x, wqkv, wproj))
                    return l, g
                timeit(fwd, (x, wqkv, wproj, bias), label=f"{tag} {name} fwd")
                timeit(fwdbwd, (x, wqkv, wproj, bias),
                       label=f"{tag} {name} fwd+bwd")


if __name__ == "__main__":
    main()
