"""Pallas pixel-packed 3x3 convolution for small channel counts.

Why: XLA's conv on TPU pads the channel axis to 128 lanes, so the UNet's
high-resolution low-channel convs (256^2 at C=16) run ~8x over their memory
bound (~1.9 TF/s measured). This kernel packs P=8 adjacent pixels' channels
into one 128-lane vector and applies the 3x3xCxC kernel as NINE banded
128x128 matmuls per row — the image tile stays in VMEM, so the nine taps
read HBM once.

Status (fetch-forced timings at 24x256^2xC16 vs XLA's 4.3 ms):
* ``conv3x3_p8``     — shifted-view inputs, auto-pipelined: 3.6 ms (1.2x);
* ``conv3x3_p8_dma`` — in-kernel halo DMA, input read once: 3.0 ms (1.4x);
* ``conv3x3_p8_db``  — + double buffering: 3.0 ms (no further gain);
matching XLA's conv to rel 2e-7.

RESOLVED (round 2) — the "bf16 boundary anomaly": round 1 observed that
passing bf16 ARRAYS measured 2.6 ms with BIT-IDENTICAL output to the f32
run and flagged it impossible. Measured explanation: ``jnp.dot`` at
DEFAULT precision lowers to a SINGLE bf16 MXU pass even for f32 operands —
the operands were being rounded to bf16 all along (kernel vs
Precision.HIGHEST XLA conv: rel 2.2e-3; vs default-precision XLA conv,
which does the same single-pass bf16: rel 2.3e-7). Feeding bf16 arrays
therefore changes nothing numerically and just halves HBM traffic
(3.0 -> 2.6 ms). Round 1's "floor is MXU f32 passes" diagnosis was wrong:
it was bf16-product/f32-accumulate throughput + bandwidth.
Pinned by tests/test_pallas_conv.py::TestBf16Boundary.

SUPERSEDED for production: the space-to-depth reformulation
(``ops/s2d.py``, 1.1 ms bf16 for this conv) beats every variant here and
is what the models use; this kernel stays as the in-kernel-DMA/banded-
matmul reference implementation.

Layout: x (B, H, W, C) with C*P == 128. Each grid step processes one image:
block (1, H+2, (W+2P)*C) resident in VMEM; out (1, H, W*C).

out[h, g] = sum_{dh in 0..2, G in -1..1} x[h+dh, g+G] @ M[dh, G]
where M[dh, G][(u, ci), (v, co)] = k[dh, dw, ci, co] iff v = u + dw - 1 + 8G
(u, v pixel offsets inside a group). The banded matrices are built from the
conv weights inside the jit (weights stay trainable).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 8  # pixels per 128-lane group


def build_banded_mats(k: jnp.ndarray):
    """k (3, 3, C, Co) -> {(dh, G): (P*C, P*Co)} banded matrices (traced;
    each (u, v) slot is written at most once per (dh, G))."""
    c, co = k.shape[2], k.shape[3]
    mats = {}
    for dh in range(3):
        for G in (-1, 0, 1):
            m = jnp.zeros((P * c, P * co), k.dtype)
            for dw in range(3):
                for u in range(P):
                    # out pixel v (in group g) reads in pixel u (in group
                    # g+G): 8(g+G)+u == 8g+v+dw-1  =>  v = u - dw + 1 + 8G
                    v = u - (dw - 1) + 8 * G
                    if 0 <= v < P:
                        m = jax.lax.dynamic_update_slice(
                            m, k[dh, dw], (u * c, v * co))
            mats[(dh, G)] = m
    return mats


def _conv_kernel(x0_ref, x1_ref, x2_ref, mats_ref, out_ref, *, th: int,
                 w: int, c: int, co: int):
    """x{0,1,2}_ref: (1, TH, (W+2P)*C) — the three dh-shifted row views;
    mats_ref: (9, PC, PCo); out_ref: (1, TH, W*Co)."""
    g = w // P
    acc = jnp.zeros((th * g, P * co), jnp.float32)
    for dh, ref in enumerate((x0_ref, x1_ref, x2_ref)):
        for gi, G in enumerate((-1, 0, 1)):
            start = (1 + G) * P * c
            a = ref[0, :, start:start + w * c].reshape(th * g, P * c)
            acc = acc + jnp.dot(a, mats_ref[dh * 3 + gi],
                                preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(th, w * co)


def _conv_kernel_dma(x_hbm, mats_ref, out_ref, scratch, sem, *, th: int,
                     w: int, c: int, co: int):
    """Halo rows via manual HBM->VMEM DMA (single input read, no
    materialized shifted views). scratch: (TH+2, (W+2P)*C)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * th, th + 8)], scratch, sem)
    dma.start()
    dma.wait()
    g = w // P
    acc = jnp.zeros((th * g, P * co), jnp.float32)
    for dh in range(3):
        for gi, G in enumerate((-1, 0, 1)):
            start = (1 + G) * P * c
            a = scratch[dh:dh + th, start:start + w * c].reshape(
                th * g, P * c)
            acc = acc + jnp.dot(a, mats_ref[dh * 3 + gi],
                                preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(th, w * co)


@functools.partial(jax.jit, static_argnames=("interpret", "tile_h"))
def conv3x3_p8_dma(x: jnp.ndarray, k: jnp.ndarray, interpret: bool = False,
                   tile_h: int = 32) -> jnp.ndarray:
    """conv3x3_p8 variant with in-kernel halo DMA (input read once)."""
    b, h, w, c = x.shape
    co = k.shape[3]
    assert c * P == 128 and w % P == 0 and h % tile_h == 0, (c, w, h)
    mats = build_banded_mats(k)
    mats_arr = jnp.stack([mats[(dh, G)] for dh in range(3)
                          for G in (-1, 0, 1)])
    # top pad 1 row (halo), bottom pad 7 so every (tile_h + 8)-row DMA chunk
    # stays sublane-aligned (Mosaic requires multiples of 8)
    xp = jnp.pad(x, ((0, 0), (1, 7), (P, P), (0, 0)))
    wc = (w + 2 * P) * c
    xp = xp.reshape(b, h + 8, wc)
    out = pl.pallas_call(
        functools.partial(_conv_kernel_dma, th=tile_h, w=w, c=c, co=co),
        grid=(b, h // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((9, P * c, P * co), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w * co), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w * co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 8, wc), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, mats_arr)
    return out.reshape(b, h, w, co)


def _conv_kernel_db(x_hbm, mats_ref, out_ref, scratch, sems, *, th: int,
                    w: int, c: int, co: int):
    """Double-buffered halo DMA: prefetch row-tile t+1 while computing t."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    def dma(tt, slot):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(tt * th, th + 8)], scratch.at[slot],
            sems.at[slot])

    @pl.when(t == 0)
    def _():
        dma(0, 0).start()

    @pl.when(t + 1 < nt)
    def _():
        dma(t + 1, (t + 1) % 2).start()

    slot = t % 2
    dma(t, slot).wait()

    g = w // P
    acc = jnp.zeros((th * g, P * co), jnp.float32)
    for dh in range(3):
        for gi, G in enumerate((-1, 0, 1)):
            start = (1 + G) * P * c
            a = scratch[slot, dh:dh + th, start:start + w * c].reshape(
                th * g, P * c)
            acc = acc + jnp.dot(a, mats_ref[dh * 3 + gi],
                                preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(th, w * co)


@functools.partial(jax.jit, static_argnames=("interpret", "tile_h"))
def conv3x3_p8_db(x: jnp.ndarray, k: jnp.ndarray, interpret: bool = False,
                  tile_h: int = 32) -> jnp.ndarray:
    """Double-buffered variant of ``conv3x3_p8_dma``."""
    b, h, w, c = x.shape
    co = k.shape[3]
    assert c * P == 128 and w % P == 0 and h % tile_h == 0, (c, w, h)
    mats = build_banded_mats(k)
    mats_arr = jnp.stack([mats[(dh, G)] for dh in range(3)
                          for G in (-1, 0, 1)])
    xp = jnp.pad(x, ((0, 0), (1, 7), (P, P), (0, 0)))
    wc = (w + 2 * P) * c
    xp = xp.reshape(b, h + 8, wc)
    out = pl.pallas_call(
        functools.partial(_conv_kernel_db, th=tile_h, w=w, c=c, co=co),
        grid=(b, h // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((9, P * c, P * co), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w * co), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w * co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 8, wc), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, mats_arr)
    return out.reshape(b, h, w, co)


@functools.partial(jax.jit, static_argnames=("interpret", "tile_h"))
def conv3x3_p8(x: jnp.ndarray, k: jnp.ndarray, interpret: bool = False,
               tile_h: int = 32) -> jnp.ndarray:
    """SAME 3x3 stride-1 conv, NHWC, C*8 == 128 (i.e. C == 16).
    x (B, H, W, C) f32; k (3, 3, C, Co) with Co == C. Returns (B, H, W, Co).
    """
    b, h, w, c = x.shape
    co = k.shape[3]
    assert c * P == 128 and w % P == 0 and h % tile_h == 0, (c, w, h)

    mats = build_banded_mats(k)
    mats_arr = jnp.stack([mats[(dh, G)] for dh in range(3)
                          for G in (-1, 0, 1)])

    # pad H by 1 row each side; pad W by P pixels each side (group halo)
    xp = jnp.pad(x, ((0, 0), (1, 1), (P, P), (0, 0)))
    xp = xp.reshape(b, h + 2, (w + 2 * P) * c)
    wc = (w + 2 * P) * c
    # three dh-shifted views (materialized; 3x input HBM traffic, still
    # far cheaper than lane-padded conv traffic)
    x0, x1, x2 = xp[:, 0:h], xp[:, 1:h + 1], xp[:, 2:h + 2]

    view_spec = pl.BlockSpec((1, tile_h, wc), lambda i, t: (i, t, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_conv_kernel, th=tile_h, w=w, c=c, co=co),
        grid=(b, h // tile_h),
        in_specs=[view_spec, view_spec, view_spec,
                  pl.BlockSpec((9, P * c, P * co), lambda i, t: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tile_h, w * co), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w * co), jnp.float32),
        interpret=interpret,
    )(x0, x1, x2, mats_arr)
    return out.reshape(b, h, w, co)
