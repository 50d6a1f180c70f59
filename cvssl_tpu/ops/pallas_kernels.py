"""Pallas TPU kernels for hot ops.

The reference has no custom kernels (pure torch/cuDNN); here the hottest
non-conv op — the supervised Dice+CE loss over (B, H, W, C) logits — is fused
into ONE pass over HBM. The stock implementation reads the logits tensor
several times (softmax, log-softmax, one-hot products, three dice sums);
this kernel computes all reductions (CE sum, per-class intersect / pred² /
label counts) in a single tiled sweep, accumulating partials in VMEM.

Numerics match ``ops.losses.dice_ce_loss`` exactly (same smooth=1e-5,
mean-over-pixels CE, per-class squared-sum dice averaged over classes).

Falls back to the jnp implementation on non-TPU backends.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cvssl_tpu.ops import losses as _losses

_LANE = 128


def _fused_reduction_kernel(logits_ref, labels_ref, ce_ref, inter_ref,
                            psq_ref, lab_ref, num_classes: int):
    """Grid over column-tiles of the class-major layout. logits: (C, TILE);
    labels: (1, TILE) int32 — spatial sites ride the 128-wide lanes.
    Accumulates: ce_ref (1,1) = sum of -log softmax[label];
    inter/psq/lab (C, 1) per-class dice partials."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ce_ref[0, 0] = 0.0
        inter_ref[:] = jnp.zeros_like(inter_ref)
        psq_ref[:] = jnp.zeros_like(psq_ref)
        lab_ref[:] = jnp.zeros_like(lab_ref)

    logits = logits_ref[:].astype(jnp.float32)  # (C, TILE)
    labels = labels_ref[:]                      # (1, TILE)
    m = jnp.max(logits, axis=0, keepdims=True)
    ex = jnp.exp(logits - m)
    denom = jnp.sum(ex, axis=0, keepdims=True)
    probs = ex / denom
    logp = (logits - m) - jnp.log(denom)

    onehot = (labels == jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
              ).astype(jnp.float32)
    ce_ref[0, 0] += jnp.sum(-logp * onehot)
    inter_ref[:] += jnp.sum(probs * onehot, axis=1, keepdims=True)
    psq_ref[:] += jnp.sum(probs * probs, axis=1, keepdims=True)
    lab_ref[:] += jnp.sum(onehot, axis=1, keepdims=True)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("num_classes", "interpret"))
def fused_ce_dice_tpu(logits: jnp.ndarray, labels: jnp.ndarray,
                      num_classes: int, interpret: bool = False):
    """Pallas path. logits (..., C) float; labels (...) int.
    Returns (ce_mean, dice_mean) — one HBM sweep for both reductions."""
    c = logits.shape[-1]
    n = int(logits.size // c)
    # class-major layout: (C, N) with spatial sites on the lane axis
    flat_logits = logits.reshape(n, c).T
    flat_labels = labels.reshape(1, n).astype(jnp.int32)

    tile = 8 * _LANE * 8  # 8192 sites per grid step
    n_pad = _round_up(n, tile)
    if n_pad != n:
        flat_logits = jnp.pad(flat_logits, ((0, 0), (0, n_pad - n)))
        # padded label -1 matches no class -> zero one-hot column
        flat_labels = jnp.pad(flat_labels, ((0, 0), (0, n_pad - n)),
                              constant_values=-1)
    grid = n_pad // tile

    ce, inter, psq, lab = pl.pallas_call(
        functools.partial(_fused_reduction_kernel, num_classes=c),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((c, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((c, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
        ],
        interpret=interpret,
    )(flat_logits, flat_labels)

    ce_mean = ce[0, 0] / n
    smooth = 1e-5
    # psq accumulated over padded sites too: padded logits are all-zero ->
    # uniform softmax contributes (1/c)^2 per class; subtract that.
    pad_sites = n_pad - n
    psq_corr = psq[:, 0] - pad_sites * (1.0 / c) ** 2
    dice = 1.0 - (2.0 * inter[:, 0] + smooth) / (psq_corr + lab[:, 0] + smooth)
    dice_mean = jnp.sum(dice) / c
    return ce_mean, dice_mean


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused_ce_dice(logits, labels, num_classes):
    return fused_ce_dice_tpu(logits, labels, num_classes)


def _fused_fwd(logits, labels, num_classes):
    # forward via the Pallas kernel; residuals for the closed-form backward
    out = fused_ce_dice_tpu(logits, labels, num_classes)
    return out, (logits, labels)


def _fused_bwd(num_classes, residuals, g):
    """Closed-form gradient of (CE_mean, Dice_mean) w.r.t. logits, combined
    with the incoming cotangents g = (g_ce, g_dice) — so callers may weight
    the two terms however they like (0.5/0.5 is the canonical sup loss).

    CE part: (softmax - onehot) / n.
    Dice part per class c (I = sum p*y, P = sum p^2, L = sum y, s = 1e-5):
      d loss_c / d p = (-2*y + 2*p*(2I+s)/(P+L+s)) / (P+L+s), then the
      softmax Jacobian p_k (g_k - sum_c g_c p_c), averaged over classes.
    """
    logits, labels = residuals
    g_ce, g_dice = g
    c = logits.shape[-1]
    n = logits.size // c
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(labels, c, dtype=jnp.float32)
    smooth = 1e-5
    axes = tuple(range(logits.ndim - 1))
    inter = jnp.sum(probs * onehot, axis=axes)
    psq = jnp.sum(probs * probs, axis=axes)
    lab = jnp.sum(onehot, axis=axes)
    denom = psq + lab + smooth
    # d dice_c / d p_{rc}
    gp = (-2.0 * onehot + 2.0 * probs * ((2.0 * inter + smooth) /
                                         denom)) / denom
    gp = gp / c  # mean over classes
    # softmax jacobian
    dz_dice = probs * (gp - jnp.sum(gp * probs, axis=-1, keepdims=True))
    dz_ce = (probs - onehot) / n
    grad = g_ce * dz_ce + g_dice * dz_dice
    return grad.astype(logits.dtype), None


_fused_ce_dice.defvjp(_fused_fwd, _fused_bwd)


def fused_ce_dice(logits, labels, num_classes):
    """(ce, dice) pair — Pallas with custom VJP on TPU, jnp elsewhere."""
    if jax.default_backend() == "tpu":
        return _fused_ce_dice(logits, labels, num_classes)
    return (_losses.cross_entropy(logits, labels),
            _losses.dice_loss(logits, labels, num_classes, softmax=True))


def fused_dice_ce_loss(logits, labels, num_classes):
    """0.5*(ce+dice) via the fused pair (back-compat entry point)."""
    ce, dice = fused_ce_dice(logits, labels, num_classes)
    return 0.5 * (ce + dice)
