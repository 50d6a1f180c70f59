"""Segmentation + SSL loss library (JAX).

Behavioral parity with the reference loss library ``code/utils/losses.py``
(ziyangwang007/CV-SSL-MIS); each function's docstring cites the reference
symbol it mirrors. Conventions differ where TPU-nativeness demands it:

* Class axis defaults to ``-1`` (NHWC / NDHWC layouts). The reference uses
  torch dim=1 (NCHW). All functions take an ``axis`` argument.
* Everything is a pure function of arrays — no nn.Module state. Stateful
  losses (MoCo queues) take and return explicit state pytrees.
* ``stop_gradient`` replaces ``.detach()``.

All reductions and smoothing constants (1e-5 smooth, 1e-6 entropy eps,
temperature 0.07) match the reference exactly.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Dice family
# ---------------------------------------------------------------------------

def dice_loss_binary(score: jnp.ndarray, target: jnp.ndarray,
                     smooth: float = 1e-5) -> jnp.ndarray:
    """Global soft dice with squared sums. Mirrors ``losses.py:17`` (dice_loss).

    ``1 - (2*sum(s*t) + eps) / (sum(s*s) + sum(t*t) + eps)`` over ALL elements
    (batch included), matching the reference's global-sum behavior.
    """
    target = target.astype(jnp.float32)
    score = score.astype(jnp.float32)
    intersect = jnp.sum(score * target)
    y_sum = jnp.sum(target * target)
    z_sum = jnp.sum(score * score)
    return 1.0 - (2.0 * intersect + smooth) / (z_sum + y_sum + smooth)


def dice_loss_binary1(score: jnp.ndarray, target: jnp.ndarray,
                      smooth: float = 1e-5) -> jnp.ndarray:
    """Global soft dice with plain sums. Mirrors ``losses.py:28`` (dice_loss1)."""
    target = target.astype(jnp.float32)
    score = score.astype(jnp.float32)
    intersect = jnp.sum(score * target)
    y_sum = jnp.sum(target)
    z_sum = jnp.sum(score)
    return 1.0 - (2.0 * intersect + smooth) / (z_sum + y_sum + smooth)


def one_hot(labels: jnp.ndarray, num_classes: int, axis: int = -1) -> jnp.ndarray:
    """Integer label map -> one-hot float map (reference ``losses.py:170``)."""
    return jax.nn.one_hot(labels, num_classes, axis=axis, dtype=jnp.float32)


def dice_loss(inputs: jnp.ndarray, target: jnp.ndarray, num_classes: int,
              weight: Sequence[float] | None = None, softmax: bool = False,
              axis: int = -1, smooth: float = 1e-5) -> jnp.ndarray:
    """Multi-class dice loss — the reference's ``DiceLoss`` module
    (``losses.py:165-201``) as a pure function.

    Args:
      inputs: probabilities (or logits if ``softmax=True``), class dim at
        ``axis``.
      target: integer label map with shape == inputs minus the class axis.
      weight: optional per-class weights (reference default: all ones).

    Per class c: squared-sum global dice over the whole batch; result is the
    (weighted) mean over classes — exactly ``loss / n_classes`` as in the
    reference (weights scale per-class terms but the divisor stays
    ``n_classes``, reference ``losses.py:197-201``).
    """
    inputs = inputs.astype(jnp.float32)
    if softmax:
        inputs = jax.nn.softmax(inputs, axis=axis)
    tgt = one_hot(target, num_classes, axis=axis)
    # Reduce every axis EXCEPT the class axis in place — a reduction needs
    # no relayout, whereas moveaxis(class, 0) materializes a transposed
    # copy on TPU (part of the ~1.5 ms/step "loss reshapes" bucket in the
    # device trace). Same sums, same math.
    red = tuple(i for i in range(inputs.ndim) if i != axis % inputs.ndim)
    intersect = jnp.sum(inputs * tgt, axis=red)
    z_sum = jnp.sum(inputs * inputs, axis=red)
    y_sum = jnp.sum(tgt * tgt, axis=red)
    per_class = 1.0 - (2.0 * intersect + smooth) / (z_sum + y_sum + smooth)
    if weight is not None:
        per_class = per_class * jnp.asarray(weight, dtype=jnp.float32)
    return jnp.sum(per_class) / num_classes


def softmax_dice_loss(input_logits: jnp.ndarray, target_logits: jnp.ndarray,
                      axis: int = -1) -> jnp.ndarray:
    """Mean per-class plain-sum dice between two softmaxes; gradients flow to
    ``input_logits`` only. Mirrors ``losses.py:48-65``."""
    n = input_logits.shape[axis]
    input_soft = jax.nn.softmax(input_logits.astype(jnp.float32), axis=axis)
    target_soft = jax.lax.stop_gradient(
        jax.nn.softmax(target_logits.astype(jnp.float32), axis=axis))
    # per-class reduction without the moveaxis transpose (see dice_loss)
    red = tuple(i for i in range(input_soft.ndim)
                if i != axis % input_soft.ndim)
    smooth = 1e-5
    intersect = jnp.sum(input_soft * target_soft, axis=red)
    dice = 1.0 - (2.0 * intersect + smooth) / (
        jnp.sum(input_soft, axis=red) + jnp.sum(target_soft, axis=red)
        + smooth)
    return jnp.sum(dice) / n


# ---------------------------------------------------------------------------
# Cross entropy (torch nn.CrossEntropyLoss parity)
# ---------------------------------------------------------------------------

def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  axis: int = -1) -> jnp.ndarray:
    """Mean softmax cross entropy with integer labels — torch
    ``nn.CrossEntropyLoss()`` default (mean over every pixel), as used for the
    supervised loss in every reference trainer
    (e.g. ``train_fully_supervised_2D.py:93,112``)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=axis)
    lab = one_hot(labels, logits.shape[axis], axis=axis)
    return -jnp.mean(jnp.sum(logp * lab, axis=axis))


def ce_dice(logits: jnp.ndarray, labels: jnp.ndarray, num_classes: int,
            fused: bool = False):
    """(cross_entropy, dice) pair — the supervised-loss ingredients every
    reference trainer computes (``train_fully_supervised_2D.py:112-114``).
    ``fused=True`` (cfg.fused_loss) takes the Pallas single-HBM-sweep kernel
    on TPU (class axis must be last); identical numerics either way.

    2D-shaped logits only (ndim <= 4): at 3D shapes the kernel's class-major
    transpose of (B*D*H*W, C) costs more than the fusion saves — UAMT-3D
    measured 346 ms/step unfused vs 364-397 fused (scripts/probe_uamt3d.py,
    scan-amortized), so 5D logits always take the jnp path."""
    if fused and 2 <= logits.ndim <= 4:
        from cvssl_tpu.ops.pallas_kernels import fused_ce_dice
        return fused_ce_dice(logits, labels, num_classes)
    return (cross_entropy(logits, labels),
            dice_loss(logits, labels, num_classes, softmax=True))


def dice_ce_loss(logits: jnp.ndarray, labels: jnp.ndarray, num_classes: int,
                 axis: int = -1) -> jnp.ndarray:
    """The canonical supervised loss ``0.5 * (ce + dice(softmax))`` used by
    all reference trainers (``train_fully_supervised_2D.py:112-114``)."""
    ce = cross_entropy(logits, labels, axis=axis)
    dl = dice_loss(logits, labels, num_classes, softmax=True, axis=axis)
    return 0.5 * (ce + dl)


# ---------------------------------------------------------------------------
# Entropy family
# ---------------------------------------------------------------------------

def entropy_loss(p: jnp.ndarray, num_classes: int = 2,
                 axis: int = -1) -> jnp.ndarray:
    """Mean normalized entropy of a probability map. Mirrors ``losses.py:39``."""
    y1 = -jnp.sum(p * jnp.log(p + 1e-6), axis=axis) / jnp.log(
        jnp.float32(num_classes))
    return jnp.mean(y1)


def entropy_loss_map(p: jnp.ndarray, num_classes: int = 2,
                     axis: int = -1) -> jnp.ndarray:
    """Per-pixel normalized entropy map (keepdims). Mirrors ``losses.py:68``."""
    return -jnp.sum(p * jnp.log(p + 1e-6), axis=axis, keepdims=True) / jnp.log(
        jnp.float32(num_classes))


def entropy_minimization(p: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Un-normalized mean entropy. Mirrors ``losses.py:204``."""
    return jnp.mean(-jnp.sum(p * jnp.log(p + 1e-6), axis=axis))


def entropy_map(p: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Un-normalized per-pixel entropy (keepdims). Mirrors ``losses.py:211``.

    Also the UAMT uncertainty map (``train_uncertainty_aware_mean_teacher_2D.py:175``).
    """
    return -jnp.sum(p * jnp.log(p + 1e-6), axis=axis, keepdims=True)


# ---------------------------------------------------------------------------
# Consistency family
# ---------------------------------------------------------------------------

def softmax_mse_loss(input_logits: jnp.ndarray, target_logits: jnp.ndarray,
                     sigmoid: bool = False, axis: int = -1) -> jnp.ndarray:
    """ELEMENT-WISE (softmax(a) - softmax(b))**2 with NO reduction, gradients
    to inputs only — exactly the reference ``losses.py:74-91`` (trainers apply
    their own masked/mean reduction)."""
    if sigmoid:
        input_soft = jax.nn.sigmoid(input_logits.astype(jnp.float32))
        target_soft = jax.nn.sigmoid(target_logits.astype(jnp.float32))
    else:
        input_soft = jax.nn.softmax(input_logits.astype(jnp.float32), axis=axis)
        target_soft = jax.nn.softmax(target_logits.astype(jnp.float32), axis=axis)
    target_soft = jax.lax.stop_gradient(target_soft)
    return (input_soft - target_soft) ** 2


def _kl_div_elems(log_p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """torch.F.kl_div element contributions: q * (log q - log_p), with the
    xlogy convention 0*log(0) = 0."""
    q_logq = jnp.where(q > 0, q * jnp.log(jnp.where(q > 0, q, 1.0)), 0.0)
    return q_logq - q * log_p


def softmax_kl_loss(input_logits: jnp.ndarray, target_logits: jnp.ndarray,
                    sigmoid: bool = False, axis: int = -1) -> jnp.ndarray:
    """KL(target || input) with torch ``reduction='mean'`` semantics (mean over
    ALL elements, not batchmean). Mirrors ``losses.py:94-113``."""
    if sigmoid:
        input_log = jnp.log(jax.nn.sigmoid(input_logits.astype(jnp.float32)))
        target_soft = jax.nn.sigmoid(target_logits.astype(jnp.float32))
    else:
        input_log = jax.nn.log_softmax(input_logits.astype(jnp.float32), axis=axis)
        target_soft = jax.nn.softmax(target_logits.astype(jnp.float32), axis=axis)
    target_soft = jax.lax.stop_gradient(target_soft)
    return jnp.mean(_kl_div_elems(input_log, target_soft))


def symmetric_mse_loss(input1: jnp.ndarray, input2: jnp.ndarray) -> jnp.ndarray:
    """mean((a-b)^2), gradients to BOTH sides. Mirrors ``losses.py:116``."""
    return jnp.mean((input1 - input2) ** 2)


def compute_kl_loss(p: jnp.ndarray, q: jnp.ndarray,
                    axis: int = -1) -> jnp.ndarray:
    """Bidirectional KL over the class axis, mean of elementwise terms, averaged
    both ways. Mirrors ``losses.py:217-228`` (R-Drop style)."""
    p = p.astype(jnp.float32)
    q = q.astype(jnp.float32)
    p_loss = jnp.mean(_kl_div_elems(jax.nn.log_softmax(p, axis=axis),
                                    jax.nn.softmax(q, axis=axis)))
    q_loss = jnp.mean(_kl_div_elems(jax.nn.log_softmax(q, axis=axis),
                                    jax.nn.softmax(p, axis=axis)))
    return (p_loss + q_loss) / 2.0


# ---------------------------------------------------------------------------
# Focal loss
# ---------------------------------------------------------------------------

def focal_loss(logits: jnp.ndarray, labels: jnp.ndarray, gamma: float = 2.0,
               alpha: Sequence[float] | float | None = None,
               size_average: bool = True, axis: int = -1) -> jnp.ndarray:
    """Focal loss, mirrors the reference ``FocalLoss`` (``losses.py:128-162``):
    ``-(1-pt)^gamma * log pt`` with optional per-class alpha; ``pt`` is treated
    as a constant in the modulating factor (reference uses ``.data.exp()``)."""
    num_classes = logits.shape[axis]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=axis)
    lab = one_hot(labels, num_classes, axis=axis)
    logpt = jnp.sum(logp * lab, axis=axis).reshape(-1)
    pt = jax.lax.stop_gradient(jnp.exp(logpt))
    if alpha is not None:
        if isinstance(alpha, (float, int)):
            alpha_vec = jnp.asarray([alpha, 1.0 - alpha], dtype=jnp.float32)
        else:
            alpha_vec = jnp.asarray(alpha, dtype=jnp.float32)
        at = alpha_vec[labels.reshape(-1)]
        logpt = logpt * at
    loss = -((1.0 - pt) ** gamma) * logpt
    return jnp.mean(loss) if size_average else jnp.sum(loss)


# ---------------------------------------------------------------------------
# Boundary-weighted BCE + IoU (deep co-training family)
# ---------------------------------------------------------------------------

def _avg_pool_2d_same(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Average pool NHWC with stride 1 and torch-style zero 'same' padding
    (count includes padded zeros — matches F.avg_pool2d(..., padding=k//2))."""
    pad = k // 2
    window = (1, k, k, 1)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, (1, 1, 1, 1),
                                   [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    return summed / float(k * k)


def weighted_loss(pred: jnp.ndarray, mask: jnp.ndarray,
                  kernel_size: int = 31) -> jnp.ndarray:
    """Boundary-weighted BCE + weighted IoU (reference ``losses.py:234-244``).

    Args are NHWC probability maps (pred in (0,1)) and binary masks.
    weit = 1 + 5*|avg_pool(mask) - mask|; reductions over spatial dims (H, W).
    """
    pred = pred.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    weit = 1.0 + 5.0 * jnp.abs(_avg_pool_2d_same(mask, kernel_size) - mask)
    eps = 1e-7
    p = jnp.clip(pred, eps, 1.0 - eps)
    wbce = -(mask * jnp.log(p) + (1.0 - mask) * jnp.log(1.0 - p))
    wbce = jnp.sum(weit * wbce, axis=(1, 2)) / jnp.sum(weit, axis=(1, 2))
    inter = jnp.sum(pred * mask * weit, axis=(1, 2))
    union = jnp.sum((pred + mask) * weit, axis=(1, 2))
    wiou = 1.0 - (inter + 1.0) / (union - inter + 1.0)
    return jnp.mean(wbce + wiou)


def loss_sup(logit_s1, logit_s2, labels_s1, labels_s2) -> jnp.ndarray:
    """Sum of weighted losses for two students. Mirrors ``losses.py:256``."""
    return weighted_loss(logit_s1, labels_s1) + weighted_loss(logit_s2, labels_s2)


def loss_diff(u_pred_1: jnp.ndarray, u_pred_2: jnp.ndarray) -> jnp.ndarray:
    """Symmetric cross-pseudo weighted loss (both directions detached targets);
    mirrors ``losses.py:264-276`` (which detaches via .item() — no gradients)."""
    a = weighted_loss(u_pred_1, jax.lax.stop_gradient(u_pred_2))
    b = weighted_loss(u_pred_2, jax.lax.stop_gradient(u_pred_1))
    return jax.lax.stop_gradient(a + b)


# ---------------------------------------------------------------------------
# Contrastive family
# ---------------------------------------------------------------------------

def _l1_normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """torch F.normalize(p=1) — divide by L1 norm clamped to 1e-12."""
    n = jnp.maximum(jnp.sum(jnp.abs(x), axis=axis, keepdims=True), 1e-12)
    return x / n


def _patch_nce(feat_q: jnp.ndarray, feat_k: jnp.ndarray, temperature: float,
               pos_from_dot: bool) -> jnp.ndarray:
    """Shared body of ConLoss / contrastive_loss_sup (``losses.py:283-337,
    479-531``). feat_{q,k}: (B, C, ...) -> patches are flattened spatial sites.

    NOTE (faithful quirk): the reference L1-normalizes features (F.normalize
    p=1), not L2.
    """
    b, c = feat_q.shape[0], feat_q.shape[1]
    q = _l1_normalize(feat_q.reshape(b, c, -1).transpose(0, 2, 1))  # (B,NP,C)
    k = jax.lax.stop_gradient(
        _l1_normalize(feat_k.reshape(b, c, -1).transpose(0, 2, 1)))
    npatches = q.shape[1]
    l_pos = jnp.sum(q * k, axis=-1).reshape(-1, 1)  # (B*NP, 1)
    l_neg = jnp.einsum("bpc,bqc->bpq", q, k)  # (B, NP, NP)
    eye = jnp.eye(npatches, dtype=bool)[None]
    l_neg = jnp.where(eye, -jnp.inf, l_neg).reshape(-1, npatches)
    if not pos_from_dot:
        l_pos = jnp.zeros_like(l_pos)
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / temperature
    # CE with target class 0 (the positive slot).
    return jnp.mean(-jax.nn.log_softmax(logits, axis=-1)[:, 0])


def con_loss(feat_q: jnp.ndarray, feat_k: jnp.ndarray,
             temperature: float = 0.07) -> jnp.ndarray:
    """Patch-NCE for unlabeled features. Mirrors ``ConLoss`` (``losses.py:283``)."""
    return _patch_nce(feat_q, feat_k, temperature, pos_from_dot=True)


def contrastive_loss_sup(feat_q: jnp.ndarray, feat_k: jnp.ndarray,
                         temperature: float = 0.07) -> jnp.ndarray:
    """Supervised patch contrastive loss. The reference defines this twice
    (``losses.py:392`` l_pos=0 and ``losses.py:479`` l_pos=dot); Python keeps
    the SECOND definition, which is what trainers actually run — we mirror it."""
    return _patch_nce(feat_q, feat_k, temperature, pos_from_dot=True)


# ConLoss_queue (losses.py:598) ignores its queue entirely in forward() and
# references an undefined name in __init__ (reference bug, SURVEY §8); its
# effective behavior is ConLoss.
con_loss_queue = con_loss


def info_nce_loss(feats1: jnp.ndarray, feats2: jnp.ndarray,
                  temperature: float = 0.07) -> jnp.ndarray:
    """Cosine-similarity InfoNCE where the positive sits batch//2 away.
    Mirrors ``losses.py:447-477``."""
    f1 = feats1 / jnp.maximum(
        jnp.linalg.norm(feats1, axis=-1, keepdims=True), 1e-8)
    f2 = feats2 / jnp.maximum(
        jnp.linalg.norm(feats2, axis=-1, keepdims=True), 1e-8)
    cos_sim = f1 @ f2.T
    n = cos_sim.shape[0]
    self_mask = jnp.eye(n, dtype=bool)
    cos_sim = jnp.where(self_mask, -9e15, cos_sim)
    pos_mask = jnp.roll(self_mask, shift=n // 2, axis=0)
    cos_sim = cos_sim / temperature
    nll = -jnp.sum(jnp.where(pos_mask, cos_sim, 0.0), axis=-1) + \
        jax.scipy.special.logsumexp(cos_sim, axis=-1)
    return jnp.mean(nll)


class MocoQueue(NamedTuple):
    """Fixed-capacity circular key queue — the TPU-friendly replacement for the
    reference's host-side OrderedDict queue (``MocoLoss``, ``losses.py:533-596``,
    cap 1056). Static shapes keep the loss jittable; staleness-keyed dedup is
    dropped (documented deviation — the dict keying is a research artifact)."""
    keys: jnp.ndarray   # (K, D)
    valid: jnp.ndarray  # (K,) bool
    ptr: jnp.ndarray    # () int32


def moco_queue_init(capacity: int, dim: int) -> MocoQueue:
    return MocoQueue(keys=jnp.zeros((capacity, dim), jnp.float32),
                     valid=jnp.zeros((capacity,), bool),
                     ptr=jnp.zeros((), jnp.int32))


def moco_loss(feat_q: jnp.ndarray, feat_k: jnp.ndarray, queue: MocoQueue,
              temperature: float = 0.07) -> tuple[jnp.ndarray, MocoQueue]:
    """MoCo-style loss with cosine similarities (reference ``losses.py:533``):
    positive = cos(q_i, k_i); negatives = cos(q_i, queue_j) (or current keys
    when the queue is empty). Returns (loss, updated_queue)."""
    b = feat_q.shape[0]
    q = feat_q.reshape(b, -1)
    k = jax.lax.stop_gradient(feat_k.reshape(b, -1))

    def cos(a, bm):
        an = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-8)
        bn = bm / jnp.maximum(jnp.linalg.norm(bm, axis=-1, keepdims=True), 1e-8)
        return an @ bn.T

    l_pos = jnp.sum(
        (q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)) *
        (k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-8)),
        axis=-1, keepdims=True)
    any_valid = jnp.any(queue.valid)
    l_neg_queue = jnp.where(queue.valid[None, :], cos(q, queue.keys), -jnp.inf)
    l_neg_batch = cos(q, k)
    # Pad batch negatives to queue width so both branches share a shape.
    cap = queue.keys.shape[0]
    pad = jnp.full((b, cap - b), -jnp.inf) if cap > b else None
    l_neg_b = jnp.concatenate([l_neg_batch, pad], axis=1) if pad is not None \
        else l_neg_batch[:, :cap]
    l_neg = jnp.where(any_valid, l_neg_queue, l_neg_b)
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / temperature
    loss = jnp.mean(-jax.nn.log_softmax(logits, axis=-1)[:, 0])
    # Enqueue current keys at ptr (circular).
    idx = (queue.ptr + jnp.arange(b)) % cap
    new_keys = queue.keys.at[idx].set(k)
    new_valid = queue.valid.at[idx].set(True)
    new_ptr = (queue.ptr + b) % cap
    return loss, MocoQueue(new_keys, new_valid, new_ptr)
