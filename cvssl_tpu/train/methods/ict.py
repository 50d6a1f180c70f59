"""Interpolation consistency training —
``train_interpolation_consistency_training_2D.py`` / ``_ViT`` / ``_3D``."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cvssl_tpu.ops import losses
from cvssl_tpu.train.methods.base import Method, register_method, split_batch


@register_method("ict")
class InterpolationConsistency(Method):
    """Mix two unlabeled halves with Beta(alpha, alpha) factors; student sees
    [labeled, mixed]; teacher predictions of the halves are mixed identically;
    MSE between the softmaxes (``:156-188``)."""

    teacher_names = ("model",)

    def loss(self, ctx, batch):
        cfg = self.cfg
        labeled_img, label, unlabeled_img = split_batch(cfg, batch)
        half = unlabeled_img.shape[0] // 2
        u0, u1 = unlabeled_img[:half], unlabeled_img[half:2 * half]

        # Beta(a, a) via two gammas (jax.random.beta)
        mix = jax.random.beta(ctx.next_rng(), cfg.ict_alpha, cfg.ict_alpha,
                              (half,) + (1,) * (unlabeled_img.ndim - 1))
        mixed = u0 * (1.0 - mix) + u1 * mix

        inputs = jnp.concatenate([labeled_img, mixed], axis=0)
        outputs = self.primary_logits(ctx.forward("model", inputs))
        outputs_soft = jax.nn.softmax(outputs.astype(jnp.float32), axis=-1)

        ema0 = jax.nn.softmax(self.primary_logits(
            ctx.forward_teacher("model", u0)).astype(jnp.float32), axis=-1)
        ema1 = jax.nn.softmax(self.primary_logits(
            ctx.forward_teacher("model", u1)).astype(jnp.float32), axis=-1)
        pred_mixed = ema0 * (1.0 - mix) + ema1 * mix

        lb = cfg.labeled_bs
        ce, dice = self.sup_ce_dice(outputs[:lb], label)
        sup = 0.5 * (ce + dice)

        w = ctx.consistency_weight()
        cons = jnp.mean((outputs_soft[lb:] - pred_mixed) ** 2)
        total = sup + w * cons
        return total, {"loss": total, "loss_ce": ce, "loss_dice": dice,
                       "consistency_loss": cons, "consistency_weight": w}
