"""Mean teacher — ``train_mean_teacher_2D.py`` / ``_ViT`` / ``_3D``."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cvssl_tpu.ops import losses
from cvssl_tpu.train.methods.base import (Method, register_method,
                                          split_batch)


@register_method("mean_teacher")
class MeanTeacher(Method):
    """Student sees the full batch; the EMA teacher sees the unlabeled half
    plus clamp(0.1*N(0,1), ±0.2) input noise (``train_mean_teacher_2D.py:
    208-216``); consistency = mean softmax-MSE, gated off before iter 1000
    (``:224-228``); loss = sup + w(t)*cons (``:229``)."""

    teacher_names = ("model",)

    def loss(self, ctx, batch):
        cfg = self.cfg
        labeled_img, label, unlabeled_img = split_batch(cfg, batch)

        noise = jnp.clip(
            0.1 * jax.random.normal(ctx.next_rng(), unlabeled_img.shape),
            -0.2, 0.2)
        ema_inputs = unlabeled_img + noise

        outputs = self.primary_logits(ctx.forward("model", batch["image"]))
        ema_logits = self.primary_logits(
            ctx.forward_teacher("model", ema_inputs))

        ce, dice = self.sup_ce_dice(outputs[:cfg.labeled_bs], label)
        sup = 0.5 * (ce + dice)

        cons = jnp.mean(losses.softmax_mse_loss(outputs[cfg.labeled_bs:],
                                                ema_logits))
        cons = jnp.where(ctx.step < 1000, 0.0, cons)
        w = ctx.consistency_weight()
        total = sup + w * cons
        return total, {"loss": total, "loss_ce": ce, "loss_dice": dice,
                       "consistency_loss": cons, "consistency_weight": w}
