"""Adversarial consistency (ViT) — ``train_adversarial_consistency_ViT_2D.py``:
ICT mixing + DAN; student sees [labeled, mixed] (``:218-224``);
loss = 1.5*(2*dice + ce) + w*(ict_mse + 0.5*dan_ce) (``:243-247``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cvssl_tpu.ops import losses
from cvssl_tpu.train.methods.adversarial import AdversarialNetwork
from cvssl_tpu.train.methods.base import register_method


@register_method("adversarial_consistency")
class AdversarialConsistency(AdversarialNetwork):
    model_names = ("model", "dan")
    teacher_names = ("model",)
    adversarial_models = ("dan",)

    def loss(self, ctx, batch):
        cfg = self.cfg
        lb = cfg.labeled_bs
        label = batch["label"][:lb]
        labeled_img = batch["image"][:lb]
        unlabeled = batch["image"][lb:]
        half = unlabeled.shape[0] // 2
        u0, u1 = unlabeled[:half], unlabeled[half:2 * half]

        mix = jax.random.beta(ctx.next_rng(), cfg.ict_alpha, cfg.ict_alpha,
                              (half,) + (1,) * (unlabeled.ndim - 1))
        mixed = u0 * (1.0 - mix) + u1 * mix
        inputs = jnp.concatenate([labeled_img, mixed], axis=0)

        outputs = self.primary_logits(ctx.forward("model", inputs))
        soft = jax.nn.softmax(outputs.astype(jnp.float32), axis=-1)
        ema0 = jax.nn.softmax(self.primary_logits(
            ctx.forward_teacher("model", u0)).astype(jnp.float32), axis=-1)
        ema1 = jax.nn.softmax(self.primary_logits(
            ctx.forward_teacher("model", u1)).astype(jnp.float32), axis=-1)
        pred_mixed = ema0 * (1.0 - mix) + ema1 * mix

        ce, dice = self.sup_ce_dice(outputs[:lb], label)
        sup = 2.0 * dice + ce

        w = ctx.consistency_weight()
        cons_ict = jnp.mean((soft[lb:] - pred_mixed) ** 2)
        # reference quirk (:241): DAN sees outputs from row lb//2 on, paired
        # with the unlabeled images — 6 labeled rows + the mixed rows.
        dan_out = ctx.forward("dan", soft[lb // 2:],
                              extra_args=(unlabeled[:soft.shape[0] - lb // 2],),
                              train=False)
        target = jnp.ones((dan_out.shape[0],), jnp.int32)
        cons_dan = losses.cross_entropy(dan_out, target)

        total = 1.5 * sup + w * (cons_ict + 0.5 * cons_dan)
        return total, {"loss": total, "loss_ce": ce, "loss_dice": dice,
                       "ict_loss": cons_ict, "dan_loss": cons_dan,
                       "consistency_weight": w}

    def loss_d(self, ctx, batch):
        cfg = self.cfg
        # examiner phase sees the REAL batch (labeled + unlabeled, no mixing)
        outputs = self.primary_logits(
            ctx.forward("model", batch["image"], train=False))
        soft = jax.lax.stop_gradient(
            jax.nn.softmax(outputs.astype(jnp.float32), axis=-1))
        dan_out = ctx.forward("dan", soft, extra_args=(batch["image"],),
                              train=True)
        target = jnp.concatenate([
            jnp.ones((cfg.labeled_bs,), jnp.int32),
            jnp.zeros((dan_out.shape[0] - cfg.labeled_bs,), jnp.int32)])
        d_loss = losses.cross_entropy(dan_out, target)
        return d_loss, {"dan_acc": jnp.mean(
            (jnp.argmax(dan_out, -1) == target).astype(jnp.float32))}
