"""CNN meets ViT — ``train_cnn_meet_vit_2D.py``: CPS between UNet and
SwinUnet PLUS a mean-teacher branch whose EMA teacher tracks MODEL2
(``:347``); linear ramp on iter//150; pseudo-supervision weighted x7
(``:336-337``); MT consistency gated before iter 1000."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cvssl_tpu.ops import losses, ramps
from cvssl_tpu.train.methods.base import Method, register_method


@register_method("cnn_meet_vit")
class CnnMeetVit(Method):
    model_names = ("model1", "model2")
    teacher_names = ("model2",)

    def build_models(self):
        return {"model1": self._factory(self.cfg.model),
                "model2": self._factory(self.cfg.model2)}

    def loss(self, ctx, batch):
        cfg = self.cfg
        lb = cfg.labeled_bs
        label = batch["label"][:lb]
        unlabeled = batch["image"][lb:]

        noise = jnp.clip(0.1 * jax.random.normal(ctx.next_rng(),
                                                 unlabeled.shape), -0.2, 0.2)
        out1 = self.primary_logits(ctx.forward("model1", batch["image"]))
        out2 = self.primary_logits(ctx.forward("model2", batch["image"]))
        soft1 = jax.nn.softmax(out1.astype(jnp.float32), axis=-1)
        soft2 = jax.nn.softmax(out2.astype(jnp.float32), axis=-1)
        ema_soft = jax.nn.softmax(self.primary_logits(
            ctx.forward_teacher("model2", unlabeled + noise)
        ).astype(jnp.float32), axis=-1)

        loss1 = 0.5 * sum(self.sup_ce_dice(out1[:lb], label))
        loss2 = 0.5 * sum(self.sup_ce_dice(out2[:lb], label))

        pseudo1 = jnp.argmax(jax.lax.stop_gradient(soft1[lb:]), axis=-1)
        pseudo2 = jnp.argmax(jax.lax.stop_gradient(soft2[lb:]), axis=-1)
        ps1 = losses.dice_loss(soft1[lb:], pseudo2, cfg.num_classes)
        ps2 = losses.dice_loss(soft2[lb:], pseudo1, cfg.num_classes)

        t = jnp.floor_divide(ctx.step, 150)
        w = cfg.consistency * ramps.linear_rampup(t, cfg.consistency_rampup)
        cons1 = jnp.where(ctx.step < 1000, 0.0,
                          jnp.mean((soft1[lb:] - ema_soft) ** 2))
        cons2 = jnp.where(ctx.step < 1000, 0.0,
                          jnp.mean((soft2[lb:] - ema_soft) ** 2))

        model1_loss = loss1 + 7 * w * ps1 + w * cons1
        model2_loss = loss2 + 7 * w * ps2 + w * cons2
        total = model1_loss + model2_loss
        return total, {"loss": total, "model1_loss": model1_loss,
                       "model2_loss": model2_loss, "consistency_weight": w}
