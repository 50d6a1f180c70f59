"""Cross teaching between CNN and Transformer — the flagship
``train_cross_teaching_between_cnn_transformer_2D.py``: model1 = CNN (UNet),
model2 = ViT (SwinUnet); Dice pseudo-supervision both ways (``:234-245``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cvssl_tpu.ops import losses
from cvssl_tpu.ops import s2d as s2d_ops
from cvssl_tpu.train.methods.base import Method, register_method


@register_method("cross_teaching")
class CrossTeaching(Method):
    model_names = ("model1", "model2")

    def build_models(self):
        return {"model1": self._factory(self.cfg.model),
                "model2": self._factory(self.cfg.model2)}

    def loss(self, ctx, batch):
        cfg = self.cfg
        lb = cfg.labeled_bs
        label = batch["label"][:lb]

        out1 = self.primary_logits(ctx.forward("model1", batch["image"]))
        out2 = self.primary_logits(ctx.forward("model2", batch["image"]))
        soft1 = jax.nn.softmax(out1.astype(jnp.float32), axis=-1)
        soft2 = jax.nn.softmax(out2.astype(jnp.float32), axis=-1)

        # SwinUnet grouped-logits mode (cfg.swin_s2d_loss_on): out2 is the
        # s2d view (B, H/4, W/4, 16, C) — same pixels re-indexed, so every
        # per-pixel loss below is unchanged; only the LABELS must be
        # re-indexed to match (r=4), and the cross pseudo-labels converted
        # between layouts (cheap int maps instead of full-res logit d2s).
        grouped2 = soft2.ndim == 5
        label2 = s2d_ops.space_to_depth_labels(label, 4) if grouped2 \
            else label

        loss1 = 0.5 * sum(self.sup_ce_dice(out1[:lb], label))
        loss2 = 0.5 * sum(self.sup_ce_dice(out2[:lb], label2))

        pseudo1 = jnp.argmax(jax.lax.stop_gradient(soft1[lb:]), axis=-1)
        pseudo2 = jnp.argmax(jax.lax.stop_gradient(soft2[lb:]), axis=-1)
        pseudo1_for2, pseudo2_for1 = pseudo1, pseudo2
        if grouped2:
            pseudo1_for2 = s2d_ops.space_to_depth_labels(pseudo1, 4)
            pseudo2_for1 = s2d_ops.depth_to_space_labels(pseudo2, 4)

        # Dice pseudo-supervision on the softmax maps (reference :239-243)
        ps1 = losses.dice_loss(soft1[lb:], pseudo2_for1, cfg.num_classes)
        ps2 = losses.dice_loss(soft2[lb:], pseudo1_for2, cfg.num_classes)

        w = ctx.consistency_weight()
        model1_loss = loss1 + w * ps1
        model2_loss = loss2 + w * ps2
        total = model1_loss + model2_loss
        return total, {"loss": total, "model1_loss": model1_loss,
                       "model2_loss": model2_loss, "consistency_weight": w}
