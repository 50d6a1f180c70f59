"""Cross pseudo supervision — ``train_cross_pseudo_supervision_2D.py`` /
``_2D_ViT`` / ``_3D``: two students supervise each other's unlabeled argmax."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cvssl_tpu.ops import losses
from cvssl_tpu.train.methods.base import Method, register_method


@register_method("cps")
class CrossPseudoSupervision(Method):
    """2D reference: both models are --model; pseudo-supervision is CE
    (``train_cross_pseudo_supervision_2D.py:189-193``). The 3D variant is
    identical modulo the factory (different random init per model — the
    reference uses kaiming vs xavier for diversity, we use different RNG
    draws)."""

    model_names = ("model1", "model2")

    def build_models(self):
        return {"model1": self._factory(self.cfg.model),
                "model2": self._factory(self.cfg.model)}

    def _pseudo_ce(self, logits_unl, pseudo):
        return losses.cross_entropy(logits_unl, pseudo)

    def loss(self, ctx, batch):
        cfg = self.cfg
        lb = cfg.labeled_bs
        label = batch["label"][:lb]

        out1 = self.primary_logits(ctx.forward("model1", batch["image"]))
        out2 = self.primary_logits(ctx.forward("model2", batch["image"]))
        soft1 = jax.nn.softmax(out1.astype(jnp.float32), axis=-1)
        soft2 = jax.nn.softmax(out2.astype(jnp.float32), axis=-1)

        loss1 = 0.5 * sum(self.sup_ce_dice(out1[:lb], label))
        loss2 = 0.5 * sum(self.sup_ce_dice(out2[:lb], label))

        pseudo1 = jnp.argmax(jax.lax.stop_gradient(soft1[lb:]), axis=-1)
        pseudo2 = jnp.argmax(jax.lax.stop_gradient(soft2[lb:]), axis=-1)

        w = ctx.consistency_weight()
        ps1 = self._pseudo_ce(out1[lb:], pseudo2)
        ps2 = self._pseudo_ce(out2[lb:], pseudo1)

        model1_loss = loss1 + w * ps1
        model2_loss = loss2 + w * ps2
        total = model1_loss + model2_loss
        return total, {"loss": total, "model1_loss": model1_loss,
                       "model2_loss": model2_loss, "consistency_weight": w}
