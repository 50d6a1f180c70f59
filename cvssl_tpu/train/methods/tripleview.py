"""Triple-view — ``train_tripleview_2D(demo).py``: three models (2 CNN + 1
ViT), pairwise CPS among all three (``:290-336``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cvssl_tpu.ops import losses
from cvssl_tpu.train.methods.base import Method, register_method


@register_method("tripleview")
class TripleView(Method):
    model_names = ("model1", "model2", "model3")

    def build_models(self):
        return {"model1": self._factory(self.cfg.model),
                "model2": self._factory(self.cfg.model),
                "model3": self._factory(self.cfg.model2)}

    def loss(self, ctx, batch):
        cfg = self.cfg
        lb = cfg.labeled_bs
        label = batch["label"][:lb]
        w = ctx.consistency_weight()

        outs, softs, sups, pseudos = [], [], [], []
        for name in self.model_names:
            out = self.primary_logits(ctx.forward(name, batch["image"]))
            soft = jax.nn.softmax(out.astype(jnp.float32), axis=-1)
            outs.append(out)
            softs.append(soft)
            sups.append(0.5 * sum(self.sup_ce_dice(out[:lb], label)))
            pseudos.append(jnp.argmax(jax.lax.stop_gradient(soft[lb:]),
                                      axis=-1))

        metrics, total = {}, 0.0
        for i in range(3):
            others = [j for j in range(3) if j != i]
            ps = sum(losses.dice_loss(softs[i][lb:], pseudos[j],
                                      cfg.num_classes) for j in others)
            model_loss = sups[i] + w * ps
            metrics[f"model{i + 1}_loss"] = model_loss
            total = total + model_loss
        metrics["loss"] = total
        metrics["consistency_weight"] = w
        return total, metrics
