"""Cross-consistency training (CCT) on ``unet_cct``.

The reference repo ships the UNet_CCT model (``unet.py:324-349``) without a
trainer script; this method implements the standard SSL4MIS ``train_cct_2D``
strategy the model was built for: supervised CE+Dice on the main AND aux
decoder outputs, MSE consistency between each perturbed aux decoder and the
(detached) main decoder on unlabeled data.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cvssl_tpu.ops import losses
from cvssl_tpu.train.methods.base import Method, register_method


@register_method("cct")
class CrossConsistencyTraining(Method):
    def build_models(self):
        return {"model": self._factory("unet_cct")}

    def loss(self, ctx, batch):
        cfg = self.cfg
        lb = cfg.labeled_bs
        label = batch["label"][:lb]

        main, aux1, aux2, aux3 = ctx.forward("model", batch["image"])
        soft_main = jax.nn.softmax(main.astype(jnp.float32), axis=-1)

        sup = 0.0
        for out in (main, aux1, aux2, aux3):
            sup = sup + 0.5 * sum(self.sup_ce_dice(out[:lb], label))

        target = jax.lax.stop_gradient(soft_main[lb:])
        cons = 0.0
        for out in (aux1, aux2, aux3):
            soft = jax.nn.softmax(out.astype(jnp.float32), axis=-1)
            cons = cons + jnp.mean((soft[lb:] - target) ** 2)
        cons = cons / 3.0

        w = ctx.consistency_weight()
        total = sup + w * cons
        return total, {"loss": total, "sup_loss": sup,
                       "consistency_loss": cons, "consistency_weight": w}
