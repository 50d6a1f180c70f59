"""Uncertainty-rectified pyramid consistency (URPC) on ``unet_urpc``.

The reference repo ships the UNet_URPC model (``unet.py:352-370``) without a
trainer script; this implements the SSL4MIS ``train_urpc_2D`` strategy:
supervised CE+Dice at every scale, and on unlabeled data an
uncertainty-rectified consistency — each scale's softmax pulled toward the
scale-average, weighted by exp(-KL(scale || average)) plus the KL itself.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cvssl_tpu.ops import losses
from cvssl_tpu.train.methods.base import Method, register_method


@register_method("urpc")
class URPC(Method):
    def build_models(self):
        return {"model": self._factory("unet_urpc")}

    def loss(self, ctx, batch):
        cfg = self.cfg
        lb = cfg.labeled_bs
        label = batch["label"][:lb]

        outs = ctx.forward("model", batch["image"])
        softs = [jax.nn.softmax(o.astype(jnp.float32), axis=-1) for o in outs]

        sup = 0.0
        for o in outs:
            sup = sup + 0.5 * sum(self.sup_ce_dice(o[:lb], label))
        sup = sup / len(outs)

        avg = jax.lax.stop_gradient(
            sum(s[lb:] for s in softs) / len(softs))
        cons = 0.0
        for s in softs:
            su = s[lb:]
            kl = jnp.sum(su * jnp.log((su + 1e-8) / (avg + 1e-8)), axis=-1,
                         keepdims=True)
            mse = (su - avg) ** 2
            rect = jnp.mean(mse * jnp.exp(-kl)) + jnp.mean(kl)
            cons = cons + rect
        cons = cons / len(softs)

        w = ctx.consistency_weight()
        total = sup + w * cons
        return total, {"loss": total, "sup_loss": sup,
                       "consistency_loss": cons, "consistency_weight": w}
