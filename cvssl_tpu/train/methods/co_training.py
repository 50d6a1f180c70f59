"""Deep co-training via rotation consistency —
``train_deep_co_training_2D.py`` / ``_ViT``: one model, a rot90(k) view of the
unlabeled batch, symmetric detached MSE (``:142-157``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cvssl_tpu.ops import losses
from cvssl_tpu.train.methods.base import Method, register_method, split_batch


@register_method("deep_co_training")
class DeepCoTraining(Method):
    def loss(self, ctx, batch):
        cfg = self.cfg
        lb = cfg.labeled_bs
        _, label, unlabeled_img = split_batch(cfg, batch)

        outputs = self.primary_logits(ctx.forward("model", batch["image"]))
        outputs_soft = jax.nn.softmax(outputs.astype(jnp.float32), axis=-1)

        # random k in {0..3}, spatial axes (1, 2) in NHWC; one k per step as
        # in the reference (random.randrange per iteration).
        k = jax.random.randint(ctx.next_rng(), (), 0, 4)
        rotated = jax.lax.switch(
            k, [lambda x: x,
                lambda x: jnp.rot90(x, 1, (1, 2)),
                lambda x: jnp.rot90(x, 2, (1, 2)),
                lambda x: jnp.rot90(x, 3, (1, 2))], unlabeled_img)
        rot_out = self.primary_logits(ctx.forward("model", rotated))
        rot_soft = jax.nn.softmax(rot_out.astype(jnp.float32), axis=-1)

        unl_soft_rot = jax.lax.switch(
            k, [lambda x: x,
                lambda x: jnp.rot90(x, 1, (1, 2)),
                lambda x: jnp.rot90(x, 2, (1, 2)),
                lambda x: jnp.rot90(x, 3, (1, 2))], outputs_soft[lb:])

        ce, dice = self.sup_ce_dice(outputs[:lb], label)
        sup = 0.5 * (ce + dice)

        w = ctx.consistency_weight()
        sg = jax.lax.stop_gradient
        cons = 0.5 * (jnp.mean((sg(rot_soft) - unl_soft_rot) ** 2) +
                      jnp.mean((rot_soft - sg(unl_soft_rot)) ** 2))
        total = sup + w * cons
        return total, {"loss": total, "loss_ce": ce, "loss_dice": dice,
                       "consistency_loss": cons, "consistency_weight": w}
