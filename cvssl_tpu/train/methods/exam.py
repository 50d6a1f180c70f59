"""Examiner-student-teacher (3D) — ``train_exam_student_teacher_3D.py``:
mean teacher + DAN 'examiner'; loss = (2*dice + ce) + w*(2*mse + dan)
(``:170-182``); examiner trained on the full batch (``:189-197``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cvssl_tpu.ops import losses
from cvssl_tpu.train.methods.adversarial import AdversarialNetwork
from cvssl_tpu.train.methods.base import register_method


@register_method("exam_student_teacher")
class ExamStudentTeacher(AdversarialNetwork):
    model_names = ("model", "dan")
    teacher_names = ("model",)
    adversarial_models = ("dan",)

    def loss(self, ctx, batch):
        cfg = self.cfg
        lb = cfg.labeled_bs
        label = batch["label"][:lb]
        unlabeled = batch["image"][lb:]

        noise = jnp.clip(0.1 * jax.random.normal(ctx.next_rng(),
                                                 unlabeled.shape), -0.2, 0.2)
        outputs = self.primary_logits(ctx.forward("model", batch["image"]))
        soft = jax.nn.softmax(outputs.astype(jnp.float32), axis=-1)
        ema_soft = jax.nn.softmax(self.primary_logits(
            ctx.forward_teacher("model", unlabeled + noise)
        ).astype(jnp.float32), axis=-1)

        ce, dice = self.sup_ce_dice(outputs[:lb], label)
        sup = 2.0 * dice + ce

        w = ctx.consistency_weight()
        cons_mse = jnp.mean((soft[lb:] - ema_soft) ** 2)

        dan_out = ctx.forward("dan", soft[lb:],
                              extra_args=(batch["image"][lb:],), train=False)
        target = jnp.ones((dan_out.shape[0],), jnp.int32)
        cons_dan = losses.cross_entropy(dan_out, target)

        total = sup + w * (2.0 * cons_mse + cons_dan)
        return total, {"loss": total, "loss_ce": ce, "loss_dice": dice,
                       "consistency_loss": cons_mse, "dan_loss": cons_dan,
                       "consistency_weight": w}
