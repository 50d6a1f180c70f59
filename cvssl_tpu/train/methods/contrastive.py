"""Contrastive cross teaching — ``train_Contrastive_Cross_CNN_2D.py`` /
``_CNN_ViT_2D.py``: CPS between two models + supervised patch-contrastive on
labeled logits (classifier heads, stride-2 interleave) + patch-NCE on
unlabeled logits (projector heads).

Faithful quirks:
* the strong-augmented loader is zipped in but its batch is never forwarded
  (``:211-220``) — we use the weak batch only;
* the contrastive heads' parameters are NOT in any optimizer (``:185-190``
  build only optimizer1/2) — heads stay at their random init (their BN
  running stats do update); mirrored via a zero optimizer on head params;
* consistency ramp uses ``ramp_up_function`` on the EPOCH index (``:109-113``)
  and a two-phase LR drop at 50% of training (``:280-284``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from cvssl_tpu.models import net_factory
from cvssl_tpu.ops import losses, ramps, schedules
from cvssl_tpu.train.methods.base import Method, register_method


@register_method("contrastive_cross")
class ContrastiveCross(Method):
    model_names = ("model1", "model2", "classifier1", "classifier2",
                   "projector1", "projector2")
    transform = "weak"  # RandomGenerator_w (resize only)

    def build_models(self):
        return {
            "model1": self._factory(self.cfg.model),
            "model2": self._factory(self.cfg.model2),
            "classifier1": net_factory("classifier",
                                       class_num=self.cfg.num_classes),
            "classifier2": net_factory("classifier",
                                       class_num=self.cfg.num_classes),
            "projector1": net_factory("projector",
                                      class_num=self.cfg.num_classes),
            "projector2": net_factory("projector",
                                      class_num=self.cfg.num_classes),
        }

    def optimizers(self):
        tx = schedules.two_phase_reference_sgd(self.cfg.base_lr,
                                               self.cfg.max_iterations)
        frozen = optax.set_to_zero()
        return {"model1": tx, "model2": tx, "classifier1": frozen,
                "classifier2": frozen, "projector1": frozen,
                "projector2": frozen}

    def init_inputs(self, name, sample_batch):
        import jax.numpy as jnp
        img = jnp.asarray(sample_batch["image"])
        if name.startswith(("classifier", "projector")):
            return (jnp.zeros(img.shape[:-1] + (self.cfg.num_classes,),
                              jnp.float32),)
        return (img,)

    def eval_model_names(self):
        return ("model1", "model2")

    def _epoch(self, ctx):
        # epoch index = iter // iters_per_epoch; iters/epoch = labeled pool /
        # labeled batch (TwoStreamBatchSampler semantics)
        per_epoch = max(self.cfg.labeled_slices // self.cfg.labeled_bs, 1)
        return jnp.floor_divide(ctx.step, per_epoch)

    def loss(self, ctx, batch):
        cfg = self.cfg
        lb = cfg.labeled_bs
        label = batch["label"][:lb]
        img = batch["image"]

        out1 = self.primary_logits(ctx.forward("model1", img))
        out2 = self.primary_logits(ctx.forward("model2", img))
        soft1 = jax.nn.softmax(out1.astype(jnp.float32), axis=-1)
        soft2 = jax.nn.softmax(out2.astype(jnp.float32), axis=-1)

        w = cfg.consistency * ramps.ramp_up_function(
            self._epoch(ctx), int(cfg.consistency_rampup))

        loss1 = 0.5 * sum(self.sup_ce_dice(out1[:lb], label))
        loss2 = 0.5 * sum(self.sup_ce_dice(out2[:lb], label))

        pseudo1 = jnp.argmax(jax.lax.stop_gradient(soft1[lb:]), axis=-1)
        pseudo2 = jnp.argmax(jax.lax.stop_gradient(soft2[lb:]), axis=-1)
        ps1 = losses.dice_loss(soft1[lb:], pseudo2, cfg.num_classes)
        ps2 = losses.dice_loss(soft2[lb:], pseudo1, cfg.num_classes)

        # supervised contrastive: even labeled logits -> classifier1,
        # odd -> classifier2 (reference :245-247)
        feat_l_q = ctx.forward("classifier1", out1[:lb][0::2])
        feat_l_k = ctx.forward("classifier2", out2[:lb][1::2])
        # heads emit NHWC; the loss expects (B, C, ...) like torch
        lc_l = losses.contrastive_loss_sup(
            jnp.moveaxis(feat_l_q, -1, 1), jnp.moveaxis(feat_l_k, -1, 1))

        feat_q = ctx.forward("projector1", out1[lb:])
        feat_k = ctx.forward("projector2", out2[lb:])
        lc_u = losses.con_loss(jnp.moveaxis(feat_q, -1, 1),
                               jnp.moveaxis(feat_k, -1, 1))

        supervised = loss1 + loss2
        semisup = w * ps1 + w * ps2
        contrastive = lc_l + lc_u
        total = 2.0 * supervised + 0.5 * contrastive + 1.25 * semisup
        return total, {"loss": total, "model1_loss": loss1 + w * ps1,
                       "model2_loss": loss2 + w * ps2,
                       "contrast_l": lc_l, "contrast_u": lc_u,
                       "consistency_weight": w}
