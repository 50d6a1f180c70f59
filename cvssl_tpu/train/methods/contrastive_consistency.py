"""Cross-CTA contrastive consistency (dual ViT, ICCVW'23) —
``train_Contrastive_Consistency_ViT_2D.py``.

Structure: two students on CTAugment weak/strong views; ensemble masked
pseudo-labels supervise the strong views (FixMatch-style CE+Dice); four
projector heads give cross contrastive terms (projector1/2 are EMA copies of
projector3/4, none are in an optimizer — reference ``:186-190,536-541``);
CTAugment policies refresh per epoch with depth schedules (``:366-377``) and
on unfavorable crops (``:402-409``); bin rates update from the epoch's mean
loss (``:723-726``).

Host-side CTA state lives on the method instance; the engine's fit() loop
drives the epoch hooks.
"""
from __future__ import annotations

from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cvssl_tpu.data import ctaugment as cta_mod
from cvssl_tpu.models import net_factory
from cvssl_tpu.ops import losses, ramps, schedules
from cvssl_tpu.train.methods.base import Method, register_method
from cvssl_tpu.train.methods.fixmatch import normalize_softmax


@register_method("contrastive_consistency")
class ContrastiveConsistency(Method):
    model_names = ("model1", "model2", "projector1", "projector2",
                   "projector3", "projector4")
    transform = "cta"
    # projector1 <- EMA(projector3), projector2 <- EMA(projector4)
    param_ema_map = {"projector1": "projector3", "projector2": "projector4"}

    def __init__(self, cfg):
        super().__init__(cfg)
        self.cta = cta_mod.CTAugment()
        self._epoch_losses: list = []

    def build_models(self):
        return {
            "model1": self._factory(self.cfg.model),
            "model2": self._factory(self.cfg.model2),
            **{f"projector{i}": net_factory(
                "projector", class_num=self.cfg.num_classes)
               for i in (1, 2, 3, 4)},
        }

    def optimizers(self):
        tx = schedules.reference_sgd(self.cfg.base_lr,
                                     self.cfg.max_iterations)
        frozen = optax.set_to_zero()
        return {"model1": tx, "model2": tx,
                **{f"projector{i}": frozen for i in (1, 2, 3, 4)}}

    def init_inputs(self, name, sample_batch):
        img = jnp.asarray(sample_batch["image"])
        if name.startswith("projector"):
            return (jnp.zeros(img.shape[:-1] + (self.cfg.num_classes,),
                              jnp.float32),)
        return (img,)

    def eval_model_names(self):
        return ("model1", "model2")

    # ------------------------------------------------------------------
    # host-side CTA hooks (driven by fit())
    # ------------------------------------------------------------------
    def create_transform(self, cfg, rng):
        transform = cta_mod.CTATransform(cfg.patch_size, self.cta)
        ops_weak = self.cta.policy(probe=False, weak=True)
        ops_strong = self.cta.policy(probe=False, weak=False)
        return transform, ops_weak, ops_strong

    def refresh_policies(self, dataset, depth_weak: int, depth_strong: int):
        self.cta.random_depth_weak = depth_weak
        self.cta.random_depth_strong = depth_strong
        dataset.ops_weak = self.cta.policy(probe=False, weak=True)
        dataset.ops_strong = self.cta.policy(probe=False, weak=False)
        if (max(Counter(a.f for a in dataset.ops_weak).values()) >= 3 or
                max(Counter(a.f for a in dataset.ops_strong).values()) >= 3):
            self.refresh_policies(dataset, depth_weak, depth_strong)

    def on_epoch_start(self, dataset, iter_num: int):
        if iter_num <= 10000:
            dw = int(np.random.randint(3, 5))
            ds = int(np.random.randint(2, 5))
        elif iter_num >= 20000:
            dw = ds = 2
        else:
            dw = int(np.random.randint(2, 5))
            ds = int(np.random.randint(2, 5))
        self.refresh_policies(dataset, dw, ds)
        self._epoch_losses = []

    def on_batch(self, batch, dataset):
        """Unfavorable-crop detection (``:402-409``): raw labels have
        foreground but the augmented labels lost (almost) all of it."""
        n = batch["label"].size
        ratio = np.count_nonzero(batch["label"]) / n
        ratio_aug = np.count_nonzero(batch["label_aug"]) / n
        if ratio > 0 and ratio_aug < 0.005:
            self.refresh_policies(dataset, self.cta.random_depth_weak,
                                  self.cta.random_depth_strong)

    def on_step_metrics(self, metrics):
        self._epoch_losses.append(0.5 * float(metrics["loss"]))

    def on_epoch_end(self, dataset):
        if self._epoch_losses:
            mean_err = float(np.mean(self._epoch_losses))
            self.cta.update_rates(dataset.ops_weak, 1.0 - 0.5 * mean_err)
            self.cta.update_rates(dataset.ops_strong, 1.0 - 0.5 * mean_err)

    # ------------------------------------------------------------------
    def loss(self, ctx, batch):
        cfg = self.cfg
        lb = cfg.labeled_bs
        weak, strong = batch["image_weak"], batch["image_strong"]
        label = jnp.clip(batch["label_aug"], 0, cfg.num_classes - 1)[:lb]

        out_w1 = self.primary_logits(ctx.forward("model1", weak))
        out_s1 = self.primary_logits(ctx.forward("model1", strong))
        out_w2 = self.primary_logits(ctx.forward("model2", weak))
        out_s2 = self.primary_logits(ctx.forward("model2", strong))
        soft_w1 = jax.nn.softmax(out_w1.astype(jnp.float32), axis=-1)
        soft_s1 = jax.nn.softmax(out_s1.astype(jnp.float32), axis=-1)
        soft_w2 = jax.nn.softmax(out_w2.astype(jnp.float32), axis=-1)
        soft_s2 = jax.nn.softmax(out_s2.astype(jnp.float32), axis=-1)

        # ensemble masked pseudo labels (note: MASKED NORMALIZED softmax,
        # unlike plain FixMatch — reference :424-434)
        m1 = (normalize_softmax(soft_w1) > cfg.conf_thresh).astype(jnp.float32)
        m2 = (normalize_softmax(soft_w2) > cfg.conf_thresh).astype(jnp.float32)
        masked = (normalize_softmax(soft_w1) * m1 +
                  normalize_softmax(soft_w2) * m2) / 2.0
        pseudo = jnp.argmax(jax.lax.stop_gradient(masked), axis=-1)

        t = jnp.floor_divide(ctx.step, 150)
        w1 = cfg.consistency1 * ramps.sigmoid_rampup(t, cfg.consistency_rampup)
        w2 = cfg.consistency2 * ramps.sigmoid_rampup(t, cfg.consistency_rampup)

        sup = (sum(self.sup_ce_dice(out_w1[:lb], label)) +
               sum(self.sup_ce_dice(out_w2[:lb], label)))

        unsup = (losses.cross_entropy(out_s1[lb:], pseudo[lb:]) +
                 losses.dice_loss(soft_s1[lb:], pseudo[lb:],
                                  cfg.num_classes) +
                 losses.cross_entropy(out_s2[lb:], pseudo[lb:]) +
                 losses.dice_loss(soft_s2[lb:], pseudo[lb:],
                                  cfg.num_classes))

        def chw(x):
            return jnp.moveaxis(x, -1, 1)

        lc_l = losses.contrastive_loss_sup(
            chw(ctx.forward("projector3", out_w1[:lb])),
            chw(ctx.forward("projector4", out_w2[:lb])))
        lc_u1 = losses.contrastive_loss_sup(
            chw(ctx.forward("projector1", out_w1[lb:])),
            chw(ctx.forward("projector4", out_s2[lb:])))
        lc_u2 = losses.contrastive_loss_sup(
            chw(ctx.forward("projector2", out_w2[lb:])),
            chw(ctx.forward("projector3", out_s1[lb:])))
        lc_u = lc_u1 + lc_u2

        total = sup + w1 * lc_l + w1 * unsup + w2 * lc_u
        return total, {"loss": total, "sup_loss": sup, "unsup_loss": unsup,
                       "contrast_l": lc_l, "contrast_u": lc_u,
                       "consistency_weight1": w1, "consistency_weight2": w2}
