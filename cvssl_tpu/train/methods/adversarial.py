"""Adversarial (DAN) training — ``train_adversarial_network_2D.py`` / ``_ViT``
/ ``_3D``: a discriminator classifies (softmax map, image) pairs as
labeled(1)/unlabeled(0); the generator fools it on unlabeled data.

The reference's 2D script has a SyntaxError and can't run as shipped
(SURVEY §8); semantics here follow its obvious intent + the ViT/3D variants.
Engine runs two grad phases in one jitted step: G via ``loss``, D via
``loss_d`` (G outputs recomputed eval-mode + detached, matching the
reference's model.eval()+no_grad D phase, ``:167-177``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from cvssl_tpu.models import net_factory, net_factory_3d
from cvssl_tpu.ops import losses, schedules
from cvssl_tpu.train.methods.base import Method, register_method


@register_method("adversarial")
class AdversarialNetwork(Method):
    model_names = ("model", "dan")
    adversarial_models = ("dan",)

    def build_models(self):
        if self.cfg.dim == 3:
            dan = net_factory_3d("discriminator",
                                 class_num=self.cfg.num_classes)
        else:
            dan = net_factory("discriminator", class_num=self.cfg.num_classes)
        return {"model": self._factory(self.cfg.model), "dan": dan}

    def optimizers(self):
        return {"model": schedules.reference_sgd(self.cfg.base_lr,
                                                 self.cfg.max_iterations),
                "dan": schedules.discriminator_adam(self.cfg.dan_lr)}

    def init_inputs(self, name, sample_batch):
        img = jnp.asarray(sample_batch["image"])
        if name == "dan":
            soft = jnp.zeros(img.shape[:-1] + (self.cfg.num_classes,),
                             jnp.float32)
            return (soft, img)
        return (img,)

    def eval_model_names(self):
        return ("model",)  # the discriminator is not a segmenter

    def loss(self, ctx, batch):
        cfg = self.cfg
        lb = cfg.labeled_bs
        label = batch["label"][:lb]

        outputs = self.primary_logits(ctx.forward("model", batch["image"]))
        soft = jax.nn.softmax(outputs.astype(jnp.float32), axis=-1)

        ce, dice = self.sup_ce_dice(outputs[:lb], label)
        sup = 0.5 * (ce + dice)

        # G phase: DAN in eval mode (reference DAN.eval(), :143); fool it into
        # predicting 'labeled' (1) on unlabeled outputs.
        dan_out = ctx.forward("dan", soft[lb:],
                              extra_args=(batch["image"][lb:],), train=False)
        target = jnp.ones((dan_out.shape[0],), jnp.int32)
        w = ctx.consistency_weight()
        cons = losses.cross_entropy(dan_out, target)
        total = sup + w * cons
        return total, {"loss": total, "loss_ce": ce, "loss_dice": dice,
                       "consistency_loss": cons, "consistency_weight": w}

    def loss_d(self, ctx, batch):
        cfg = self.cfg
        # D phase: generator eval-mode + detached (reference :167-171)
        outputs = self.primary_logits(
            ctx.forward("model", batch["image"], train=False))
        soft = jax.lax.stop_gradient(
            jax.nn.softmax(outputs.astype(jnp.float32), axis=-1))
        dan_out = ctx.forward("dan", soft, extra_args=(batch["image"],),
                              train=True)
        target = jnp.concatenate([
            jnp.ones((cfg.labeled_bs,), jnp.int32),
            jnp.zeros((dan_out.shape[0] - cfg.labeled_bs,), jnp.int32)])
        d_loss = losses.cross_entropy(dan_out, target)
        return d_loss, {"dan_acc": jnp.mean(
            (jnp.argmax(dan_out, -1) == target).astype(jnp.float32))}
