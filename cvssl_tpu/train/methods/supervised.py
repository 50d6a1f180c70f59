"""Fully-supervised baseline — ``train_fully_supervised_2D.py`` /
``train_fully_supervised_3D.py`` (and their ViT variants via --model)."""
from __future__ import annotations

from cvssl_tpu.ops import losses
from cvssl_tpu.train.methods.base import Method, register_method


@register_method("supervised")
class Supervised(Method):
    """loss = 0.5*(ce + dice) on the whole batch
    (``train_fully_supervised_2D.py:109-114``)."""

    supervised_only = True

    def loss(self, ctx, batch):
        import jax
        logits = self.primary_logits(ctx.forward("model", batch["image"]))
        if getattr(self.cfg, "fused_loss", True) and \
                jax.default_backend() == "tpu":
            from cvssl_tpu.ops.pallas_kernels import fused_dice_ce_loss
            total = fused_dice_ce_loss(logits, batch["label"],
                                       self.cfg.num_classes)
            return total, {"loss": total}
        ce = losses.cross_entropy(logits, batch["label"])
        dice = losses.dice_loss(logits, batch["label"],
                                self.cfg.num_classes, softmax=True)
        total = 0.5 * (ce + dice)
        return total, {"loss": total, "loss_ce": ce, "loss_dice": dice}
