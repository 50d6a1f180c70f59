"""FixMatch with complementary (negative) learning —
``train_Fixmatch_CNN_2D.py``. Data must come from ``WeakStrongAugment``
(batch keys image_weak / image_strong / label_aug)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cvssl_tpu.ops import losses
from cvssl_tpu.train.methods.base import Method, register_method


def normalize_softmax(soft, axis: int = -1):
    """The reference's minmax 'normalize' (``:161-165``): subtract the
    per-pixel class min, divide by the ORIGINAL per-pixel class max (faithful
    quirk — not a true minmax)."""
    min_val = jnp.min(soft, axis=axis, keepdims=True)
    max_val = jnp.max(soft, axis=axis, keepdims=True)
    return (soft - min_val) / max_val


@register_method("fixmatch")
class FixMatch(Method):
    teacher_names = ("model",)   # EMA kept like the reference (unused in loss)
    transform = "weak_strong"

    def comp_loss(self, weak_soft, strong_soft):
        """Complementary loss + adaptive sample weight (``:132-159``):
        entropy of the spatial distribution per (b, class) normalized by
        log(H*W); CE of (1 - strong_soft) treated as logits against the
        argmin class of weak."""
        b = weak_soft.shape[0]
        c = weak_soft.shape[-1]
        # (B, C, H*W) spatial distribution -> torch Categorical normalizes.
        il = jnp.moveaxis(strong_soft, -1, 1).reshape(b, c, -1)
        p = il / jnp.maximum(jnp.sum(il, axis=-1, keepdims=True), 1e-12)
        ent = -jnp.sum(p * jnp.log(jnp.maximum(p, 1e-12)), axis=-1)
        n_sites = il.shape[-1]
        as_weight = jnp.mean(1.0 - ent / jnp.log(float(n_sites)))
        comp_labels = jnp.argmin(jax.lax.stop_gradient(weak_soft), axis=-1)
        comp = as_weight * losses.cross_entropy(1.0 - strong_soft, comp_labels)
        return comp, as_weight

    def loss(self, ctx, batch):
        cfg = self.cfg
        lb = cfg.labeled_bs
        weak, strong = batch["image_weak"], batch["image_strong"]
        label = batch["label_aug"][:lb]

        out_weak = self.primary_logits(ctx.forward("model", weak))
        soft_weak = jax.nn.softmax(out_weak.astype(jnp.float32), axis=-1)
        out_strong = self.primary_logits(ctx.forward("model", strong))
        soft_strong = jax.nn.softmax(out_strong.astype(jnp.float32), axis=-1)

        pseudo_mask = (normalize_softmax(soft_weak) >
                       cfg.conf_thresh).astype(jnp.float32)
        masked_weak = soft_weak * pseudo_mask
        pseudo = jnp.argmax(jax.lax.stop_gradient(masked_weak[lb:]), axis=-1)

        w = ctx.consistency_weight()
        # supervised: ce + dice, NOT halved (reference :273-277)
        sup = sum(self.sup_ce_dice(out_weak[:lb], label))

        comp, as_weight = self.comp_loss(soft_weak, soft_strong)
        # unsup adds as_weight * comp AGAIN (comp already carries one factor)
        # — faithful to reference :279-286.
        unsup = (losses.cross_entropy(out_strong[lb:], pseudo) +
                 losses.dice_loss(soft_strong[lb:], pseudo, cfg.num_classes) +
                 as_weight * comp)

        total = sup + w * unsup
        return total, {"loss": total, "sup_loss": sup, "unsup_loss": unsup,
                       "as_weight": as_weight, "consistency_weight": w}
