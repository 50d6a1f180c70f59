"""Uncertainty-aware mean teacher —
``train_uncertainty_aware_mean_teacher_2D.py`` / ``_ViT_2D`` / ``_3D``.

The reference's T=8 Monte-Carlo loop (4 sequential teacher forwards on
repeat(2)-tiled batches, ``:160-172``) becomes ONE batched forward over a
T-times-tiled unlabeled batch wherever that is exact (InstanceNorm /
LayerNorm models — no cross-sample coupling). BatchNorm teachers (plain 2D
UNet) keep the reference's per-pass batch statistics via a ``lax.scan``
over the (T//2, 2u) pass groups — still one XLA program, math identical
to the sequential loop (pinned by tests/test_grad_parity.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cvssl_tpu.ops import losses, ramps
from cvssl_tpu.train.methods.base import Method, register_method, split_batch

# Fuse the 3D teacher's consistency-target forward into the T-pass MC batch
# (InstanceNorm models only — exact). Module flag so probes can A/B it.
FUSE_TEACHER_3D = True


@register_method("uamt")
class UncertaintyAwareMeanTeacher(Method):
    teacher_names = ("model",)

    def loss(self, ctx, batch):
        cfg = self.cfg
        T = cfg.uncertainty_T
        labeled_img, label, unlabeled_img = split_batch(cfg, batch)
        u = unlabeled_img.shape[0]

        noise = jnp.clip(
            0.1 * jax.random.normal(ctx.next_rng(), unlabeled_img.shape),
            -0.2, 0.2)
        ema_inputs = unlabeled_img + noise

        outputs = self.primary_logits(ctx.forward("model", batch["image"]))

        tiled = jnp.tile(unlabeled_img, (T,) + (1,) * (unlabeled_img.ndim - 1))
        mc_noise = jnp.clip(
            0.1 * jax.random.normal(ctx.next_rng(), tiled.shape), -0.2, 0.2)
        has_bn = bool(ctx.teacher_stats.get("model"))
        if self.cfg.dim == 3 and FUSE_TEACHER_3D and not has_bn:
            # 3D models normalize per sample (InstanceNorm), so the
            # consistency-target forward and the T MC passes fuse into ONE
            # (T+1)*u teacher batch — exactly the reference's 1 + T/2
            # sequential calls (:160-172), one conv batch on the MXU.
            all_logits = self.primary_logits(ctx.forward_teacher(
                "model", jnp.concatenate([ema_inputs, tiled + mc_noise])))
            ema_logits, mc_logits = all_logits[:u], all_logits[u:]
        elif has_bn and T % 2 == 0:
            # BatchNorm teachers (plain 2D UNet): the reference runs T//2
            # sequential passes over the twice-repeated unlabeled batch
            # (:163-172), so batch statistics are PER PASS over 2u samples.
            # Row t*u+j of the reference's preds buffer comes from pass
            # t//2 — exactly the (T//2, 2u) reshape of our T-tiled batch.
            # A lax.scan over those groups reproduces the math exactly
            # (one XLA program; running stats thread like torch buffers).
            ema_logits = self.primary_logits(
                ctx.forward_teacher("model", ema_inputs))
            groups = (tiled + mc_noise).reshape(
                (T // 2, 2 * u) + tiled.shape[1:])
            mc = self.primary_logits(
                ctx.forward_teacher_scan("model", groups))
            mc_logits = mc.reshape((T * u,) + mc.shape[2:])
        else:
            # stats-free teachers (LayerNorm SwinUnet, InstanceNorm) see no
            # cross-sample coupling — one T*u batch is exactly the
            # reference's sequential passes, fused onto the MXU.
            ema_logits = self.primary_logits(
                ctx.forward_teacher("model", ema_inputs))
            mc_logits = self.primary_logits(
                ctx.forward_teacher("model", tiled + mc_noise))
        preds = jax.nn.softmax(mc_logits.astype(jnp.float32), axis=-1)
        preds = preds.reshape((T, u) + preds.shape[1:]).mean(axis=0)
        uncertainty = -jnp.sum(preds * jnp.log(preds + 1e-6), axis=-1,
                               keepdims=True)

        ce, dice = self.sup_ce_dice(outputs[:cfg.labeled_bs], label)
        sup = 0.5 * (ce + dice)

        w = ctx.consistency_weight()
        dist = losses.softmax_mse_loss(outputs[cfg.labeled_bs:], ema_logits)
        # threshold ramps on the RAW iteration (not //150):
        # (0.75 + 0.25*rampup(iter, max_iter)) * ln(2)  (reference :187-189)
        threshold = (0.75 + 0.25 * ramps.sigmoid_rampup(
            ctx.step, cfg.max_iterations)) * jnp.log(2.0)
        mask = (uncertainty < threshold).astype(jnp.float32)
        cons = jnp.sum(mask * dist) / (2 * jnp.sum(mask) + 1e-16)

        total = sup + w * cons
        return total, {"loss": total, "loss_ce": ce, "loss_dice": dice,
                       "consistency_loss": cons, "consistency_weight": w,
                       "uncertainty_mask_frac": jnp.mean(mask)}
