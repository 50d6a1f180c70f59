"""SSL method interface.

Each reference ``train_*.py`` script differs only in its loss block (SURVEY
§1); here a Method is exactly that block: models to build, optimizers, and a
pure ``loss(ctx, batch)``. Everything else (stepping, EMA, val, ckpt) lives
once in the engine.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from cvssl_tpu.models import net_factory, net_factory_3d
from cvssl_tpu.ops import schedules

_REGISTRY: Dict[str, type] = {}


def register_method(name: str):
    def deco(cls):
        cls.name = name
        _REGISTRY[name] = cls
        return cls
    return deco


def get_method(name: str, cfg):
    if name not in _REGISTRY:
        # import side-effect registration
        from cvssl_tpu.train import methods  # noqa: F401
        if name not in _REGISTRY:
            raise ValueError(
                f"unknown method {name!r}; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name](cfg)


def available_methods():
    from cvssl_tpu.train import methods  # noqa: F401
    return sorted(_REGISTRY)


class Method:
    """Base: single supervised model, no teacher, no extra state."""

    name = "base"
    model_names: Tuple[str, ...] = ("model",)
    teacher_names: Tuple[str, ...] = ()      # models that get an EMA teacher
    adversarial_models: Tuple[str, ...] = ()  # trained by loss_d (2nd phase)
    transform: str = "default"               # default | weak_strong | weak+strong
    supervised_only: bool = False            # labeled-only dataset, no 2-stream

    def __init__(self, cfg):
        self.cfg = cfg

    # -- construction -----------------------------------------------------
    def _factory(self, net_type: str) -> nn.Module:
        kw = self.cfg.model_kwargs(net_type)
        if self.cfg.dim == 3:
            return net_factory_3d(net_type, self.cfg.in_channels,
                                  self.cfg.num_classes, **kw)
        return net_factory(net_type, self.cfg.in_channels,
                           self.cfg.num_classes, **kw)

    def build_models(self) -> Dict[str, nn.Module]:
        return {"model": self._factory(self.cfg.model)}

    def optimizers(self):
        """Per-model optax transforms; the engine combines them."""
        tx = schedules.reference_sgd(self.cfg.base_lr,
                                     self.cfg.max_iterations)
        return {name: tx for name in self.model_names}

    def init_extra(self, rng):
        return ()

    def init_inputs(self, name: str, sample_batch) -> tuple:
        """Arguments for ``module.init`` (override for models whose forward
        takes more than an image, e.g. discriminators)."""
        import jax.numpy as jnp
        return (jnp.asarray(sample_batch["image"]),)

    # -- the strategy -----------------------------------------------------
    def loss(self, ctx, batch):
        """Return (total_loss, metrics_dict). Override per strategy."""
        raise NotImplementedError

    # -- eval -------------------------------------------------------------
    def eval_model_names(self) -> Tuple[str, ...]:
        """Models to validate/checkpoint independently (cross-teaching
        validates both, ``train_cross_teaching...py:287``)."""
        return self.model_names

    def primary_logits(self, out):
        """Extract the main logit map from a model output (DS variants
        return tuples)."""
        return out[0] if isinstance(out, (tuple, list)) else out

    def sup_ce_dice(self, logits, label):
        """(ce, dice) supervised pair — every method's labeled-loss
        ingredients. Routes through the Pallas fused single-HBM-sweep
        kernel when ``cfg.fused_loss`` (TPU only; identical numerics)."""
        from cvssl_tpu.ops import losses
        fused = (self.cfg.fused_loss_on()
                 if hasattr(self.cfg, "fused_loss_on")
                 else getattr(self.cfg, "fused_loss", False))
        if fused and logits.ndim == 5 and label.ndim == 4 \
                and self.cfg.dim == 2:
            # grouped s2d logits (B, HH, WW, 4, C): the Pallas fused kernel
            # needs <=4D, so flatten the sub-pos axis into W (contiguous —
            # per-pixel losses are invariant). The unfused path consumes
            # the 5D view directly (cross_entropy/dice_loss are
            # rank-generic reductions), avoiding the retiling reshape.
            b, hh, ww, g, c = logits.shape
            logits = logits.reshape(b, hh, ww * g, c)
            label = label.reshape(b, hh, ww * g)
        if fused:
            # the Pallas kernel's numerics contract is f32 input (the
            # unfused path casts inside each loss); exact no-op when the
            # model already emits f32
            logits = logits.astype(jnp.float32)
        return losses.ce_dice(logits, label, self.cfg.num_classes,
                              fused=fused)


def split_batch(cfg, batch):
    """(labeled image+label, unlabeled image) split used by every SSL method:
    first labeled_bs items are labeled (``train_mean_teacher_2D.py:204-210``)."""
    image = batch["image"]
    label = batch["label"]
    lb = cfg.labeled_bs
    return image[:lb], label[:lb], image[lb:]


def mean_softmax_mse(student_logits, teacher_logits):
    from cvssl_tpu.ops import losses
    return jnp.mean(losses.softmax_mse_loss(student_logits, teacher_logits))
