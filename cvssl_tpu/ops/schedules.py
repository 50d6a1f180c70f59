"""Optimizer / LR schedules (optax-compatible).

The reference hand-updates ``param_group['lr']`` each iteration
(``train_fully_supervised_2D.py:119-121``); here schedules are pure
step -> lr functions fed to optax, so they compile into the train step.
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def poly_lr(base_lr: float, max_iterations: int, power: float = 0.9):
    """lr = base_lr * (1 - it / max_it)^power — the poly decay used by every
    reference trainer (``train_fully_supervised_2D.py:119``)."""
    def schedule(step):
        frac = 1.0 - jnp.asarray(step, jnp.float32) / float(max_iterations)
        return base_lr * jnp.maximum(frac, 0.0) ** power
    return schedule


def two_phase_lr(base_lr: float, max_iterations: int, drop_to: float = 1e-4):
    """Constant base_lr, dropping to ``drop_to`` after 50% of iterations —
    the contrastive trainers' schedule
    (``train_Contrastive_Cross_CNN_ViT_2D.py:280-284``)."""
    def schedule(step):
        return jnp.where(jnp.asarray(step) < max_iterations // 2,
                         jnp.float32(base_lr), jnp.float32(drop_to))
    return schedule


def two_phase_poly_lr(base_lr: float, max_iterations: int,
                      drop_to: float = 1e-4, power: float = 0.9):
    """The contrastive trainers' exact LR rule
    (``train_Contrastive_Cross_CNN_ViT_2D.py:280-284``): poly until 50% of
    iterations, then restart from ``drop_to`` with a half-rate poly."""
    half = max_iterations * 0.5

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        early = base_lr * jnp.maximum(
            1.0 - step / float(max_iterations), 0.0) ** power
        late = drop_to * jnp.maximum(
            1.0 - (step - half) / float(max_iterations) * 0.5, 0.0) ** power
        return jnp.where(step / max_iterations > 0.5, late, early)
    return schedule


def two_phase_reference_sgd(base_lr: float, max_iterations: int,
                            momentum: float = 0.9,
                            weight_decay: float = 1e-4):
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(
            two_phase_poly_lr(base_lr, max_iterations)),
    )


def reference_sgd(base_lr: float, max_iterations: int, momentum: float = 0.9,
                  weight_decay: float = 1e-4, power: float = 0.9):
    """SGD(momentum=0.9, weight_decay=1e-4) with poly LR — the reference's
    segmentation optimizer (``train_mean_teacher_2D.py:189``).

    torch SGD weight decay adds wd*p to the gradient BEFORE momentum; optax's
    ``add_decayed_weights`` before ``trace`` matches that order.
    """
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(poly_lr(base_lr, max_iterations, power)),
    )


def discriminator_adam(lr: float = 1e-4, betas=(0.9, 0.99)):
    """Adam for the DAN discriminator (``train_adversarial_network_2D.py:123``)."""
    return optax.adam(lr, b1=betas[0], b2=betas[1])


# ---------------------------------------------------------------------------
# networks_other.py scheduler family (``get_scheduler``, :95-139). Dead
# upstream (no trainer calls get_scheduler) but part of the public surface.
# torch's epoch-indexed LambdaLR/StepLR become pure step -> lr functions.
# ---------------------------------------------------------------------------

def lambda_linear_lr(base_lr: float, niter: int, niter_decay: int,
                     epoch_count: int = 1):
    """'lambda' policy: flat for ``niter`` epochs then linear to 0 over
    ``niter_decay`` (``networks_other.py:97-101``)."""
    def schedule(epoch):
        e = jnp.asarray(epoch, jnp.float32)
        frac = 1.0 - jnp.maximum(0.0, e + 1 + epoch_count - niter) \
            / float(niter_decay + 1)
        return base_lr * frac
    return schedule


def step_lr(base_lr: float, step_size: int, gamma: float = 0.5):
    """'step' (gamma 0.5) / 'step2' (pass gamma=0.1) policies
    (``networks_other.py:102-105``)."""
    def schedule(epoch):
        return base_lr * gamma ** (jnp.asarray(epoch) // step_size)
    return schedule


def step_warmstart_lr(base_lr: float, variant: int = 1):
    """'step_warmstart' (:111-123) / 'step_warmstart2' (:124-136): x0.1
    warmup for 5 epochs, full rate, then staircase back down. variant=1
    drops at 100/200, variant=2 at 50/100."""
    hi = (100, 200) if variant == 1 else (50, 100)

    def schedule(epoch):
        e = jnp.asarray(epoch)
        scale = jnp.where(e < 5, 0.1,
                          jnp.where(e < hi[0], 1.0,
                                    jnp.where(e < hi[1], 0.1, 0.01)))
        return base_lr * scale
    return schedule


class ReduceLROnPlateau:
    """'plateau'/'plateau2' policies (``networks_other.py:106-110``): scale
    LR by ``factor`` when the monitored value hasn't improved by ``threshold``
    (relative, torch default mode) for ``patience`` evaluations.

    Host-side controller (the decision depends on val metrics, which live on
    host between eval rounds): call ``update(metric)`` after each eval and
    multiply the base schedule by ``.scale``.
    """

    def __init__(self, factor: float = 0.1, patience: int = 5,
                 threshold: float = 0.01, mode: str = "min"):
        assert mode in ("min", "max")
        self.factor, self.patience, self.threshold = (factor, patience,
                                                      threshold)
        self.mode = mode
        self.best = None
        self.bad_epochs = 0
        self.scale = 1.0

    def _improved(self, metric: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            return metric < self.best * (1.0 - self.threshold)
        return metric > self.best * (1.0 + self.threshold)

    def update(self, metric: float) -> float:
        if self._improved(metric):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale *= self.factor
                self.bad_epochs = 0
        return self.scale
