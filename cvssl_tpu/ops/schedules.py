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
