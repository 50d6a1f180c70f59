"""Train state + per-step forward context.

One ``TrainState`` replaces the reference's loose (model, ema_model,
optimizer, iter_num) locals duplicated across 27 scripts. It is a pytree:
the whole step — forwards, losses, grads, optimizer, EMA teacher update —
compiles into a single XLA program.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray                       # () int32
    params: Dict[str, Any]                  # {model_name: params}
    batch_stats: Dict[str, Any]             # {model_name: stats} ({} if none)
    opt_state: Any
    teacher_params: Dict[str, Any]          # {model_name: params} (EMA)
    teacher_batch_stats: Dict[str, Any]
    extra: Any                              # method-specific pytree
    rng: jax.Array


class StepCtx:
    """Ephemeral forward helper, created inside the traced loss function.

    Tracks BatchNorm state updates across forwards (students update their
    stats; the teacher's stats update too — torch buffers self-update during
    the teacher's train-mode forwards, ``train_mean_teacher_2D.py:214``) and
    hands out per-call RNG streams.
    """

    def __init__(self, cfg, modules, params, batch_stats, teacher_params,
                 teacher_batch_stats, rng, step):
        self.cfg = cfg
        self.modules = modules
        self.params = params
        self.stats = dict(batch_stats)
        self.teacher_params = teacher_params
        self.teacher_stats = dict(teacher_batch_stats)
        self.step = step
        self._rng = rng

    def next_rng(self, num: int = 1):
        keys = jax.random.split(self._rng, num + 1)
        self._rng = keys[0]
        return keys[1] if num == 1 else keys[1:]

    def _apply(self, name, params, stats_map, x, train, extra_args=()):
        module = self.modules[name]
        variables = {"params": params}
        has_stats = name in stats_map and stats_map[name]
        if has_stats:
            variables["batch_stats"] = stats_map[name]
        rngs = {"dropout": self.next_rng(), "perturb": self.next_rng()}
        if train and has_stats:
            out, mutated = module.apply(variables, x, *extra_args,
                                        train=True, rngs=rngs,
                                        mutable=["batch_stats"])
            stats_map[name] = mutated["batch_stats"]
            return out
        return module.apply(variables, x, *extra_args, train=train,
                            rngs=rngs if train else None)

    def forward(self, name, x, train: bool = True, extra_args=()):
        """Student forward; updates the student's BatchNorm stats."""
        return self._apply(name, self.params[name], self.stats, x, train,
                           extra_args)

    def forward_teacher(self, name, x, train: bool = True, extra_args=()):
        """Teacher (EMA) forward under stop_gradient; train-mode BN/dropout
        like the reference, stats tracked separately."""
        out = self._apply(name, self.teacher_params[name],
                          self.teacher_stats, x, train, extra_args)
        return jax.tree_util.tree_map(jax.lax.stop_gradient, out)

    def consistency_weight(self):
        from cvssl_tpu.ops.ramps import consistency_weight
        return consistency_weight(self.step, self.cfg.consistency,
                                  self.cfg.consistency_rampup)


