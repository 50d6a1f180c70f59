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

    def forward_teacher_scan(self, name, x_groups):
        """Sequential per-group teacher forwards under stop_gradient — the
        reference's Monte-Carlo loop of separate minibatch passes
        (``train_uncertainty_aware_mean_teacher_2D.py:163-172``): BatchNorm
        normalizes with PER-PASS batch statistics and the running stats
        thread pass-to-pass (torch buffers self-update each call). One
        ``lax.scan`` over the group axis keeps it a single XLA program.

        ``x_groups``: (n_groups, group_batch, *spatial, C). Returns the
        model output with the same two leading axes. Independent dropout
        keys per group, like the reference's sequential calls."""
        module = self.modules[name]
        params = self.teacher_params[name]
        n = x_groups.shape[0]
        kd = jax.random.split(self.next_rng(), n)
        kp = jax.random.split(self.next_rng(), n)
        has_stats = name in self.teacher_stats and self.teacher_stats[name]

        if has_stats:
            def body(stats, inp):
                xg, k1, k2 = inp
                out, mut = module.apply(
                    {"params": params, "batch_stats": stats}, xg,
                    train=True, rngs={"dropout": k1, "perturb": k2},
                    mutable=["batch_stats"])
                return mut["batch_stats"], out
            new_stats, outs = jax.lax.scan(
                body, self.teacher_stats[name], (x_groups, kd, kp))
            self.teacher_stats[name] = new_stats
        else:
            def body_nostats(carry, inp):
                xg, k1, k2 = inp
                out = module.apply({"params": params}, xg, train=True,
                                   rngs={"dropout": k1, "perturb": k2})
                return carry, out
            _, outs = jax.lax.scan(body_nostats, jnp.zeros(()),
                                   (x_groups, kd, kp))
        return jax.tree_util.tree_map(jax.lax.stop_gradient, outs)

    def consistency_weight(self):
        from cvssl_tpu.ops.ramps import consistency_weight
        return consistency_weight(self.step, self.cfg.consistency,
                                  self.cfg.consistency_rampup)


