"""Weight re-initialization helpers — parity with the reference's
``code/networks/networks_other.py:16-75`` (``weights_init_normal`` /
``_xavier`` / ``_kaiming`` / ``_orthogonal`` and the ``init_weights``
dispatcher).

The torch originals mutate a built module in place via ``net.apply``; the
JAX analog is a pure function over the params pytree: every conv/dense
kernel is re-sampled per ``init_type``, norm scales get N(1.0, 0.02) under
'normal' (torch's BatchNorm branch), and biases are zeroed. The caller
replaces ``variables['params']`` with the result.

Semantics matched to torch:
* normal     — N(0, 0.02) on kernels (``:16-26``)
* xavier     — ``xavier_normal(gain=1)`` (``:28-38``)
* kaiming    — ``kaiming_normal(a=0, mode='fan_in')`` = He normal (``:40-50``)
* orthogonal — ``orthogonal(gain=1)`` (``:52-62``)

Flax conv kernels are (kh, kw[, kd], in, out) and dense kernels (in, out);
fan computation accounts for the spatial receptive field the way torch's
``_calculate_fan_in_and_fan_out`` does.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_INIT_TYPES = ("normal", "xavier", "kaiming", "orthogonal")


def _fans(shape):
    """(fan_in, fan_out) with torch semantics: receptive field x channels."""
    if len(shape) < 2:
        return 1, 1
    rf = 1
    for s in shape[:-2]:
        rf *= s
    return shape[-2] * rf, shape[-1] * rf


def _init_kernel(rng, shape, dtype, init_type: str):
    fan_in, fan_out = _fans(shape)
    if init_type == "normal":
        return 0.02 * jax.random.normal(rng, shape, dtype)
    if init_type == "xavier":
        std = (2.0 / (fan_in + fan_out)) ** 0.5
        return std * jax.random.normal(rng, shape, dtype)
    if init_type == "kaiming":
        std = (2.0 / fan_in) ** 0.5
        return std * jax.random.normal(rng, shape, dtype)
    if init_type == "orthogonal":
        flat = jax.nn.initializers.orthogonal(scale=1.0)(
            rng, (int(jnp.prod(jnp.array(shape[:-1]))), shape[-1]), dtype)
        return flat.reshape(shape)
    raise NotImplementedError(
        f"initialization method [{init_type}] is not implemented")


def init_weights(params, rng, init_type: str = "normal"):
    """Re-initialize a flax params pytree (reference ``init_weights``).

    kernels (>=2D leaves named 'kernel'/'embedding') are re-sampled per
    ``init_type``; 1-D 'scale' leaves (Batch/Layer/GroupNorm) get
    N(1.0, 0.02) like torch's BatchNorm branch; 'bias' leaves are zeroed.
    Other leaves pass through unchanged.
    """
    if init_type not in _INIT_TYPES:
        raise NotImplementedError(
            f"initialization method [{init_type}] is not implemented")
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    rngs = jax.random.split(rng, max(len(flat), 1))
    leaves = []
    for (path, leaf), r in zip(flat, rngs):
        name = str(path[-1].key) if hasattr(path[-1], "key") else ""
        if name == "bias":
            leaves.append(jnp.zeros_like(leaf))
        elif name == "scale" and leaf.ndim == 1:
            leaves.append(
                (1.0 + 0.02 * jax.random.normal(r, leaf.shape)
                 ).astype(leaf.dtype))
        elif name in ("kernel", "embedding") and leaf.ndim >= 2:
            leaves.append(
                _init_kernel(r, leaf.shape, leaf.dtype, init_type))
        else:
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)
