"""Intermediate feature extraction — parity with the reference's
``code/networks/utils.py:401-453`` ``HookBasedFeatureExtractor`` (grab a
named submodule's output during a forward pass, optionally rescaled to the
input's spatial size) and ``:380-398`` ``FeatureExtractor`` (collect several
named layers' outputs).

torch does this with forward hooks that mutate extractor state; the JAX/flax
idiom is ``Module.apply(..., capture_intermediates=...)``, which returns the
captured activations functionally — jit-compatible and side-effect free.
"""
from __future__ import annotations

from typing import Sequence

import jax


def _flatten_captures(intermediates, match_names):
    """Walk the intermediates tree; collect ``__call__`` outputs of modules
    whose path ends in one of ``match_names`` (in path order)."""
    found = []

    def walk(tree, path):
        if not isinstance(tree, dict):
            return
        for key, sub in tree.items():
            if key == "__call__":
                if path and path[-1] in match_names:
                    # flax stores each capture as a tuple of call outputs
                    found.append(("/".join(path), sub[0]))
            else:
                walk(sub, path + [key])

    walk(intermediates, [])
    return found


def extract_features(module, variables, x, layer_name: str,
                     upscale: bool = False, **apply_kwargs):
    """Return (input_like, outputs) for ``layer_name`` during a forward pass
    of ``module`` — the ``HookBasedFeatureExtractor`` contract.

    ``layer_name`` is the flax submodule name (e.g. ``"enc_0_1"`` or
    ``"attn"``); all submodules with that terminal name are captured. With
    ``upscale=True``, array outputs are bilinearly resized to ``x``'s spatial
    dims like the reference's ``rescale_output_array`` (:432-437).

    Returns ``(out, feats)`` where ``out`` is the model's normal output and
    ``feats`` a list of (path, activation).
    """
    out, state = module.apply(
        variables, x, capture_intermediates=lambda mdl, _:
            mdl.name == layer_name,
        mutable=["intermediates"], **apply_kwargs)
    feats = _flatten_captures(state["intermediates"], {layer_name})
    if upscale:
        spatial = x.shape[1:-1]

        def up(a):
            if hasattr(a, "ndim") and a.ndim == x.ndim:
                method = "trilinear" if len(spatial) == 3 else "bilinear"
                return jax.image.resize(
                    a, (a.shape[0], *spatial, a.shape[-1]), method)
            return a
        feats = [(p, jax.tree_util.tree_map(up, a)) for p, a in feats]
    return out, feats


def extract_layers(module, variables, x, layer_names: Sequence[str],
                   **apply_kwargs):
    """``FeatureExtractor`` (``utils.py:380-398``): outputs of several named
    layers plus the final output, as (out, [(path, activation), ...])."""
    names = set(layer_names)
    out, state = module.apply(
        variables, x, capture_intermediates=lambda mdl, _:
            mdl.name in names,
        mutable=["intermediates"], **apply_kwargs)
    return out, _flatten_captures(state["intermediates"], names)
