"""torch -> flax SwinUnet checkpoint conversion.

Mirrors the reference pretrained-loading logic (``vision_transformer.py:54-89``
``load_from``): the ImageNet Swin-tiny state dict populates the encoder
directly, and each encoder stage ``layers.{i}`` is additionally copied into
decoder stage ``layers_up.{3-i}`` (shape-mismatched entries dropped).

Input: a dict of numpy arrays keyed by torch module paths (load a ``.pth``
with ``torch.load(..., map_location='cpu')`` and call ``.numpy()`` on each
tensor; pass ``sd.get('model', sd)``).
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _set(tree: dict, path: list[str], value: np.ndarray, expect_shape=True):
    node = tree
    for k in path[:-1]:
        if k not in node:
            return False
        node = node[k]
    leaf = path[-1]
    if leaf not in node:
        return False
    if expect_shape and tuple(node[leaf].shape) != tuple(value.shape):
        return False
    node[leaf] = value.astype(np.float32)
    return True


def _linear(w):  # torch (out, in) -> flax (in, out)
    return np.ascontiguousarray(w.T)


def _conv(w):    # torch (out, in, kh, kw) -> flax (kh, kw, in, out)
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _block_entries(prefix_flax: str, td: Dict[str, np.ndarray],
                   prefix_torch: str):
    """Yield (flax_path, value) pairs for one SwinBlock."""
    out = []
    m = {
        "norm1.weight": (f"{prefix_flax}/norm1/scale", None),
        "norm1.bias": (f"{prefix_flax}/norm1/bias", None),
        "norm2.weight": (f"{prefix_flax}/norm2/scale", None),
        "norm2.bias": (f"{prefix_flax}/norm2/bias", None),
        "attn.relative_position_bias_table":
            (f"{prefix_flax}/attn/relative_position_bias_table", None),
        "attn.qkv.weight": (f"{prefix_flax}/attn/qkv/kernel", _linear),
        "attn.qkv.bias": (f"{prefix_flax}/attn/qkv/bias", None),
        "attn.proj.weight": (f"{prefix_flax}/attn/proj/kernel", _linear),
        "attn.proj.bias": (f"{prefix_flax}/attn/proj/bias", None),
        "mlp.fc1.weight": (f"{prefix_flax}/mlp/Dense_0/kernel", _linear),
        "mlp.fc1.bias": (f"{prefix_flax}/mlp/Dense_0/bias", None),
        "mlp.fc2.weight": (f"{prefix_flax}/mlp/Dense_1/kernel", _linear),
        "mlp.fc2.bias": (f"{prefix_flax}/mlp/Dense_1/bias", None),
    }
    for tk, (fk, tf) in m.items():
        full = f"{prefix_torch}.{tk}"
        if full in td:
            v = td[full]
            out.append((fk, tf(v) if tf else v))
    return out


def convert_swin_checkpoint(torch_sd: Dict[str, np.ndarray], flax_params,
                            num_layers: int = 4, depths=(2, 2, 2, 2)):
    """Return (new_params, report) — flax param tree with every mappable
    pretrained tensor inserted. ``flax_params``: SwinUnet 'params' tree."""
    import jax

    td = dict(torch_sd)
    params = jax.tree_util.tree_map(np.asarray, jax.device_get(flax_params))
    # unfreeze to plain dicts
    params = jax.tree_util.tree_map(lambda x: x, params)

    def to_mut(d):
        return {k: to_mut(v) for k, v in d.items()} if isinstance(d, dict) \
            else d
    params = to_mut(params)

    entries = []
    # stem
    if "patch_embed.proj.weight" in td:
        entries.append(("patch_embed/kernel",
                        _conv(td["patch_embed.proj.weight"])))
        entries.append(("patch_embed/bias", td["patch_embed.proj.bias"]))
    if "patch_embed.norm.weight" in td:
        entries.append(("patch_norm/scale", td["patch_embed.norm.weight"]))
        entries.append(("patch_norm/bias", td["patch_embed.norm.bias"]))
    if "norm.weight" in td:
        entries.append(("norm/scale", td["norm.weight"]))
        entries.append(("norm/bias", td["norm.bias"]))

    # encoder stages (+ the load_from encoder->decoder remap)
    for i in range(num_layers):
        for d in range(depths[i]):
            entries += _block_entries(f"enc_{i}_{d}", td,
                                      f"layers.{i}.blocks.{d}")
            # decoder remap: layers.{i} -> layers_up.{3-i} == dec_{3-i}_{d}
            j = num_layers - 1 - i
            if j > 0:
                entries += _block_entries(f"dec_{j}_{d}", td,
                                          f"layers.{i}.blocks.{d}")
        dkey = f"layers.{i}.downsample"
        if f"{dkey}.reduction.weight" in td:
            entries.append((f"downsample_{i}/reduction/kernel",
                            _linear(td[f"{dkey}.reduction.weight"])))
            entries.append((f"downsample_{i}/norm/scale",
                            td[f"{dkey}.norm.weight"]))
            entries.append((f"downsample_{i}/norm/bias",
                            td[f"{dkey}.norm.bias"]))

    loaded, skipped = 0, 0
    for path, value in entries:
        if _set(params, path.split("/"), value):
            loaded += 1
        else:
            skipped += 1
    return params, {"loaded": loaded, "skipped": skipped}


def convert_swinunet_full(torch_sd: Dict[str, np.ndarray], flax_params,
                          num_layers: int = 4, depths=(2, 2, 2, 2)):
    """Convert a FULL SwinUnet (SwinTransformerSys) state dict — e.g. a
    reference-trained checkpoint — including the decoder: ``layers_up``,
    ``concat_back_dim``, ``norm_up``, final ``up`` and ``output`` head.
    Accepts both the bare SwinTransformerSys state dict and the ViT_seg
    wrapper's (vision_transformer.py wraps it as ``self.swin_unet`` — its
    keys carry a ``swin_unet.`` prefix, stripped here).
    Returns (params, report)."""
    import jax

    td = {(k[len("swin_unet."):] if k.startswith("swin_unet.") else k): v
          for k, v in torch_sd.items()}
    params = jax.tree_util.tree_map(np.asarray, jax.device_get(flax_params))

    def to_mut(d):
        return {k: to_mut(v) for k, v in d.items()} if isinstance(d, dict) \
            else d
    params = to_mut(params)

    entries = []
    if "patch_embed.proj.weight" in td:
        entries.append(("patch_embed/kernel",
                        _conv(td["patch_embed.proj.weight"])))
        entries.append(("patch_embed/bias", td["patch_embed.proj.bias"]))
    if "patch_embed.norm.weight" in td:
        entries.append(("patch_norm/scale", td["patch_embed.norm.weight"]))
        entries.append(("patch_norm/bias", td["patch_embed.norm.bias"]))
    for nk, fk in (("norm", "norm"), ("norm_up", "norm_up")):
        if f"{nk}.weight" in td:
            entries.append((f"{fk}/scale", td[f"{nk}.weight"]))
            entries.append((f"{fk}/bias", td[f"{nk}.bias"]))

    for i in range(num_layers):
        for d in range(depths[i]):
            entries += _block_entries(f"enc_{i}_{d}", td,
                                      f"layers.{i}.blocks.{d}")
        if f"layers.{i}.downsample.reduction.weight" in td:
            entries.append((f"downsample_{i}/reduction/kernel",
                            _linear(td[f"layers.{i}.downsample.reduction.weight"])))
            entries.append((f"downsample_{i}/norm/scale",
                            td[f"layers.{i}.downsample.norm.weight"]))
            entries.append((f"downsample_{i}/norm/bias",
                            td[f"layers.{i}.downsample.norm.bias"]))

    # decoder
    for j in range(num_layers):
        stage = num_layers - 1 - j
        if j == 0:
            if "layers_up.0.expand.weight" in td:
                entries.append(("up_0/expand/kernel",
                                _linear(td["layers_up.0.expand.weight"])))
                entries.append(("up_0/norm/scale",
                                td["layers_up.0.norm.weight"]))
                entries.append(("up_0/norm/bias", td["layers_up.0.norm.bias"]))
            continue
        if f"concat_back_dim.{j}.weight" in td:
            entries.append((f"concat_back_dim_{j}/kernel",
                            _linear(td[f"concat_back_dim.{j}.weight"])))
            entries.append((f"concat_back_dim_{j}/bias",
                            td[f"concat_back_dim.{j}.bias"]))
        for d in range(depths[stage]):
            entries += _block_entries(f"dec_{j}_{d}", td,
                                      f"layers_up.{j}.blocks.{d}")
        if f"layers_up.{j}.upsample.expand.weight" in td:
            entries.append((f"up_{j}/expand/kernel",
                            _linear(td[f"layers_up.{j}.upsample.expand.weight"])))
            entries.append((f"up_{j}/norm/scale",
                            td[f"layers_up.{j}.upsample.norm.weight"]))
            entries.append((f"up_{j}/norm/bias",
                            td[f"layers_up.{j}.upsample.norm.bias"]))

    if "up.expand.weight" in td:
        entries.append(("final_up/expand/kernel",
                        _linear(td["up.expand.weight"])))
        entries.append(("final_up/norm/scale", td["up.norm.weight"]))
        entries.append(("final_up/norm/bias", td["up.norm.bias"]))
    if "output.weight" in td:
        entries.append(("output/kernel", _conv(td["output.weight"])))

    loaded, skipped = 0, 0
    for path, value in entries:
        if _set(params, path.split("/"), value):
            loaded += 1
        else:
            skipped += 1
    return params, {"loaded": loaded, "skipped": skipped}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth into numpy (handles the {'model': ...} wrapper)."""
    import torch
    sd = torch.load(path, map_location="cpu")
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return {k: v.numpy() for k, v in sd.items()
            if hasattr(v, "numpy") and "attn_mask" not in k
            and "relative_position_index" not in k}
