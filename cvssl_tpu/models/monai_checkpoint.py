"""File-level converters for MONAI-format UNETR / SwinUNETR checkpoints.

The reference builds these models from MONAI (``code/networks/unetr.py``
imports monai.networks.blocks; ``net_factory_3d.py:7,24-38``); our Flax
modules are from-scratch NDHWC reimplementations. These converters map a
torch ``state_dict()`` saved from those MONAI modules onto our param trees,
so MONAI-trained weights load directly (same spirit as swin_checkpoint.py).

Layout rules (all verified empirically against torch):
* Linear:            (out, in)            -> (in, out)
* Conv3d:            (out, in, kd,kh,kw)  -> (kd,kh,kw, in, out)
* ConvTranspose3d:   (in, out, kd,kh,kw)  -> permute(2,3,4,0,1) + spatial
                     FLIP (flax nn.ConvTranspose correlates the upsampled
                     input with the un-flipped kernel; torch's deconv is
                     the gradient-of-conv — see tests/test_monai_parity.py)
* LayerNorm:         weight/bias          -> scale/bias
* InstanceNorm3d:    parameter-free on both sides (affine=False default)

MONAI module schema exercised by tests/monai_standin.py (an executable
torch reconstruction of the published key layout, since MONAI itself is
not installable offline).
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _lin(w):
    return np.transpose(w, (1, 0))


def _conv3(w):
    return np.transpose(w, (2, 3, 4, 1, 0))


def _deconv3(w):
    return np.transpose(w, (2, 3, 4, 0, 1))[::-1, ::-1, ::-1].copy()


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        if p not in node:
            return False
        node = node[p]
    leaf = path[-1]
    if leaf not in node:
        return False
    if tuple(np.shape(node[leaf])) != tuple(np.shape(value)):
        raise ValueError(
            f"shape mismatch at {'/'.join(path)}: "
            f"{np.shape(node[leaf])} vs {np.shape(value)}")
    node[leaf] = np.asarray(value)
    return True


def _to_mut(d):
    return {k: _to_mut(v) for k, v in d.items()} if isinstance(d, dict) \
        else np.asarray(d)


def _res_block_entries(flax_prefix: str, torch_prefix: str,
                       td: Dict[str, np.ndarray], layer_wrap: bool = False):
    """monai UnetResBlock -> our _ResConvBlock. UnetrBasicBlock wraps the
    res block in ``.layer`` (layer_wrap)."""
    tp = f"{torch_prefix}.layer" if layer_wrap else torch_prefix
    out = []
    for conv in ("conv1", "conv2", "conv3"):
        key = f"{tp}.{conv}.conv.weight"
        if key in td:
            out.append((f"{flax_prefix}/{conv}/kernel", _conv3(td[key])))
    return out


def _up_block_entries(flax_prefix: str, torch_prefix: str,
                      td: Dict[str, np.ndarray]):
    """monai UnetrUpBlock: transp_conv + conv_block (UnetResBlock)."""
    out = [(f"{flax_prefix}/transp_conv/ConvTranspose_0/kernel",
            _deconv3(td[f"{torch_prefix}.transp_conv.conv.weight"]))]
    out += _res_block_entries(f"{flax_prefix}/conv_block",
                              f"{torch_prefix}.conv_block", td)
    return out


def convert_unetr_checkpoint(torch_sd: Dict[str, np.ndarray], flax_params):
    """MONAI UNETR state dict -> our UNETR param tree.
    Returns (params, report)."""
    import jax

    td = {k: np.asarray(v) for k, v in torch_sd.items()}
    params = _to_mut(jax.device_get(flax_params))
    entries = []

    # --- ViT ---
    entries += [
        ("patch_embeddings/kernel",
         _lin(td["vit.patch_embedding.patch_embeddings.1.weight"])),
        ("patch_embeddings/bias",
         td["vit.patch_embedding.patch_embeddings.1.bias"]),
        ("position_embeddings",
         td["vit.patch_embedding.position_embeddings"]),
        ("norm/scale", td["vit.norm.weight"]),
        ("norm/bias", td["vit.norm.bias"]),
    ]
    n_blocks = len({k.split(".")[2] for k in td
                    if k.startswith("vit.blocks.")})
    for i in range(n_blocks):
        t = f"vit.blocks.{i}"
        f = f"blocks_{i}"
        entries += [
            (f"{f}/norm1/scale", td[f"{t}.norm1.weight"]),
            (f"{f}/norm1/bias", td[f"{t}.norm1.bias"]),
            (f"{f}/norm2/scale", td[f"{t}.norm2.weight"]),
            (f"{f}/norm2/bias", td[f"{t}.norm2.bias"]),
            (f"{f}/attn/qkv/kernel", _lin(td[f"{t}.attn.qkv.weight"])),
            (f"{f}/attn/out_proj/kernel",
             _lin(td[f"{t}.attn.out_proj.weight"])),
            (f"{f}/attn/out_proj/bias", td[f"{t}.attn.out_proj.bias"]),
            (f"{f}/linear1/kernel", _lin(td[f"{t}.mlp.linear1.weight"])),
            (f"{f}/linear1/bias", td[f"{t}.mlp.linear1.bias"]),
            (f"{f}/linear2/kernel", _lin(td[f"{t}.mlp.linear2.weight"])),
            (f"{f}/linear2/bias", td[f"{t}.mlp.linear2.bias"]),
        ]

    # --- conv encoders/decoders ---
    entries += _res_block_entries("encoder1", "encoder1", td,
                                  layer_wrap=True)
    for enc, num_layer in (("encoder2", 2), ("encoder3", 1),
                           ("encoder4", 0)):
        entries.append(
            (f"{enc}/transp_conv_init/ConvTranspose_0/kernel",
             _deconv3(td[f"{enc}.transp_conv_init.conv.weight"])))
        for i in range(num_layer):
            entries.append(
                (f"{enc}/blocks_{i}_deconv/ConvTranspose_0/kernel",
                 _deconv3(td[f"{enc}.blocks.{i}.0.conv.weight"])))
            entries += _res_block_entries(f"{enc}/blocks_{i}_res",
                                          f"{enc}.blocks.{i}.1", td)
    for dec in ("decoder5", "decoder4", "decoder3", "decoder2"):
        entries += _up_block_entries(dec, dec, td)
    entries += [("out/kernel", _conv3(td["out.conv.conv.weight"])),
                ("out/bias", td["out.conv.conv.bias"])]

    loaded = skipped = 0
    for path, value in entries:
        if _set(params, path.split("/"), value):
            loaded += 1
        else:
            skipped += 1
    return params, {"loaded": loaded, "skipped": skipped,
                    "torch_keys": len(td)}


def convert_swin_unetr_checkpoint(torch_sd: Dict[str, np.ndarray],
                                  flax_params,
                                  depths=(2, 2, 2, 2)):
    """MONAI SwinUNETR state dict -> our SwinUNETR param tree.
    Returns (params, report)."""
    import jax

    td = {k: np.asarray(v) for k, v in torch_sd.items()}
    params = _to_mut(jax.device_get(flax_params))
    entries = [
        ("patch_embed/kernel", _conv3(td["swinViT.patch_embed.proj.weight"])),
        ("patch_embed/bias", td["swinViT.patch_embed.proj.bias"]),
    ]
    for stage, depth in enumerate(depths):
        t_layer = f"swinViT.layers{stage + 1}.0"
        for j in range(depth):
            t = f"{t_layer}.blocks.{j}"
            f = f"stage{stage}_block{j}"
            entries += [
                (f"{f}/norm1/scale", td[f"{t}.norm1.weight"]),
                (f"{f}/norm1/bias", td[f"{t}.norm1.bias"]),
                (f"{f}/norm2/scale", td[f"{t}.norm2.weight"]),
                (f"{f}/norm2/bias", td[f"{t}.norm2.bias"]),
                (f"{f}/attn/qkv/kernel", _lin(td[f"{t}.attn.qkv.weight"])),
                (f"{f}/attn/qkv/bias", td[f"{t}.attn.qkv.bias"]),
                (f"{f}/attn/relative_position_bias_table",
                 td[f"{t}.attn.relative_position_bias_table"]),
                (f"{f}/attn/proj/kernel", _lin(td[f"{t}.attn.proj.weight"])),
                (f"{f}/attn/proj/bias", td[f"{t}.attn.proj.bias"]),
                (f"{f}/mlp/Dense_0/kernel",
                 _lin(td[f"{t}.mlp.linear1.weight"])),
                (f"{f}/mlp/Dense_0/bias", td[f"{t}.mlp.linear1.bias"]),
                (f"{f}/mlp/Dense_1/kernel",
                 _lin(td[f"{t}.mlp.linear2.weight"])),
                (f"{f}/mlp/Dense_1/bias", td[f"{t}.mlp.linear2.bias"]),
            ]
        entries += [
            (f"merge{stage}/norm/scale",
             td[f"{t_layer}.downsample.norm.weight"]),
            (f"merge{stage}/norm/bias",
             td[f"{t_layer}.downsample.norm.bias"]),
            (f"merge{stage}/reduction/kernel",
             _lin(td[f"{t_layer}.downsample.reduction.weight"])),
        ]
    for enc, tw in (("encoder1", True), ("encoder2", True),
                    ("encoder3", True), ("encoder4", True),
                    ("encoder10", True)):
        entries += _res_block_entries(enc, enc, td, layer_wrap=tw)
    for dec in ("decoder5", "decoder4", "decoder3", "decoder2", "decoder1"):
        entries += _up_block_entries(dec, dec, td)
    entries += [("out/kernel", _conv3(td["out.conv.conv.weight"])),
                ("out/bias", td["out.conv.conv.bias"])]

    loaded = skipped = 0
    for path, value in entries:
        if _set(params, path.split("/"), value):
            loaded += 1
        else:
            skipped += 1
    return params, {"loaded": loaded, "skipped": skipped,
                    "torch_keys": len(td)}
