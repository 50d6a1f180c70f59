"""torch -> flax weight conversion for the 2D UNet family.

Enables (a) loading reference-trained ``.pth`` checkpoints for parity
evaluation and (b) numerical equivalence tests against the reference
implementation (same weights -> same outputs).

Name mapping (reference ``unet.py`` module tree -> our flax tree):
  encoder.in_conv.conv_conv.{0,1,4,5}      -> Encoder_0/ConvBlock_0/{Conv_0,BatchNorm_0,Conv_1,BatchNorm_1}
  encoder.down{k}.maxpool_conv.1.conv_conv -> Encoder_0/DownBlock_{k-1}/ConvBlock_0
  decoder.up{k}.conv1x1                    -> Decoder_0/UpBlock_{k-1}/Conv_0
  decoder.up{k}.conv.conv_conv             -> Decoder_0/UpBlock_{k-1}/ConvBlock_0
  decoder.out_conv                         -> Decoder_0/Conv_0
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _conv_w(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _convblock(sd: Dict[str, np.ndarray], prefix: str):
    """Params + batch stats for one ConvBlock."""
    p = {}
    bs = {}
    for i, (conv_i, bn_i) in enumerate(((0, 1), (4, 5))):
        p[f"Conv_{i}"] = {
            "kernel": _conv_w(sd[f"{prefix}.{conv_i}.weight"]),
            "bias": sd[f"{prefix}.{conv_i}.bias"],
        }
        p[f"BatchNorm_{i}"] = {
            "scale": sd[f"{prefix}.{bn_i}.weight"],
            "bias": sd[f"{prefix}.{bn_i}.bias"],
        }
        bs[f"BatchNorm_{i}"] = {
            "mean": sd[f"{prefix}.{bn_i}.running_mean"],
            "var": sd[f"{prefix}.{bn_i}.running_var"],
        }
    return p, bs


def convert_unet_checkpoint(torch_sd: Dict[str, np.ndarray]):
    """Reference UNet state dict (numpy values) -> (params, batch_stats)."""
    enc_p, enc_bs = {}, {}
    p, bs = _convblock(torch_sd, "encoder.in_conv.conv_conv")
    enc_p["ConvBlock_0"], enc_bs["ConvBlock_0"] = p, bs
    for k in range(1, 5):
        p, bs = _convblock(torch_sd,
                           f"encoder.down{k}.maxpool_conv.1.conv_conv")
        enc_p[f"DownBlock_{k - 1}"] = {"ConvBlock_0": p}
        enc_bs[f"DownBlock_{k - 1}"] = {"ConvBlock_0": bs}

    dec_p, dec_bs = {}, {}
    for k in range(1, 5):
        p, bs = _convblock(torch_sd, f"decoder.up{k}.conv.conv_conv")
        up_p = {"ConvBlock_0": p,
                "Conv_0": {
                    "kernel": _conv_w(torch_sd[f"decoder.up{k}.conv1x1.weight"]),
                    "bias": torch_sd[f"decoder.up{k}.conv1x1.bias"]}}
        dec_p[f"UpBlock_{k - 1}"] = up_p
        dec_bs[f"UpBlock_{k - 1}"] = {"ConvBlock_0": bs}
    dec_p["Conv_0"] = {
        "kernel": _conv_w(torch_sd["decoder.out_conv.weight"]),
        "bias": torch_sd["decoder.out_conv.bias"]}

    params = {"Encoder_0": enc_p, "Decoder_0": dec_p}
    batch_stats = {"Encoder_0": enc_bs, "Decoder_0": dec_bs}
    return params, batch_stats


def load_torch_unet(path: str):
    """Load a reference ``.pth`` UNet state dict into numpy and convert."""
    import torch
    sd = torch.load(path, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}
    return convert_unet_checkpoint(sd)
