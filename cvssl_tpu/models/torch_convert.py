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


def _head_block(sd: Dict[str, np.ndarray], prefix: str):
    """One ``conv``(+BN) block of the contrastive heads
    (reference ``projector.py:33-47``)."""
    p = {"Conv_0": {"kernel": _conv_w(sd[f"{prefix}.conv.weight"]),
                    "bias": sd[f"{prefix}.conv.bias"]},
         "BatchNorm_0": {"scale": sd[f"{prefix}.bn.weight"],
                         "bias": sd[f"{prefix}.bn.bias"]}}
    bs = {"BatchNorm_0": {"mean": sd[f"{prefix}.bn.running_mean"],
                          "var": sd[f"{prefix}.bn.running_var"]}}
    return p, bs


def convert_projector_checkpoint(torch_sd: Dict[str, np.ndarray]):
    """Reference ``projectors`` (``projector.py:50-66``) -> (params,
    batch_stats). The reference's dead ``final`` conv is skipped (never
    applied in its forward; our module omits it)."""
    params, stats = {}, {}
    for i, name in enumerate(("conv_1", "conv_2")):
        p, bs = _head_block(torch_sd, name)
        params[f"_ConvBNRelu_{i}"] = p
        stats[f"_ConvBNRelu_{i}"] = bs
    return params, stats


def convert_classifier_checkpoint(torch_sd: Dict[str, np.ndarray]):
    """Reference ``classifier`` (``projector.py:69-94``) -> (params,
    batch_stats); its ``final`` 1x1 conv IS applied."""
    params, stats = {}, {}
    for i, name in enumerate(("conv_1", "conv_2", "conv_3")):
        p, bs = _head_block(torch_sd, name)
        params[f"_ConvBNRelu_{i}"] = p
        stats[f"_ConvBNRelu_{i}"] = bs
    params["Conv_0"] = {"kernel": _conv_w(torch_sd["final.weight"]),
                        "bias": torch_sd["final.bias"]}
    return params, stats


def convert_discriminator2d_checkpoint(torch_sd: Dict[str, np.ndarray],
                                       ndf: int = 64):
    """Reference ``FCDiscriminator`` (``discriminator.py:58-100``) -> params.

    The torch ``classifier`` Linear consumes an NCHW flatten (c, h, w index
    order); our Dense consumes the NHWC flatten (h, w, c) — the kernel is
    permuted accordingly."""
    params = {}
    for i in range(5):
        params[f"Conv_{i}"] = {
            "kernel": _conv_w(torch_sd[f"conv{i}.weight"]),
            "bias": torch_sd[f"conv{i}.bias"]}
    w = torch_sd["classifier.weight"]          # (2, c*h*w)
    c = ndf * 8
    hw = int(round((w.shape[1] // c) ** 0.5))
    kernel = w.reshape(2, c, hw, hw).transpose(2, 3, 1, 0).reshape(-1, 2)
    params["Dense_0"] = {"kernel": np.ascontiguousarray(kernel),
                         "bias": torch_sd["classifier.bias"]}
    return params


def convert_discriminator3d_checkpoint(torch_sd: Dict[str, np.ndarray]):
    """Reference ``FC3DDiscriminator`` (``discriminator.py:6-55``) -> params.
    Its AvgPool3d(6) at the 6^3 bottleneck is a global mean, so the Linear
    sees exactly the channel vector — kernel is a plain transpose."""
    def w3(w):
        return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))

    params = {}
    for i in range(5):
        params[f"Conv_{i}"] = {
            "kernel": w3(torch_sd[f"conv{i}.weight"]),
            "bias": torch_sd[f"conv{i}.bias"]}
    params["Dense_0"] = {
        "kernel": np.ascontiguousarray(torch_sd["classifier.weight"].T),
        "bias": torch_sd["classifier.bias"]}
    return params


def convert_unet3d_checkpoint(torch_sd: Dict[str, np.ndarray]):
    """Reference ``unet_3D`` (``networks/unet_3D.py``) -> params (its
    InstanceNorm is affine=False, so there are no norm params or stats)."""
    def w3(w):
        return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))

    def unetconv(prefix):
        return {"Conv_0": {"kernel": w3(torch_sd[f"{prefix}.conv1.0.weight"]),
                           "bias": torch_sd[f"{prefix}.conv1.0.bias"]},
                "Conv_1": {"kernel": w3(torch_sd[f"{prefix}.conv2.0.weight"]),
                           "bias": torch_sd[f"{prefix}.conv2.0.bias"]}}

    params = {}
    for i, name in enumerate(["conv1", "conv2", "conv3", "conv4", "center"]):
        params[f"UnetConv3_{i}"] = unetconv(name)
    for i, k in enumerate([4, 3, 2, 1]):  # decoder order: up4 first
        params[f"UnetUp3CT_{i}"] = {
            "UnetConv3_0": unetconv(f"up_concat{k}.conv")}
    params["Conv_0"] = {"kernel": w3(torch_sd["final.weight"]),
                        "bias": torch_sd["final.bias"]}
    return params


def load_torch_unet(path: str):
    """Load a reference ``.pth`` UNet state dict into numpy and convert."""
    import torch
    sd = torch.load(path, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}
    return convert_unet_checkpoint(sd)
