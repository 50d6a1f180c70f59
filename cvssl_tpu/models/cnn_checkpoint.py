"""Local-file torch->flax converters for the pretrained CNN encoders.

The reference URL-downloads ImageNet weights for its Res2Net-101 and
EfficientNet-B3 encoders (``Res2Net_v1b.py:208-214``,
``efficient_encoder.py:111``) — impossible offline. These converters load a
LOCAL torch ``state_dict`` file instead (same style as
``swin_checkpoint.py``): obtain ``res2net101_v1b_26w_4s-*.pth`` /
``efficientnet-b3-*.pth`` out of band, point ``--pretrained_ckpt`` at it,
and the engine maps it into the flax encoder params at init.

Mapping rules: torch conv (O, I, kh, kw) -> flax HWIO (kh, kw, I, O)
(identical for depthwise: groups axis stays the per-group I=1 axis); BN
weight/bias/running_mean/running_var -> scale/bias/mean/var. Flax submodule
names follow call order (Conv_0, BatchNorm_0, ...) — the walks below mirror
``resunet.Res2NetEncoder`` / ``efficientunet.EfficientNetEncoder`` exactly.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into {name: numpy array}. Errors
    clearly when the file is absent."""
    import os
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            f"pretrained checkpoint not found: {path!r}. The reference "
            "downloads ImageNet weights at runtime (Res2Net_v1b.py:208, "
            "efficient_encoder.py:111); offline you must supply a local "
            ".pth file via --pretrained_ckpt.")
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    for wrapper in ("state_dict", "model"):  # lightning / Swin-zoo wrappers
        if isinstance(sd, dict) and wrapper in sd \
                and isinstance(sd[wrapper], dict):
            sd = sd[wrapper]
    return {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def _conv(sd, key):
    return {"kernel": np.transpose(sd[key], (2, 3, 1, 0))}


def _bn(sd, prefix):
    p = {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}
    s = {"mean": sd[prefix + ".running_mean"],
         "var": sd[prefix + ".running_var"]}
    return p, s


def _conv_b(sd, key):
    return {"kernel": np.transpose(sd[key + ".weight"], (2, 3, 1, 0)),
            "bias": sd[key + ".bias"]}


def convert_res2net_encoder(sd: Dict[str, np.ndarray],
                            layers=(3, 4, 23)) -> Tuple[dict, dict]:
    """Reference ``res2net101_v1b_26w_4s`` state_dict -> params/batch_stats
    for ``resunet.Res2NetEncoder`` (stem + layer1-3; layer4/fc unused by
    preUnet are ignored). Scale = 4 -> 3 cascaded 3x3 convs per block."""
    params: dict = {}
    stats: dict = {}

    def put(conv_name, bn_name, conv_key, bn_prefix, dst_p, dst_s):
        dst_p[conv_name] = _conv(sd, conv_key)
        p, s = _bn(sd, bn_prefix)
        dst_p[bn_name] = p
        dst_s[bn_name] = s

    # v1b stem: conv1 = Sequential(conv,bn,relu,conv,bn,relu,conv) + bn1
    put("Conv_0", "BatchNorm_0", "conv1.0.weight", "conv1.1", params, stats)
    put("Conv_1", "BatchNorm_1", "conv1.3.weight", "conv1.4", params, stats)
    put("Conv_2", "BatchNorm_2", "conv1.6.weight", "bn1", params, stats)

    bi = 0
    for li, nblocks in enumerate(layers, start=1):
        for b in range(nblocks):
            t = f"layer{li}.{b}"
            bp: dict = {}
            bs: dict = {}
            put("Conv_0", "BatchNorm_0", f"{t}.conv1.weight", f"{t}.bn1",
                bp, bs)
            for i in range(3):  # scale-1 cascaded 3x3 convs
                put(f"Conv_{1 + i}", f"BatchNorm_{1 + i}",
                    f"{t}.convs.{i}.weight", f"{t}.bns.{i}", bp, bs)
            put("Conv_4", "BatchNorm_4", f"{t}.conv3.weight", f"{t}.bn3",
                bp, bs)
            if f"{t}.downsample.1.weight" in sd:  # v1b: AvgPool, Conv, BN
                put("Conv_5", "BatchNorm_5", f"{t}.downsample.1.weight",
                    f"{t}.downsample.2", bp, bs)
            params[f"Bottle2neck_{bi}"] = bp
            stats[f"Bottle2neck_{bi}"] = bs
            bi += 1
    return params, stats


def convert_efficientnet_encoder(sd: Dict[str, np.ndarray],
                                 width: float = 1.2, depth: float = 1.4
                                 ) -> Tuple[dict, dict]:
    """efficientnet_pytorch B3 state_dict -> params/batch_stats for
    ``efficientunet.EfficientNetEncoder`` (stem + all MBConv blocks; the
    classifier head ``_conv_head``/``_fc`` is unused by Effi_UNet)."""
    from cvssl_tpu.models.efficientunet import _B0_STAGES, _round_repeats

    params: dict = {}
    stats: dict = {}
    params["Conv_0"] = _conv(sd, "_conv_stem.weight")
    p, s = _bn(sd, "_bn0")
    params["BatchNorm_0"] = p
    stats["BatchNorm_0"] = s

    bi = 0
    for (t, k, st, c, r) in _B0_STAGES:
        for _ in range(_round_repeats(r, depth)):
            blk = f"_blocks.{bi}"
            bp: dict = {}
            bs: dict = {}
            ci = 0
            ni = 0
            if t != 1:  # expand conv present
                bp[f"Conv_{ci}"] = _conv(sd, f"{blk}._expand_conv.weight")
                p, s = _bn(sd, f"{blk}._bn0")
                bp[f"BatchNorm_{ni}"] = p
                bs[f"BatchNorm_{ni}"] = s
                ci += 1
                ni += 1
            bp[f"Conv_{ci}"] = _conv(sd, f"{blk}._depthwise_conv.weight")
            p, s = _bn(sd, f"{blk}._bn1")
            bp[f"BatchNorm_{ni}"] = p
            bs[f"BatchNorm_{ni}"] = s
            ci += 1
            ni += 1
            bp[f"Conv_{ci}"] = _conv_b(sd, f"{blk}._se_reduce")
            bp[f"Conv_{ci + 1}"] = _conv_b(sd, f"{blk}._se_expand")
            bp[f"Conv_{ci + 2}"] = _conv(sd, f"{blk}._project_conv.weight")
            p, s = _bn(sd, f"{blk}._bn2")
            bp[f"BatchNorm_{ni}"] = p
            bs[f"BatchNorm_{ni}"] = s
            params[f"MBConv_{bi}"] = bp
            stats[f"MBConv_{bi}"] = bs
            bi += 1
    return params, stats


def convert_effiunet_full(sd: Dict[str, np.ndarray],
                          width: float = 1.2, depth: float = 1.4
                          ) -> Tuple[dict, dict]:
    """Full reference ``Effi_UNet`` state_dict (``efficientunet.py:141-216``:
    ``encoder.*`` efficientnet-b3 + ``decoder.blocks.N.convK`` Conv2dReLU
    pairs + ``classifier``) -> params/batch_stats for ``EffiUNet``.

    A 1-channel stem conv (the reference's ``patch_first_conv`` sums the RGB
    kernel for ``in_channels=1``, ``efficient_encoder.py:36-67``) is mapped
    to kernel/3 tiled back to 3 input channels: our model tiles the input
    instead, and conv(tile(x), W/3 tiled) == conv(x, W) exactly."""
    enc_sd = {k[len("encoder."):]: v for k, v in sd.items()
              if k.startswith("encoder.")}
    stem = enc_sd["_conv_stem.weight"]
    if stem.shape[1] == 1:
        enc_sd["_conv_stem.weight"] = np.repeat(stem / 3.0, 3, axis=1)
    enc_p, enc_s = convert_efficientnet_encoder(enc_sd, width, depth)
    params: dict = {"EfficientNetEncoder_0": enc_p}
    stats: dict = {"EfficientNetEncoder_0": enc_s}
    i = 0
    while f"decoder.blocks.{i}.conv1.0.weight" in sd:
        bp: dict = {}
        bs: dict = {}
        for j, tag in enumerate(("conv1", "conv2")):
            pre = f"decoder.blocks.{i}.{tag}"
            bp[f"Conv_{j}"] = _conv(sd, f"{pre}.0.weight")
            p, s = _bn(sd, f"{pre}.1")
            bp[f"BatchNorm_{j}"] = p
            bs[f"BatchNorm_{j}"] = s
        params[f"DecoderBlock_{i}"] = bp
        stats[f"DecoderBlock_{i}"] = bs
        i += 1
    params["Conv_0"] = _conv_b(sd, "classifier")
    return params, stats


def checkpoint_family(sd: Dict[str, np.ndarray]) -> str:
    """Sniff which published model-zoo schema a state_dict follows, by its
    signature keys: Swin-tiny (microsoft/Swin-Transformer), EfficientNet
    (lukemelas/efficientnet_pytorch), Res2Net v1b. 'unknown' otherwise."""
    if "layers.0.blocks.0.attn.qkv.weight" in sd:
        return "swin"
    if "_conv_stem.weight" in sd:
        return "efficientnet"
    if "conv1.0.weight" in sd and "layer1.0.convs.0.weight" in sd:
        return "res2net"
    return "unknown"


def maybe_load_encoder(module, params: dict, batch_stats: dict,
                       sd: Dict[str, np.ndarray]):
    """Route a loaded torch state_dict into ``module``'s pretrained slot:
    PreUNet <- Res2Net-101 v1b, EffiUNet <- EfficientNet-B3 (encoder
    subtree), SwinUnet <- ImageNet Swin-tiny (reference ``load_from``
    semantics, ``vision_transformer.py:54-89``). Family is sniffed from
    the key schema so a multi-model run (e.g. cross-teaching UNet +
    SwinUnet) loads the checkpoint only into the model it belongs to;
    non-matching modules pass through unchanged."""
    import jax.numpy as jnp

    from cvssl_tpu.models.efficientunet import EffiUNet
    from cvssl_tpu.models.resunet import PreUNet
    from cvssl_tpu.models.swin_unet import SwinUnet

    fam = checkpoint_family(sd)
    if isinstance(module, SwinUnet) and fam == "swin":
        from cvssl_tpu.models.swin_checkpoint import convert_swin_checkpoint
        new_params, report = convert_swin_checkpoint(
            sd, params, num_layers=len(module.depths),
            depths=tuple(module.depths))
        if report["loaded"] == 0:
            raise ValueError(
                "swin checkpoint matched no SwinUnet tensors — wrong "
                f"geometry for this model? report={report}")
        import jax
        return (jax.tree_util.tree_map(jnp.asarray, new_params),
                batch_stats, True)
    if isinstance(module, PreUNet) and fam == "res2net":
        sub, conv = "Res2NetEncoder_0", convert_res2net_encoder
    elif isinstance(module, EffiUNet) and fam == "efficientnet":
        sub, conv = "EfficientNetEncoder_0", convert_efficientnet_encoder
    else:
        return params, batch_stats, False
    enc_p, enc_s = conv(sd)

    def as_jnp(tree):
        import jax
        return jax.tree_util.tree_map(jnp.asarray, tree)

    import jax
    ref_shapes = jax.tree_util.tree_map(np.shape, params[sub])
    got_shapes = jax.tree_util.tree_map(np.shape, enc_p)
    if ref_shapes != got_shapes:
        raise ValueError(
            f"converted {sub} params don't match the model's tree — "
            "wrong checkpoint for this encoder?")
    params = dict(params)
    batch_stats = dict(batch_stats)
    params[sub] = as_jnp(enc_p)
    batch_stats[sub] = as_jnp(enc_s)
    return params, batch_stats, True
